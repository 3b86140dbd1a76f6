package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  * Everything is a `Column` composition over Spark's codegen'd builtins
  * (no UDFs): at 100 TB these run inside whole-stage codegen directly on
  * the parquet scan, so the only cost is the scan itself.
  */
object TextFunctions {

  /** Whitespace tokenization (single-space corpus; regex split keeps
    * parity with DuckDB's string_split for the oracle checks). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("int")

  /** Small English stopword list used for quality scoring. */
  val Stopwords: Seq[String] =
    Seq("the", "and", "of", "to", "a", "in", "is", "it")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), w => w.isin(Stopwords: _*))).cast("int")

  /** stopword ratio = stopwords / tokens, NULL-safe for empty docs. */
  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") / tokenCount(text).cast("double")

  /** Heuristic quality gate: plausible length and some stopword mass.
    * (The C4/Gopher-style rules — here reduced to deterministic,
    * oracle-checkable arithmetic.) */
  def isQuality(text: Column): Column =
    (tokenCount(text).between(20, 10000) && stopwordRatio(text) > 0.05)
      .cast("int")

  /** Marker-word language ID: deterministic n-gram-lite heuristic. The
    * real n-gram profile model would be a broadcast lookup table; the
    * marker rule keeps it oracle-expressible. */
  def langId(text: Column): Column = {
    val ws = tokens(text)
    when(array_contains(ws, "the"), "en")
      .when(array_contains(ws, "el"), "es")
      .when(array_contains(ws, "der"), "de")
      .when(array_contains(ws, "le"), "fr")
      .otherwise("unk")
  }

  /** Content fingerprint: md5 over the normalized body. Used for exact
    * dedup; at scale this is the shuffle key, so we keep it a hex string
    * (sortable, splittable for range partitioning). */
  def fingerprint(text: Column): Column = md5(lower(text))

  /** Word 3-shingles (w[i] w[i+1] w[i+2]); empty array for docs shorter
    * than 3 tokens. Basis for n-gram Jaccard and MinHash dedup. */
  def shingles3(text: Column): Column = {
    val ws = tokens(text)
    when(size(ws) >= 3,
      transform(sequence(lit(0), size(ws) - 3), i =>
        concat_ws(" ",
          element_at(ws, i + 1),
          element_at(ws, i + 2),
          element_at(ws, i + 3))))
      .otherwise(array().cast("array<string>"))
  }
}
