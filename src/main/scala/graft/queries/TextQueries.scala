package graft.queries

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` corpus: token stats,
  * quality scoring, language ID, fingerprinting, and binary-column
  * (multimodal) plumbing. All are narrow per-row transforms — at 100 TB
  * they are pure map stages fused into the parquet scan by whole-stage
  * codegen, with no shuffle at all.
  */
object TextQueries {
  import Tables.t

  private val stopList = Stopwords.map(w => s"'$w'").mkString(", ")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "t_token_stats",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            tokenCount(col("text")).as("n_tokens"),
            length(col("text")).as("n_chars_obs"),
            col("n_chars")),
      Some(
        """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
          |CAST(length(text) AS INT) AS n_chars_obs, n_chars FROM documents""".stripMargin),
      "Token counting (whitespace tokenizer) + char-length audit."),

    QueryDef(
      "t_token_bpe",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            size(filter(split(col("text"), "[^a-z0-9]+"), w => length(w) > 0))
              .cast("int").as("n_subword_tokens")),
      Some(
        """SELECT doc_id,
          |CAST(len(list_filter(string_split_regex(text, '[^a-z0-9]+'),
          |  w -> len(w) > 0)) AS INT) AS n_subword_tokens FROM documents""".stripMargin),
      "BPE-ish token counting: alphanumeric-run segmentation."),

    QueryDef(
      "t_quality_score",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            tokenCount(col("text")).as("n_tokens"),
            stopwordCount(col("text")).as("n_stop"),
            stopwordRatio(col("text")).as("stop_ratio"),
            isQuality(col("text")).as("is_quality")),
      Some(
        s"""SELECT doc_id,
           |CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           |CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS INT) AS n_stop,
           |CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
           |  / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
           |CAST(CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 10000
           |  AND CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
           |      / CAST(len(string_split(text, ' ')) AS DOUBLE) > 0.05
           |  THEN 1 ELSE 0 END AS INT) AS is_quality
           |FROM documents""".stripMargin),
      "Quality scoring: length bounds + stopword-mass heuristic."),

    QueryDef(
      "t_lang_id",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), langId(col("text")).as("pred_lang")),
      Some(
        """SELECT doc_id, lang,
          |CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
          |     WHEN list_contains(string_split(text, ' '), 'el') THEN 'es'
          |     WHEN list_contains(string_split(text, ' '), 'der') THEN 'de'
          |     WHEN list_contains(string_split(text, ' '), 'le') THEN 'fr'
          |     ELSE 'unk' END AS pred_lang
          |FROM documents""".stripMargin),
      "Marker-word language ID against the labeled lang column."),

    QueryDef(
      "t_lang_agreement",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("lang"), langId(col("text")).as("pred"))
          .groupBy("lang")
          .agg(
            count("*").as("n_docs"),
            count(when(col("pred") === col("lang"), 1)).as("n_match")),
      Some(
        """SELECT lang, COUNT(*) AS n_docs,
          |COUNT(CASE WHEN pred = lang THEN 1 END) AS n_match FROM (
          |SELECT lang,
          |CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
          |     WHEN list_contains(string_split(text, ' '), 'el') THEN 'es'
          |     WHEN list_contains(string_split(text, ' '), 'der') THEN 'de'
          |     WHEN list_contains(string_split(text, ' '), 'le') THEN 'fr'
          |     ELSE 'unk' END AS pred
          |FROM documents) GROUP BY lang""".stripMargin),
      "Language-ID agreement rates per labeled language."),

    QueryDef(
      "t_fingerprint",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), fingerprint(col("text")).as("fp"))
          .withColumn("fp_prefix", substring(col("fp"), 1, 8)),
      Some(
        """SELECT doc_id, md5(lower(text)) AS fp,
          |substr(md5(lower(text)), 1, 8) AS fp_prefix FROM documents""".stripMargin),
      "Document fingerprinting (normalized-content hash)."),

    QueryDef(
      "mm_binary_meta",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            length(col("text").cast("binary")).as("n_bytes"),
            md5(col("text").cast("binary")).as("checksum"),
            col("source")),
      Some(
        """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
          |md5(text) AS checksum, source FROM documents""".stripMargin),
      "Multimodal plumbing: opaque binary payload + typed metadata; the " +
        "decode/feature steps live in graft.multimodal (stubbed codecs)."))
}
