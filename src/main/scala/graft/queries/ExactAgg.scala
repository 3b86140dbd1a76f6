package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact integer aggregation at LONG speed with DECIMAL headroom.
  *
  * A single `sum(x.cast(decimal(38,0)))` is exact at any scale but runs
  * ~3x slower than a long sum on the same data: wide decimals fall off
  * the vectorized aggregate fast path and churn BigDecimal in the
  * update loop (measured 2.6s vs 0.7s warm over 600k rows, 4 sums).
  * A plain `sum(x.cast("long"))` is fast but overflows around 9.2e18 —
  * a real bound at 100 TB (6e11 lineitem rows x ~1e13 per quantized
  * discounted-price row ~ 1e24).
  *
  * `chunkedSums` gets both: stage 1 sums LONGs inside bounded row
  * chunks (whole-stage-codegen'd, map-side combined), stage 2 folds
  * the tiny chunk-partial set as DECIMAL(38,0). A chunk never holds
  * more than 2^ChunkBits rows (`monotonically_increasing_id` embeds
  * the partition id in its high bits, so `id >> ChunkBits` slices each
  * partition into disjoint 2^ChunkBits-row runs and never aliases
  * across partitions below 2^(33-ChunkBits) chunks per partition), so
  * the long partial cannot overflow as long as every per-row value
  * stays below 2^63 / 2^ChunkBits = 2^44 ~ 1.7e13 in magnitude —
  * callers quantize well under that (see each call site).
  *
  * Exactness: integer addition is associative, so the chunked re-sum
  * equals the direct decimal sum bit-for-bit no matter how rows land
  * in chunks — results are deterministic even though chunk membership
  * is not. Scale shape: stage 1's shuffle carries one row per
  * (group, chunk) pair per map task — at 100 TB with 1.5M-row
  * partitions that is ~3 chunk rows per group per task, strictly less
  * than the raw fact rows a plain aggregation would spill on skew.
  */
object ExactAgg {
  private val dec38 = DecimalType(38, 0)

  /** Rows per chunk = 2^ChunkBits; per-row magnitude must stay < 2^44. */
  val ChunkBits = 19

  /** Per-row magnitude bound for `measures` columns (documented above). */
  val MaxRowMagnitude: Long = 1L << (63 - ChunkBits)

  /** Group `df` by `keys`, exactly summing the pre-quantized LONG
    * columns `measures` (each must satisfy |value| < 2^44 per row).
    * Output: one row per key group with each measure as DECIMAL(38,0)
    * under its input name, plus a row count named `countAs`.
    */
  def chunkedSums(
      df: DataFrame,
      keys: Seq[String],
      measures: Seq[String],
      countAs: String = "_cnt"): DataFrame = {
    val chunked = df.withColumn("_chunk",
      shiftright(monotonically_increasing_id(), ChunkBits))
    val partialAggs: Seq[Column] =
      measures.map(m => sum(col(m)).as(m)) :+ count(lit(1)).as(countAs)
    val partials = chunked
      .groupBy((keys :+ "_chunk").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs: Seq[Column] =
      measures.map(m => sum(col(m).cast(dec38)).as(m)) :+
        sum(col(countAs)).as(countAs)
    partials
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
