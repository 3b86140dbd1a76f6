package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark DataFrame program plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query over
  * the same parquet tables. Non-SQL ops omit the oracle and get a
  * rows-only check.
  *
  * Determinism contract (so the driver's sorted-hash compare is exact):
  *   - timestamps are exported as epoch microseconds (BIGINT) — the
  *     `events.ts` column is nanosecond-precision parquet, which Spark
  *     reads as a nanos BIGINT (spark.sql.legacy.parquet.nanosAsLong)
  *     and DuckDB truncates to micros; `ts div 1000` == `epoch_us(ts)`.
  *   - double aggregations go through DECIMAL(18,4) (exact, associative)
  *     and are cast back to DOUBLE at the end, so Spark's parallel
  *     partial aggregation and DuckDB's serial sum agree bit-for-bit.
  *   - floating-point folds (dot products) are sequential left-to-right
  *     in both engines (Spark `aggregate`, DuckDB `list_dot_product`).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Tables {
  /** Read one of the driver-provided parquet tables. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
