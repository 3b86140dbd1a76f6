package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * NOTE: `events.ts` has shipped as either epoch-ns INT64 or µs
  * TIMESTAMP_NTZ across fixture generations. Queries adapt via
  * `Tables.tsUs`/`tsTimestamp` (schema-inspecting); sessions must set
  * `spark.sql.session.timeZone=UTC` and should keep
  * `spark.sql.legacy.parquet.nanosAsLong=true` so the ns generation
  * still reads as BIGINT. Verify/Bench/TestSpark set both.
  */
object SparkEntry {

  private val registry: Seq[QueryDef] =
    ParityQueries.defs ++ AnalyticsQueries.defs ++ TextQueries.defs ++
      DedupQueries.defs ++ SimilarityQueries.defs ++
      StreamingBatchQueries.defs ++ ClassifierQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses only ms-precision tables so it runs under any session config. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
