package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * NOTE: queries reading `events.parquet` require
  * `spark.sql.legacy.parquet.nanosAsLong=true` (the fixture stores
  * nanosecond timestamps, which Spark otherwise refuses to read; the
  * engine treats `ts` as an epoch-nanos BIGINT). Verify/Bench set it.
  */
object SparkEntry {

  private val registry: Seq[QueryDef] =
    ParityQueries.defs ++ AnalyticsQueries.defs ++ TextQueries.defs ++
      DedupQueries.defs ++ SimilarityQueries.defs ++ StreamingBatchQueries.defs

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
