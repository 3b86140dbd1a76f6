package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located join: both fact tables hash-clustered on
  * the join key AT WRITE TIME, so the join needs NO shuffle at read
  * time — at 100 TB this converts the dominant repeated cost (a full
  * corpus exchange per join) into a one-time layout decision. This spec
  * is the executable evidence for that design claim: same rows as the
  * shuffled join, zero Exchange in the plan. */
class BucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed orders-lineitem join runs with zero shuffle exchange") {
    import spark.implicits.{localSeqToDatasetHolder => _}
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")

    spark.sql("DROP TABLE IF EXISTS g_orders_b")
    spark.sql("DROP TABLE IF EXISTS g_lineitem_b")
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("g_orders_b")
    lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("g_lineitem_b")

    // disable broadcast so the join would otherwise be a shuffled SMJ —
    // the bucket layout must be what removes the exchanges
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("g_orders_b")
        .join(spark.table("g_lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)

      // same result as the plain (shuffling) join
      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      val a = joined.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val b = plain.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(a.nonEmpty && a == b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS g_orders_b")
      spark.sql("DROP TABLE IF EXISTS g_lineitem_b")
    }
  }

  test("bucket pruning: an equality filter reads a single bucket") {
    spark.sql("DROP TABLE IF EXISTS g_orders_p")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_orderkey").format("parquet")
      .saveAsTable("g_orders_p")
    // the planner auto-disables bucketed scans when no operator needs
    // the clustering; pin it on so the filter can prune to one bucket
    val prior = spark.conf
      .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val q = spark.table("g_orders_p").where(col("o_orderkey") === 7L)
      val scan = q.queryExecution.executedPlan.toString
      // the FileSourceScan advertises the pruned bucket selection
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected single-bucket scan:\n$scan")
      assert(q.count() >= 0)
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prior)
      spark.sql("DROP TABLE IF EXISTS g_orders_p")
    }
  }
}
