package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver fixture contract so a silent testdata regeneration
  * fails the suite in seconds, not a round: round 9 shipped
  * `events.ts` as µs TIMESTAMP_NTZ where every prior generation was
  * ns INT64, and 16 queries died at analysis with no local signal.
  *
  * Two layers:
  *   1. every registered query must ANALYZE against the real
  *      /root/testdata/sf0.001 schema (catches any column rename or
  *      type change at plan time, no execution);
  *   2. the `Tables.ts*` adapter must produce identical epoch-µs
  *      values — and keep range predicates pushdown-eligible — on BOTH
  *      fixture generations, reproduced here as temp parquet.
  */
class FixtureContractSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name analyzes against the current fixture schema") {
      val df = fn(spark, sf)
      assert(df.queryExecution.analyzed.resolved, s"$name did not resolve")
      assert(df.columns.nonEmpty)
      spark.catalog.clearCache()
    }

  // --- adapter parity across the two known ts physical types ---

  private val usValues = Seq(
    1704067200000000L, // 2024-01-01T00:00:00Z
    1705276800123456L, // odd µs remainder
    1706655599999999L)

  private def nsFixture(): String = {
    import spark.implicits._
    val dir = TestSpark.tmpRoot("ns-events")
    usValues.map(_ * 1000L).zipWithIndex
      .toDF("ts", "event_id").write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ntzFixture(): String = {
    import spark.implicits._
    val dir = TestSpark.tmpRoot("ntz-events")
    usValues.zipWithIndex.map { case (us, i) =>
      (java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, ((us % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC), i)
    }.toDF("ts", "event_id").write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("tsUs yields identical epoch-µs on ns-BIGINT and µs-NTZ fixtures") {
    for (dir <- Seq(nsFixture(), ntzFixture())) {
      val ev = graft.queries.Tables.t(spark, dir, "events")
      val got = ev.select(graft.queries.Tables.tsUs(ev).as("us"))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == usValues.sorted, s"adapter mismatch on $dir: $got")
    }
  }

  test("tsTimestamp yields the same UTC instants on both fixture generations") {
    val insts = Seq(nsFixture(), ntzFixture()).map { dir =>
      val ev = graft.queries.Tables.t(spark, dir, "events")
      ev.select(unix_micros(graft.queries.Tables.tsTimestamp(ev)).as("us"))
        .collect().map(_.getLong(0)).sorted.toSeq
    }
    assert(insts.head == usValues.sorted)
    assert(insts(0) == insts(1))
  }

  test("ts range bounds select identical rows and push down on both generations") {
    val lo = 1704067200000001L // strictly above the first value
    val hi = 1705276800123456L // inclusive of the second
    for (dir <- Seq(nsFixture(), ntzFixture())) {
      val ev = graft.queries.Tables.t(spark, dir, "events")
      val q = ev.where(graft.queries.Tables.tsAtLeastUs(ev, lo) &&
        graft.queries.Tables.tsAtMostUs(ev, hi))
      assert(q.count() == 1L, s"bound selection wrong on $dir")
      val scan = q.queryExecution.executedPlan.toString
      assert(scan.contains("PushedFilters: [IsNotNull(ts)"),
        s"ts bounds not pushed to the scan on $dir:\n$scan")
      val strict = ev.where(graft.queries.Tables.tsBeforeUs(ev, hi))
        .select(graft.queries.Tables.tsUs(ev).as("us"))
        .collect().map(_.getLong(0)).toSeq
      assert(strict == Seq(1704067200000000L), s"strict bound wrong on $dir")
    }
  }

  test("real events fixture: tsUs spans Jan 2024 (contract the parity cutoffs assume)") {
    val ev = graft.queries.Tables.t(spark, sf, "events")
    val r = ev.agg(
      min(graft.queries.Tables.tsUs(ev)).as("lo"),
      max(graft.queries.Tables.tsUs(ev)).as("hi")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    assert(lo >= 1704067200000000L && lo < 1706745600000000L,
      s"events.ts low bound outside Jan 2024: $lo")
    assert(hi > lo && hi < 1706745600000000L,
      s"events.ts high bound outside Jan 2024: $hi")
  }
}
