package graft

import java.nio.file.Files

import graft.model.{EventJson, GraftEvent}
import graft.streaming.StreamingAnalytics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingJsonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("lenient JSON decode matches reference semantics (event.ex:60-89)") {
    import spark.implicits._
    val rows = Seq(
      // canonical fixture shape (FIXTURES.md §1)
      """{"class":"EchoWorker","function":"perform","queue":"test",
        |"jid":"1082fd87","args":[1,"a"],"retry_count":0,
        |"enqueued_at":1514367662.25,"finished_at":null,"failed_at":null,
        |"retried_at":null,"error_message":null,"error_backtrace":null,
        |"context":{"request_id":"123"},"unknown_field":42}""".stripMargin.replace("\n", ""),
      // missing optionals -> defaults; map-valued args -> []
      """{"class":"W","queue":"q","jid":"j2","args":{"bad":"map"},"enqueued_at":1514367662}""",
      // garbage -> null jid (poison message)
      """not json at all""")
    val decoded = EventJson.decode(rows.toDF("value"), col("value")).collect()

    val e0 = decoded(0)
    assert(e0.getAs[String]("clazz") === "EchoWorker")
    assert(e0.getAs[String]("args") === """[1,"a"]""") // raw heterogeneous passthrough
    assert(e0.getAs[java.sql.Timestamp]("enqueued_at").getTime === 1514367662250L)
    assert(e0.getAs[Map[String, String]]("context") === Map("request_id" -> "123"))

    val e1 = decoded(1)
    assert(e1.getAs[String]("function") === "perform") // defaulted
    assert(e1.getAs[Int]("retry_count") === 0) // defaulted
    assert(e1.getAs[String]("args") === "[]") // map coerced (event.ex:88-89)

    assert(decoded(2).getAs[String]("jid") === null) // lenient: no throw
  }

  test("JSON round-trip: decode(encode(event)) preserves the envelope") {
    import spark.implicits._
    val at = new java.sql.Timestamp(1714367662123L)
    val ev = GraftEvent("W", "perform", "q", "jid-1", """["x",2]""", 3, at,
      context = Map("k" -> "v"))
    val encoded = EventJson.encode(Seq(ev).toDF())
    val json = encoded.select("json").as[String].collect().head
    assert(json.contains(""""class":"W"""") && json.contains(""""args":["x",2]"""))
    val back = EventJson.decode(encoded.select("json"), col("json")).as[GraftEvent].collect().head
    assert(back === ev)
  }

  test("watermarked windowed aggregation over a file stream") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream").toString + "/data"
    val base = 1704067200000L // 2024-01-01T00:00Z
    val rows = (0 until 600).map { i =>
      (new java.sql.Timestamp(base + i * 1000L), if (i % 2 == 0) "click" else "view", i.toDouble)
    }
    rows.toDF("ts", "event_type", "value").coalesce(1).write.parquet(dir)

    val src = spark.readStream
      .schema("ts timestamp, event_type string, value double")
      .parquet(dir)
    val agg = StreamingAnalytics.windowedCounts(src, "5 minutes", "5 minutes", "10 minutes")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("winout").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    // append mode emits only windows the watermark has closed: with max
    // event ts at +599s, the 10-minute watermark closes no window yet —
    // so run the same aggregation in batch mode for value assertions.
    val batch = StreamingAnalytics.windowedCounts(
      spark.read.parquet(dir), "5 minutes", "5 minutes", "10 minutes")
      .orderBy("window_start", "event_type").collect()
    assert(batch.length === 4) // 600s = two 5-min windows x two types
    assert(batch.forall(_.getAs[Long]("n") === 150))
    val streamed = spark.table("winout")
    assert(streamed.schema.fieldNames.toSeq ===
      Seq("window_start", "window_end", "event_type", "n", "total"))
  }

  test("stream-stream interval join pairs events within the gap (state-bounded)") {
    import spark.implicits._
    val ldir = Files.createTempDirectory("ssl").toString + "/l"
    val rdir = Files.createTempDirectory("ssr").toString + "/r"
    val base = 1704067200000L
    def row(id: Long, user: Long, offSec: Long, tpe: String) =
      (user, id, new java.sql.Timestamp(base + offSec * 1000), tpe)
    // clicks at 0s and 100s; purchases at 60s (within 30min of both
    // clicks → 2 pairs... gap 1800s: click@0 and click@100 both pair)
    // and at 4000s (pairs only with nothing — both clicks > 1800s away)
    Seq(row(1, 7, 0, "click"), row(2, 7, 100, "click"))
      .toDF("user_id", "event_id", "ts", "event_type").coalesce(1).write.parquet(ldir)
    Seq(row(10, 7, 60, "purchase"), row(11, 7, 4000, "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type").coalesce(1).write.parquet(rdir)

    val schema = "user_id long, event_id long, ts timestamp, event_type string"
    val l = spark.readStream.schema(schema).parquet(ldir)
    val r = spark.readStream.schema(schema).parquet(rdir)
    val joined = StreamingAnalytics.intervalJoin(l, r, maxGapSec = 1800)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssjoin").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val out = spark.table("ssjoin").orderBy("l_id", "r_id").collect()
    // click@0→purchase@60 only (click@100 is AFTER the purchase);
    // purchase@4000 is beyond the 1800s gap from either click
    assert(out.map(r0 => (r0.getAs[Long]("l_id"), r0.getAs[Long]("r_id"))).toSeq
      === Seq((1L, 10L)))
  }

  test("stateful dedup by jid across micro-batches (flatMapGroupsWithState)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dedup").toString
    val at = new java.sql.Timestamp(System.currentTimeMillis())
    def ev(jid: String) = GraftEvent("W", "perform", "q", jid, "[]", 0, at)
    // batch 1: a,b ; batch 2 (separate file): b replay + c
    Seq(ev("a"), ev("b")).toDF().coalesce(1).write.mode("append").parquet(dir)
    Seq(ev("b"), ev("c")).toDF().coalesce(1).write.mode("append").parquet(dir)

    val src = spark.readStream.schema(graft.model.Schemas.event)
      .option("maxFilesPerTrigger", 1).parquet(dir).as[GraftEvent]
    val deduped = StreamingAnalytics.dedupByJid(src)
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedupout").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val jids = spark.table("dedupout").select("jid").as[String].collect().sorted
    assert(jids.toSeq === Seq("a", "b", "c")) // the replayed b dropped
  }
}
