package graft

import graft.api.JobSpec
import graft.model.PipelineConfig
import graft.pipeline.WorkerRegistry
import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("engine supervises multiple pipelines: boot, drain, pause_all, resume_all") {
    Buffers.clear(); WorkerRegistry.clear()
    WorkerRegistry.register("EchoWorker", (args, _) => { Buffers.echo.add(args); () })
    val engine = GraftEngine(spark, TestSpark.tmpRoot("engine"),
      Seq(
        PipelineConfig("p_high", "high", pollIntervalMs = 100),
        PipelineConfig("p_low", "low", pollIntervalMs = 100)))
    engine.start()
    try {
      engine.api.bulkEnqueue("high", (1 to 20).map(i => JobSpec("EchoWorker", args = s"[$i]")))
      engine.api.bulkEnqueue("low", (1 to 5).map(i => JobSpec("EchoWorker", args = s"[l$i]")))
      engine.processAllAvailable()
      assert(Buffers.echo.size === 25)
      assert(engine.jobCounts() === Map("high" -> 0L, "low" -> 0L))
      assert(engine.pendingJobsCount() === 0)

      engine.pauseAll()
      engine.api.enqueue("high", JobSpec("EchoWorker", args = "[x]"))
      Thread.sleep(400) // a few trigger intervals — nothing must consume
      assert(engine.jobCounts()("high") === 1)
      assert(Buffers.echo.size === 25)

      engine.resumeAll()
      engine.processAllAvailable()
      assert(engine.jobCounts()("high") === 0)
      assert(Buffers.echo.size === 26)

      // maintenance: everything above is consumed+acked, so the queue
      // files archive out of the live dirs and counts stay exact
      val (archived, _) = engine.maintenance(archiveOlderThanMs = 0)
      assert(archived >= 2) // at least one file per queue
      assert(engine.jobCounts() === Map("high" -> 0L, "low" -> 0L))
    } finally engine.stop()
  }

  test("scheduled maintenance gates compaction on engine quiesce") {
    Buffers.clear(); WorkerRegistry.clear()
    WorkerRegistry.register("GWorker", (_, _) => ())
    val engine = GraftEngine(spark, TestSpark.tmpRoot("maint_gate"),
      Seq(PipelineConfig("g_p", "gq", pollIntervalMs = 100)),
      graft.model.EngineConfig(
        autoCompactMinTombstones = 0, // every gated pass may fold
        schedulerIntervalMs = 60000, // keep the housekeeper tick out of the window
        maintenanceIntervalMs = 0)) // drive the gated pass by hand
    engine.start()
    try {
      engine.api.bulkEnqueue("gq", (1 to 10).map(i => JobSpec("GWorker", args = s"[$i]")))
      engine.processAllAvailable()
      val claims = spark.read.parquet(engine.store.processingDir).count()
      assert(claims >= 10)
      // LIVE pipeline: the scheduled pass's compaction leg must defer
      // (archive/prune/fold horizons at defaults — nothing else moves)
      engine.maintenance(gateCompaction = true)
      assert(spark.read.parquet(engine.store.processingDir).count() === claims,
        "gated maintenance compacted under a live query")
      // drained + paused: the same pass now folds the acked claims
      engine.pauseAll(graft.pipeline.ControlOptions(async = false,
        timeoutMs = graft.pipeline.ControlOptions.Infinity))
      engine.maintenance(gateCompaction = true)
      assert(spark.read.parquet(engine.store.processingDir).count() === 0)
      assert(engine.jobCounts()("gq") === 0) // folded history preserved
    } finally engine.stop()
  }

  test("aggressive maintenance during a live pipeline loses nothing") {
    Buffers.clear(); WorkerRegistry.clear()
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    WorkerRegistry.register("MWorker", (args, _) => { seen.add(args); () })
    val engine = GraftEngine(spark, TestSpark.tmpRoot("maint_live"),
      Seq(PipelineConfig("m_p", "mq", pollIntervalMs = 100)))
    engine.start()
    try {
      // interleave enqueues with immediate-cutoff maintenance — the
      // worst-case race between the archiver and the running stream
      (1 to 6).foreach { b =>
        engine.api.bulkEnqueue("mq",
          (1 to 5).map(i => graft.api.JobSpec("MWorker", args = s"[$b,$i]")))
        engine.processAllAvailable()
        // immediate-cutoff archive AND claim-counter fold (compaction
        // threshold forced to 0 so every tick compacts + folds) — the
        // worst-case interleaving of all three background moves with
        // the running stream
        engine.maintenance(archiveOlderThanMs = 0, minTombstones = 0,
          claimFoldOlderThanMs = 0)
      }
      engine.processAllAvailable()
      assert(seen.toArray.map(_.toString).toSet.size === 30) // no loss
      assert(engine.jobCounts()("mq") === 0) // arithmetic exact after archive+fold
      assert(engine.pendingJobsCount() === 0)
    } finally engine.stop()
  }
}
