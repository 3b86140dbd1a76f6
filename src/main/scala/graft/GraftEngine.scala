package graft

import graft.api.{DefaultQueueApi, QueueApi}
import graft.metrics.{EventHandler, InMemoryEventHandler, Instrumentation, PipelineListener}
import graft.model.{EngineConfig, PipelineConfig}
import graft.pipeline.{ControlOptions, PipelineRunner}
import graft.scheduler.Housekeeper
import graft.store.QueueStore
import org.apache.spark.sql.SparkSession

/** The supervision-tree analog (reference: lib/flume/supervisor.ex:17-40
  * boots Redis pool → scheduler → per-pipeline stages): one engine owns
  * the state store, the enqueue API, one streaming query per configured
  * pipeline, the housekeeping scheduler, and telemetry.
  *
  * {{{
  * val engine = GraftEngine(spark, "/data/graft",
  *   Seq(PipelineConfig("default_pipeline", "default")))
  * engine.start()
  * engine.api.enqueue("default", JobSpec("EchoWorker", args = "[1]"))
  * engine.pauseAll(); engine.resumeAll()   // D1, flume.ex:62-76
  * engine.stop()
  * }}}
  */
class GraftEngine(
    val spark: SparkSession,
    root: String,
    pipelines: Seq[PipelineConfig],
    engineConfig: EngineConfig = EngineConfig(),
    handler: EventHandler = new InMemoryEventHandler) {

  val store = new QueueStore(spark, root, engineConfig.compactionGraceMs)
  val api: QueueApi = new DefaultQueueApi(store, handler)
  val housekeeper = new Housekeeper(store,
    engineConfig.visibilityTimeoutMs,
    autoCompactMinTombstones = engineConfig.autoCompactMinTombstones,
    autoCompact = engineConfig.autoCompact)
  private val runners: Map[String, PipelineRunner] =
    pipelines.map(c =>
      c.name -> new PipelineRunner(store, c, engineConfig, handler)).toMap
  private var listener: Option[PipelineListener] = None
  private var maintExec: Option[java.util.concurrent.ScheduledExecutorService] = None

  /** Boot: telemetry, housekeeping loop, every non-paused pipeline
    * (paused-state restore, pipeline/event.ex:32-39), then the deep-
    * maintenance cadence (maintenanceIntervalMs > 0) — without it a
    * long-running deployment's queue dirs grow the streaming source's
    * per-trigger listing cost unboundedly. Every maintenance leg,
    * compaction included, runs safely under live pipelines (see
    * maintenance()). */
  def start(): Unit = synchronized {
    listener = Some(Instrumentation.attach(spark, handler))
    housekeeper.start(engineConfig.schedulerIntervalMs)
    runners.values.foreach(_.start())
    if (engineConfig.maintenanceIntervalMs > 0 && maintExec.isEmpty) {
      val e = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
        val t = new Thread(r, "graft-maintenance"); t.setDaemon(true); t
      })
      e.scheduleWithFixedDelay(() => {
        // swallow-and-log: an escaped throwable would silently cancel
        // every future pass (same contract as the housekeeper loop)
        try { maintenance(gateCompaction = true); () }
        catch {
          case _: InterruptedException => Thread.currentThread().interrupt()
          case t: Throwable =>
            graft.GraftLog.current.error(s"maintenance pass failed: $t")
        }
      }, engineConfig.maintenanceIntervalMs, engineConfig.maintenanceIntervalMs,
        java.util.concurrent.TimeUnit.MILLISECONDS)
      maintExec = Some(e)
    }
  }

  def pause(name: String, opts: ControlOptions = ControlOptions()): Unit =
    runner(name).pause(opts)
  def resume(name: String, opts: ControlOptions = ControlOptions()): Unit =
    runner(name).resume(opts)
  def pauseAll(opts: ControlOptions = ControlOptions()): Unit =
    runners.values.foreach(_.pause(opts))
  def resumeAll(opts: ControlOptions = ControlOptions()): Unit =
    runners.values.foreach(_.resume(opts))

  def jobCounts(): Map[String, Long] =
    api.jobCounts(pipelines.map(_.queue).distinct)
  def pendingJobsCount(): Long = api.pendingJobsCount()

  /** Drain-friendly: wait for everything currently enqueued. */
  def processAllAvailable(): Unit =
    runners.values.foreach(_.activeQuery.foreach(_.processAllAvailable()))

  /** Periodic deep maintenance (safe under live pipelines): archive
    * fully-consumed queue files (bounds source-listing cost) in ONE
    * batched pass across all queues, prune expired
    * rate-limit window logs, fold state-table tombstones when they pile
    * up, and roll old acked-claim tombstones into per-queue counters
    * (bounds the job_counts scan horizon). Returns (filesArchived,
    * limitFilesPruned). */
  def maintenance(
      archiveOlderThanMs: Long = 600000,
      limitLogOlderThanMs: Long = 3600000,
      minTombstones: Long = 10000,
      claimFoldOlderThanMs: Long = 3600000,
      gateCompaction: Boolean = false,
      deadFoldMinFiles: Long = 64): (Long, Long) = {
    val archived =
      store.archiveConsumedAll(pipelines.map(_.queue).distinct, archiveOlderThanMs)
    // never prune entries a configured admission window could still
    // count: clamp the age to 2× the largest rate-limit scale
    val maxScale = pipelines.flatMap(_.rateLimitScaleMs)
      .maxOption.getOrElse(0L)
    val pruned = store.pruneLimitLogs(math.max(limitLogOlderThanMs, 2 * maxScale))
    // every leg is live-safe: the archiver moves only fully-acked
    // files the source skips via ignoreMissingFiles, the fold blocks
    // on still-live files, and compaction commits a manifest snapshot
    // instead of swapping directories. The SCHEDULED pass goes through
    // maybeCompact (honors the autoCompact off switch and skips if
    // another pass holds the maintenance lock); manual callers compact
    // unconditionally past the threshold.
    if (gateCompaction) housekeeper.maybeCompact()
    else housekeeper.compactStateTables(minTombstones)
    // fold AFTER compaction: compactProcessing clears the acked rows
    // that would otherwise block tombstone files from folding. The
    // fold horizon is clamped to 2× the archive horizon: the archiver
    // proves "fully consumed" from acked-claim tombstones, so acks
    // must outlive the archive pass that consumes them — folding them
    // sooner would strand consumed files in the live dir (counts would
    // stay exact, but the listing-cost bound would erode).
    store.foldClaimCounters(math.max(claimFoldOlderThanMs, 2 * archiveOlderThanMs))
    // dead-letter fold: file-count gated (the rewrite always runs when
    // invoked), so an idle deployment never churns it, and a noisy one
    // collapses all-time failure history to one deduped snapshot
    // instead of paying dropDuplicates over it on every deadRows read
    if (store.deadPartFileCount() >= deadFoldMinFiles) store.compactDead()
    // last: sweep staging dirs orphaned by crashed writes (age-bounded,
    // lock-serialized with compaction so its snapshot write is safe)
    store.pruneStaleStaging()
    (archived, pruned)
  }

  def stop(): Unit = synchronized {
    maintExec.foreach { e =>
      e.shutdown() // graceful: let a mid-flight pass finish its moves
      if (!e.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS)) {
        e.shutdownNow(); ()
      }
    }
    maintExec = None
    runners.values.foreach(_.stop())
    housekeeper.stop()
    listener.foreach(spark.streams.removeListener)
    listener = None
  }

  private def runner(name: String): PipelineRunner =
    runners.getOrElse(name,
      throw new NoSuchElementException(s"no pipeline named $name"))
}

object GraftEngine {
  def apply(spark: SparkSession, root: String, pipelines: Seq[PipelineConfig],
      engineConfig: EngineConfig = EngineConfig()): GraftEngine =
    new GraftEngine(spark, root, pipelines, engineConfig)
}
