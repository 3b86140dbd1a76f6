package graft.metrics

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Telemetry (reference: lib/flume/instrumentation.ex + the pluggable
  * EventHandler behaviour): a handler trait fed by a
  * StreamingQueryListener — batch duration and input rows per pipeline
  * replace the reference's [queue,:dequeue]/[pipeline,:worker] events.
  */
trait EventHandler extends Serializable {
  def handle(event: String, pipeline: String, measurements: Map[String, Double]): Unit
  /** Per-job worker duration — the [pipeline, :worker, :job] event
    * (event/worker.ex:57-67). Default no-op so batch-level handlers
    * stay source-compatible. */
  def handleJob(pipeline: String, jid: String, durationMs: Double, success: Boolean): Unit = ()
}

object NoopEventHandler extends EventHandler {
  def handle(event: String, pipeline: String, m: Map[String, Double]): Unit = ()
}

/** Default handler: keeps last-seen gauges queryable in-process (the
  * reference's logger-backed DefaultEventHandler analog). */
class InMemoryEventHandler extends EventHandler {
  val gauges: TrieMap[(String, String), Map[String, Double]] = TrieMap.empty
  /** (pipeline, jid) → (durationMs, success) for every dispatched job. */
  val jobs: TrieMap[(String, String), (Double, Boolean)] = TrieMap.empty
  def handle(event: String, pipeline: String, m: Map[String, Double]): Unit =
    gauges.put((pipeline, event), m)
  override def handleJob(pipeline: String, jid: String, durationMs: Double, success: Boolean): Unit =
    jobs.put((pipeline, jid), (durationMs, success))
}

class PipelineListener(handler: EventHandler) extends StreamingQueryListener {
  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    handler.handle("query_started", e.name, Map.empty)
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    handler.handle("batch", Option(e.progress.name).getOrElse(e.progress.id.toString),
      Map(
        "numInputRows" -> e.progress.numInputRows.toDouble,
        "batchDurationMs" -> e.progress.batchDuration.toDouble,
        "inputRowsPerSecond" -> e.progress.inputRowsPerSecond))
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    handler.handle("query_terminated", e.id.toString, Map.empty)
}

object Instrumentation {
  def attach(spark: SparkSession, handler: EventHandler): PipelineListener = {
    val l = new PipelineListener(handler)
    spark.streams.addListener(l)
    l
  }
}
