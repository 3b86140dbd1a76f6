package graft

import graft.api.{DefaultQueueApi, JobSpec}
import graft.model.PipelineConfig
import graft.pipeline.{PipelineRunner, WorkerRegistry, WorkerSet}
import graft.store.QueueStore
import org.scalatest.funsuite.AnyFunSuite

/** Workers land on the buffers through OBJECT access (compiles to a
  * static module reference), so the worker lambdas capture nothing —
  * the serializability a real cluster requires. */
object WsBuffers {
  val echo = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val bulk = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
}

/** Cluster-mode worker registration (B5): the broadcast [[WorkerSet]]
  * must carry dispatch end to end with the per-JVM TrieMap registry
  * EMPTY — on a real cluster the executor-side registry always is.
  * The set is round-tripped through java serialization first (the
  * broadcast's wire path), so dispatch provably needs nothing
  * JVM-local. Local mode runs the identical resolution code, with the
  * registry as fallback for unregistered names. */
class WorkerSetSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def roundTrip(ws: WorkerSet): WorkerSet = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(ws); oos.close()
    new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[WorkerSet]
  }

  test("e2e dispatch from a serialized WorkerSet with the JVM registry empty") {
    WorkerRegistry.clear()
    WsBuffers.echo.clear(); WsBuffers.bulk.clear()
    val ws = roundTrip(WorkerSet.empty
      .register("SetEcho", (args, _) => { WsBuffers.echo.add(args); () })
      .registerBulk("SetBulk", argsList => { WsBuffers.bulk.add(argsList); () }))
    val store = new QueueStore(spark, TestSpark.tmpRoot("wset"))
    val api = new DefaultQueueApi(store)
    api.bulkEnqueue("wsq", (1 to 40).map(i => JobSpec("SetEcho", args = s"[$i]")))
    val runner = new PipelineRunner(store,
      PipelineConfig("ws_pipe", "wsq", maxDemand = 10, pollIntervalMs = 100),
      workers = ws)
    val q = runner.start().get
    try q.processAllAvailable() finally runner.stop()
    assert(WsBuffers.echo.size == 40, s"echo=${WsBuffers.echo.size}")
    assert(api.pendingJobsCount() == 0)
    assert(store.deadRows.count() == 0,
      "a registry-empty dispatch must not dead-letter set-registered jobs")

    // the bulk path rides the same broadcast value
    api.bulkEnqueue("wsq2", (1 to 12).map(i => JobSpec("SetBulk", args = s"[$i]")))
    val runner2 = new PipelineRunner(store,
      PipelineConfig("ws_pipe2", "wsq2", maxDemand = 10,
        batchSize = Some(4), pollIntervalMs = 100),
      workers = ws)
    val q2 = runner2.start().get
    try q2.processAllAvailable() finally runner2.stop()
    assert(WsBuffers.bulk.size == 3, s"bulk chunks=${WsBuffers.bulk.size}")
    assert(WsBuffers.bulk.toArray.toSeq
      .flatMap(_.asInstanceOf[Seq[String]]).size == 12)
  }

  test("registry fallback: a name missing from the set resolves from the local TrieMap") {
    WorkerRegistry.clear()
    WsBuffers.echo.clear()
    WorkerRegistry.register("RegEcho",
      (args, _) => { WsBuffers.echo.add("reg:" + args); () })
    val ws = WorkerSet.empty
      .register("SetEcho", (args, _) => { WsBuffers.echo.add("set:" + args); () })
    val store = new QueueStore(spark, TestSpark.tmpRoot("wset_fb"))
    val api = new DefaultQueueApi(store)
    api.bulkEnqueue("fbq", Seq(
      JobSpec("SetEcho", args = "[1]"), JobSpec("RegEcho", args = "[2]")))
    val runner = new PipelineRunner(store,
      PipelineConfig("fb_pipe", "fbq", maxDemand = 10, pollIntervalMs = 100),
      workers = ws)
    val q = runner.start().get
    try q.processAllAvailable() finally runner.stop()
    assert(WsBuffers.echo.toArray.map(_.toString).toSet ==
      Set("set:[1]", "reg:[2]"), WsBuffers.echo.toString)
  }
}
