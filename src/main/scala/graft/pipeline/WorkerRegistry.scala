package graft.pipeline

import scala.collection.concurrent.TrieMap

/** Worker dispatch registry — the analog of the reference's runtime
  * module resolution (`apply(class, function, args)`,
  * lib/flume/pipeline/event/worker.ex:81-87). No runtime class loading:
  * workers are Scala functions registered by name.
  *
  * `Worker` receives (args raw JSON, context); `BulkWorker` receives all
  * member args of a BulkEvent in one call (bulk_event/worker.ex:8-29).
  *
  * Cluster note: the registry object is per-JVM — in local mode
  * (tests) driver registrations are visible to executor threads, but
  * on a real cluster the executor-side TrieMap is EMPTY. The
  * first-class cluster path is [[WorkerSet]]: an immutable,
  * serializable name→function map handed to `PipelineRunner`, which
  * broadcasts it once at construction and resolves from the broadcast
  * value inside the dispatch closure — the same path local mode runs,
  * so there is no mode-dependent registration story. The TrieMap
  * remains as the zero-ceremony local fallback (resolution order:
  * broadcast set first, then this registry).
  */
object WorkerRegistry {
  type Worker = (String, Map[String, String]) => Unit
  type BulkWorker = Seq[String] => Unit

  private val workers = TrieMap.empty[String, Worker]
  private val bulkWorkers = TrieMap.empty[String, BulkWorker]

  private[pipeline] def key(cls: String, function: String) = s"$cls#$function"

  def register(cls: String, fn: Worker): Unit = register(cls, "perform", fn)
  def register(cls: String, function: String, fn: Worker): Unit =
    workers.put(key(cls, function), fn)

  def registerBulk(cls: String, fn: BulkWorker): Unit = registerBulk(cls, "perform", fn)
  def registerBulk(cls: String, function: String, fn: BulkWorker): Unit =
    bulkWorkers.put(key(cls, function), fn)

  def resolve(cls: String, function: String): Worker =
    workers.getOrElse(key(cls, function),
      throw new NoSuchElementException(s"no worker registered for ${key(cls, function)}"))

  def resolveBulk(cls: String, function: String): BulkWorker =
    bulkWorkers.getOrElse(key(cls, function),
      throw new NoSuchElementException(s"no bulk worker registered for ${key(cls, function)}"))

  def clear(): Unit = { workers.clear(); bulkWorkers.clear() }
}

/** Immutable, serializable worker set — the cluster-mode registration
  * path. Build it on the driver (worker lambdas must be serializable:
  * close over constants and object members, not live driver state),
  * pass it to `PipelineRunner`, and it ships to executors as ONE
  * broadcast — installed lazily in the dispatch closure, so local and
  * cluster mode resolve through the identical code path. */
final class WorkerSet private (
    private[pipeline] val workers: Map[String, WorkerRegistry.Worker],
    private[pipeline] val bulkWorkers: Map[String, WorkerRegistry.BulkWorker])
    extends Serializable {
  import WorkerRegistry.{key, Worker, BulkWorker}

  def register(cls: String, fn: Worker): WorkerSet = register(cls, "perform", fn)
  def register(cls: String, function: String, fn: Worker): WorkerSet =
    new WorkerSet(workers + (key(cls, function) -> fn), bulkWorkers)

  def registerBulk(cls: String, fn: BulkWorker): WorkerSet =
    registerBulk(cls, "perform", fn)
  def registerBulk(cls: String, function: String, fn: BulkWorker): WorkerSet =
    new WorkerSet(workers, bulkWorkers + (key(cls, function) -> fn))

  private[pipeline] def resolve(cls: String, function: String): Option[Worker] =
    workers.get(key(cls, function))
  private[pipeline] def resolveBulk(
      cls: String, function: String): Option[BulkWorker] =
    bulkWorkers.get(key(cls, function))

  def size: Int = workers.size + bulkWorkers.size
}

object WorkerSet {
  val empty: WorkerSet = new WorkerSet(Map.empty, Map.empty)
}
