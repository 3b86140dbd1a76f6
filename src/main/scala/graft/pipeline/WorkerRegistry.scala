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
  * Cluster note: the registry object is per-JVM. In local mode (tests)
  * driver registrations are visible to executor threads; on a real
  * cluster, workers must be registered from a static initializer that
  * runs on executors (standard Spark UDF-registry pattern) — dispatch
  * happens inside `mapPartitions` on the executor side.
  */
object WorkerRegistry {
  type Worker = (String, Map[String, String]) => Unit
  type BulkWorker = Seq[String] => Unit

  private val workers = TrieMap.empty[String, Worker]
  private val bulkWorkers = TrieMap.empty[String, BulkWorker]

  private def key(cls: String, function: String) = s"$cls#$function"

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
