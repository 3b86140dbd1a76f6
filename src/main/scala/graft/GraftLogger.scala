package graft

import scala.collection.mutable.ArrayBuffer

/** Pluggable logger behaviour — D7 (reference: lib/flume/logger.ex:1-59,
  * default impl default_logger.ex:1-22, selected via config.ex:7). The
  * engine's own logging goes through `GraftLog.current`, so an embedder
  * can swap the backend (and tests can capture) without touching slf4j
  * configuration.
  */
trait GraftLogger extends Serializable {
  def debug(msg: String, meta: Map[String, String] = Map.empty): Unit
  def info(msg: String, meta: Map[String, String] = Map.empty): Unit
  def warn(msg: String, meta: Map[String, String] = Map.empty): Unit
  def error(msg: String, meta: Map[String, String] = Map.empty): Unit
}

/** Default: forward to slf4j (Spark's logging backend), message first,
  * metadata appended key=value like the reference's "#{message} : #{opts}". */
object Slf4jGraftLogger extends GraftLogger {
  @transient private lazy val log = org.slf4j.LoggerFactory.getLogger("graft")
  private def fmt(msg: String, meta: Map[String, String]): String =
    if (meta.isEmpty) msg
    else msg + " : " + meta.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(" ")
  def debug(msg: String, meta: Map[String, String]): Unit = log.debug(fmt(msg, meta))
  def info(msg: String, meta: Map[String, String]): Unit = log.info(fmt(msg, meta))
  def warn(msg: String, meta: Map[String, String]): Unit = log.warn(fmt(msg, meta))
  def error(msg: String, meta: Map[String, String]): Unit = log.error(fmt(msg, meta))
}

/** Capturing impl for tests (the reference swaps loggers in config;
  * its tests assert on log output). */
class BufferingGraftLogger extends GraftLogger {
  val entries: ArrayBuffer[(String, String, Map[String, String])] = ArrayBuffer.empty
  private def add(level: String, msg: String, meta: Map[String, String]): Unit =
    entries.synchronized { entries += ((level, msg, meta)); () }
  def debug(msg: String, meta: Map[String, String]): Unit = add("debug", msg, meta)
  def info(msg: String, meta: Map[String, String]): Unit = add("info", msg, meta)
  def warn(msg: String, meta: Map[String, String]): Unit = add("warn", msg, meta)
  def error(msg: String, meta: Map[String, String]): Unit = add("error", msg, meta)
}

object GraftLog {
  @volatile var current: GraftLogger = Slf4jGraftLogger
}
