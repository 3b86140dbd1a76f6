package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (the "TestWithRedis" analog:
  * temp-dir state roots wiped per test instead of a flushed keyspace). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", classOf[graft.plans.GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def tmpRoot(prefix: String): String =
    Files.createTempDirectory(prefix).toString
}

/** Executor-visible buffers for echo workers (local mode = same JVM). */
object Buffers {
  val echo = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val ctx = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, String]]()
  val bulk = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
  def clear(): Unit = { echo.clear(); ctx.clear(); bulk.clear() }
}
