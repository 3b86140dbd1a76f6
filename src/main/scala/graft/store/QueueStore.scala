package graft.store

import java.sql.Timestamp

import graft.model.Schemas
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** The engine's state store: the reference's Redis keyspace
  * (lib/flume/queue/manager.ex:267-287) re-expressed as parquet table
  * directories.
  *
  * | Redis key                    | dir                    |
  * |------------------------------|------------------------|
  * | ns:queue:q        (LIST)     | queue/q/   append-only |
  * | ns:scheduled + ns:retry (ZSET)| scheduled/ + tombstones|
  * | ns:queue:processing:q (ZSET) | processing/ + tombstones|
  * | ns:dead           (ZSET)     | dead/      append-only |
  * | ns:*limit* (ZSET window)     | limit/key/ append-only |
  * | ns:pipeline:x:paused (STRING)| control/paused/x  file |
  *
  * Mutation model: append-only row files + append-only tombstone files
  * keyed by a deterministic per-row id; a "live" read is
  * rows ANTI-JOIN tombstones (broadcast — tombstones are tiny relative
  * to data). `compact()` folds tombstones in by atomic directory swap.
  * This is the same upsert-as-log design Delta/Hudi use, minus the
  * transaction log we don't need: each Spark write commits atomically
  * at file granularity, and ids make re-applied writes idempotent
  * (at-least-once, exactly like the reference's two-phase promotions,
  * manager.ex:218-220).
  *
  * At 100 TB: queue dirs are date/hour-partitioned so the streaming
  * source lists incrementally; tombstone anti-joins stay broadcast
  * (ids only); compaction runs as a background job per partition.
  */
class QueueStore(val spark: SparkSession, val root: String) {

  val scheduledSchema: StructType = Schemas.event
    .add("sched_id", StringType).add("not_before", "timestamp").add("kind", StringType)
  val processingSchema: StructType = Schemas.event
    .add("claim_id", StringType).add("claimed_at", "timestamp")
  val deadSchema: StructType = Schemas.event
  private val tombSchema = new StructType().add("id", StringType)
  private val limitSchema = new StructType().add("processed_at", "timestamp")

  def queueDir(q: String): String = s"$root/queue/$q"
  def scheduledDir: String = s"$root/scheduled"
  def processingDir: String = s"$root/processing"
  def deadDir: String = s"$root/dead"
  def limitDir(key: String): String = s"$root/limit/${key.replace('/', '_').replace(':', '_')}"
  def tombDir(table: String): String = s"$root/tombstones/$table"
  def checkpointDir(name: String): String = s"$root/checkpoints/$name"
  private def pausedFlag(name: String) = new Path(s"$root/control/paused/$name")

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def ensureDir(dir: String): Unit = fs.mkdirs(new Path(dir))

  private def hasData(dir: String): Boolean = {
    val p = new Path(dir)
    fs.exists(p) && fs.listStatus(p).exists(s => !s.getPath.getName.startsWith("_"))
  }

  def readOrEmpty(dir: String, schema: StructType): DataFrame =
    if (hasData(dir)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Collision-free append: write to a private staging dir, then move
    * the part files into the target under fresh unique names (rename is
    * atomic per file). A direct `mode("append")` is UNSAFE here — the
    * engine has concurrent writers per directory (multiple pipelines
    * claiming into `processing/`, enqueuers + housekeeper on a queue
    * dir) and they would share one `_temporary/0` committer dir, where
    * one job's cleanup deletes the other's in-flight task files. */
  def append(dir: String, df: DataFrame, schema: StructType): Unit = {
    val id = java.util.UUID.randomUUID().toString
    val staging = s"$root/.staging/$id"
    df.select(schema.fieldNames.map(col).toSeq: _*)
      .write.mode("overwrite").parquet(staging)
    val target = new Path(dir)
    fs.mkdirs(target)
    val parts = fs.listStatus(new Path(staging))
      .filter(f => f.getPath.getName.startsWith("part-"))
    parts.zipWithIndex.foreach { case (f, i) =>
      fs.rename(f.getPath, new Path(target, s"part-$id-$i.parquet"))
    }
    fs.delete(new Path(staging), true)
  }

  /** Append tombstones for the given single-column id DataFrame. */
  def tombstone(table: String, ids: DataFrame): Unit = {
    val tomb = ids.toDF("id")
    append(tombDir(table), tomb, tomb.schema.asInstanceOf[StructType])
  }

  /** rows minus tombstones; idCol names the row's tombstone key. */
  def live(dir: String, table: String, schema: StructType, idCol: String): DataFrame = {
    val rows = readOrEmpty(dir, schema)
    val tombs = readOrEmpty(tombDir(table), tombSchema)
    rows.join(broadcast(tombs), rows(idCol) === tombs("id"), "left_anti")
  }

  // -- typed views of the state tables ------------------------------------
  def queueRows(q: String): DataFrame = readOrEmpty(queueDir(q), Schemas.event)
  def liveScheduled: DataFrame = live(scheduledDir, "scheduled", scheduledSchema, "sched_id")
  def liveProcessing: DataFrame = live(processingDir, "processing", processingSchema, "claim_id")
  def deadRows: DataFrame = readOrEmpty(deadDir, deadSchema)
  /** Distinct claims for a queue — distinct because a replayed micro-
    * batch re-appends the same deterministic claim_id, which must not
    * skew the job_counts arithmetic. */
  def rawProcessingCount(q: String): Long =
    readOrEmpty(processingDir, processingSchema)
      .where(col("queue") === q).select("claim_id").distinct().count()

  /** Jobs admitted through a rate-limit window (B2's ns:limit ZSET): the
    * window state is durable, rebuilt from processed_at on restart —
    * exactly as the reference rebuilds from the limit ZSET. */
  def limitLogAppend(key: String, n: Long, at: Timestamp): Unit = {
    if (n > 0) {
      import spark.implicits._
      append(limitDir(key), Seq.fill(n.toInt)(at).toDF("processed_at"), limitSchema)
    }
  }
  def limitCountSince(key: String, sinceMs: Long): Long =
    readOrEmpty(limitDir(key), limitSchema)
      .where(col("processed_at") > new Timestamp(sinceMs)).count()

  // -- durable pause flag (pipeline/event.ex:41-55) -----------------------
  def setPaused(name: String, paused: Boolean): Unit =
    if (paused) { fs.mkdirs(pausedFlag(name).getParent); fs.create(pausedFlag(name), true).close() }
    else fs.delete(pausedFlag(name), false)
  def isPaused(name: String): Boolean = fs.exists(pausedFlag(name))

  /** Fold tombstones into the row files: rewrite live rows to a fresh
    * directory and atomically swap it in, then drop the tombstones. */
  def compact(dir: String, table: String, schema: StructType, idCol: String): Unit = {
    val tmp = s"$dir.compact.tmp"
    fs.delete(new Path(tmp), true)
    live(dir, table, schema, idCol).write.mode("overwrite").parquet(tmp)
    fs.delete(new Path(dir), true)
    fs.rename(new Path(tmp), new Path(dir))
    fs.delete(new Path(tombDir(table)), true)
  }
}
