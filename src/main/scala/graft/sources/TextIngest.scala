package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document ingestion — the front door of the curation pipeline: raw
  * JSON-lines / CSV drops become the canonical `documents` layout the
  * whole query registry runs on.
  *
  * Scale rules baked in (each one is a 100 TB survival trait):
  *   - EXPLICIT schema, never inference: schema inference is a full
  *     extra pass over the input, and on a mixed-quality drop it infers
  *     the union of whatever the corrupt lines look like. The schema is
  *     the contract; rows that don't fit it get quarantined, they don't
  *     get to widen it.
  *   - PERMISSIVE decode with a corrupt-record column: one bad line in
  *     a 100 GB shard must quarantine ONE row, not kill the task (the
  *     default FAILFAST would) or silently vanish (DROPMALFORMED).
  *   - normalization is a fused narrow map (trim + recompute n_chars +
  *     validity flags) — no shuffle until dedup.
  *   - duplicate doc_ids resolve DETERMINISTICALLY (longest text, ties
  *     to the md5-smallest) with one max(struct) aggregate — no window
  *     sort, map-side combinable, same idiom as dedup_keep_best.
  *   - the sink is written partitioned by `source` so every downstream
  *     per-source query gets partition pruning for free.
  */
object TextIngest {

  /** The raw-drop schema: doc_id may be missing/garbled in the wild, so
    * it's nullable here and validated in normalize(). */
  val rawSchema: StructType = new StructType()
    .add("doc_id", LongType)
    .add("text", StringType)
    .add("lang", StringType)
    .add("source", StringType)

  private val Corrupt = "_corrupt_record"

  /** JSON-lines reader; corrupt lines land in `_corrupt_record`. */
  def readJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(rawSchema.add(Corrupt, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)

  /** CSV reader (explicit schema, header expected, standard quoting). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(rawSchema.add(Corrupt, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .option("header", "true")
      .csv(path)

  /** Rows the decoder or the contract rejected: undecodable lines,
    * missing ids, empty/whitespace-only text. Kept as a frame so a
    * production run can sink them to a quarantine table for triage. */
  def quarantine(raw: DataFrame): DataFrame =
    raw.where(col(Corrupt).isNotNull ||
      col("doc_id").isNull || col("text").isNull ||
      length(trim(col("text"))) === 0)

  /** The canonical-layout transform: validity gate, trim, n_chars
    * recompute, deterministic duplicate-id resolution. Output schema ==
    * the fixture `documents` schema. */
  def normalize(raw: DataFrame): DataFrame = {
    val valid = raw
      .where(col(Corrupt).isNull &&
        col("doc_id").isNotNull && col("text").isNotNull &&
        length(trim(col("text"))) > 0)
      .select(col("doc_id"), trim(col("text")).as("text"),
        coalesce(col("lang"), lit("und")).as("lang"),
        coalesce(col("source"), lit("unknown")).as("source"))
    // keep the longest text per doc_id, ties to the md5-smallest —
    // one combinable aggregate, deterministic under any partitioning
    valid
      .groupBy("doc_id")
      .agg(max(struct(length(col("text")).as("len"),
        // lexicographically INVERTED digest so max(struct) picks the
        // smallest md5 on ties, keeping the election order-free
        translate(md5(col("text").cast("binary")),
          "0123456789abcdef", "fedcba9876543210").as("inv"),
        col("text").as("text"), col("lang").as("lang"),
        col("source").as("source"))).as("best"))
      .select(col("doc_id"), col("best.text").as("text"),
        col("best.lang").as("lang"), col("best.source").as("source"),
        length(col("best.text")).cast("long").as("n_chars"))
  }

  /** Write the canonical layout partitioned by source, clustered by
    * doc_id inside each file — downstream per-source queries prune
    * directories, id-keyed joins read locally sorted runs. The sink is
    * `<outDir>/documents.parquet`, the table-dir convention every
    * registry query and CurationRun consume, so ingest output plugs
    * straight into the rest of the engine. */
  def writeCanonical(df: DataFrame, outDir: String): Unit =
    df.repartition(col("source"))
      .sortWithinPartitions("source", "doc_id")
      .write.mode("overwrite")
      .partitionBy("source")
      .parquet(s"$outDir/documents.parquet")

  /** Streaming ingest: the same schema/normalization contract over a
    * live drop directory. File-stream source (new files per
    * micro-batch, `maxFilesPerTrigger` = admission control — the same
    * demand knob the queue pipeline uses), per-batch narrow-map
    * normalization, IDEMPOTENT partitioned parquet sink.
    *
    * End-to-end semantics: the checkpoint makes the SOURCE replay a
    * micro-batch after a crash between the sink write and the commit;
    * a blind `append` sink would duplicate those documents (foreachBatch
    * alone is only at-least-once). The sink is therefore keyed on the
    * deterministic batchId: each batch lands under
    * `ingest_batch=<id>/source=<s>/` via dynamic partition overwrite,
    * so a replay REPLACES exactly its own partitions (including any
    * partial output of the crashed attempt) and never touches other
    * batches' — replay-idempotent, i.e. effectively exactly-once once
    * the batch commits. Read the sink back with
    * [[readStreamedCanonical]], which drops the idempotency key to
    * restore the canonical `documents` schema.
    *
    * Duplicate-id election is per micro-batch here (global keep-best
    * needs state; the batch normalize() handles backfills) —
    * cross-batch id dedup composes with StreamingAnalytics.dedupByJid
    * when a drop feed itself re-delivers. Stop the returned query to
    * end ingestion. */
  def streamJsonLines(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 8): org.apache.spark.sql.streaming.StreamingQuery = {
    val raw = spark.readStream
      .schema(rawSchema.add(Corrupt, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inDir)
    // foreachBatch: the keep-best election is an aggregation, which
    // append-mode streaming would reject; running the BATCH normalize
    // per micro-batch keeps one code path for both modes
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, outDir)
      }
      .start()
  }

  /** The per-micro-batch sink write (see [[streamJsonLines]]): replay-
    * idempotent by construction — mode=overwrite + dynamic partition
    * overwrite replaces only the (ingest_batch, source) partitions this
    * batch produces, so running it twice with the same batchId yields
    * byte-identical sink contents. Package-visible so the replay
    * contract is spec-testable without crashing a real stream. */
  private[graft] def writeBatch(batch: DataFrame, batchId: Long, outDir: String): Unit =
    normalize(batch)
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch", "source")
      .parquet(s"$outDir/documents.parquet")

  /** Read the streaming sink back in the canonical `documents` shape
    * (drops the ingest_batch idempotency partition key). */
  def readStreamedCanonical(spark: SparkSession, outDir: String): DataFrame = {
    val df = spark.read.parquet(s"$outDir/documents.parquet")
    df.select("doc_id", "text", "lang", "source", "n_chars")
  }

  /** One-call ingest: read → quarantine split → normalize → write.
    * Returns (n_ok, n_quarantined). */
  def ingestJsonLines(spark: SparkSession, inPath: String, outDir: String): (Long, Long) = {
    val raw = readJsonLines(spark, inPath).cache()
    raw.count() // both the quarantine and normalize branches read it
    val bad = quarantine(raw).count()
    val good = normalize(raw)
    writeCanonical(good, outDir)
    val n = spark.read.parquet(s"$outDir/documents.parquet").count()
    raw.unpersist()
    (n, bad)
  }
}
