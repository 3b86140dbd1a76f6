package graft.operators

import graft.queries.DedupQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end curation RUN — the query registry assembled into an
  * executable pipeline: quality gate → near-dedup survivor election →
  * split assignment → train decontamination → partitioned outputs +
  * manifest + report.
  *
  * Architecture: MATERIALIZED STAGE BOUNDARIES. Each stage writes a
  * directory that is itself a valid table dir (`<stage>/documents
  * .parquet`), so (a) every dir-based operator in the registry runs
  * unchanged against any intermediate — the near-dedup stage literally
  * calls the same lshVerifiedPairs/CC/election plans the oracle-checked
  * queries run, and the spec cross-checks the run against those
  * queries; (b) a crashed 100 TB run restarts at the last completed
  * stage (_SUCCESS-gated skip) instead of hour one; (c) stage outputs
  * are auditable tables, not opaque lineage. The cost — one extra
  * write+read per stage — is the standard price of restartability at
  * scale, and each write is source-partitioned so downstream stages
  * keep partition pruning.
  */
object CurationRun {

  /** Per-stage attrition + output accounting, the run's publishable
    * report. */
  final case class Report(
      nInput: Long,
      nQualityFail: Long,
      nNearDupDropped: Long,
      nTrain: Long,
      nVal: Long,
      nTest: Long,
      nContaminated: Long,
      nFinalTrain: Long) {
    def consistent: Boolean =
      nInput - nQualityFail - nNearDupDropped == nTrain + nVal + nTest &&
        nFinalTrain == nTrain - nContaminated
  }

  /** Probe through the Hadoop FileSystem API, NOT java.io.File: stage
    * dirs on a 100 TB run live on an object store / HDFS where a local
    * file probe silently returns false and re-runs everything. */
  private[operators] def exists(s: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  private def done(s: SparkSession, dir: String): Boolean =
    exists(s, s"$dir/documents.parquet/_SUCCESS")

  private def writeStage(df: DataFrame, dir: String): Unit =
    df.repartition(col("source"))
      .sortWithinPartitions("source", "doc_id")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def readStage(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Gopher-style quality gate (same integer cross-ratios as
    * t_rule_funnel / t_corpus_clean): keep docs passing all four
    * rules. Row-local, fused into the scan. */
  private[operators] def qualityGate(docs: DataFrame, s: SparkSession): DataFrame = {
    graft.functions.expr.TextExpressions.register(s)
    val ws = split(col("text"), " ")
    docs
      .withColumn("_n", size(ws))
      .withColumn("_u", size(array_distinct(ws)))
      .withColumn("_chars", length(col("text")) - (col("_n") - 1))
      .withColumn("_top", call_function("graft_maxfreq", ws))
      .where(col("_n") >= 20 && col("_u") * 20 >= col("_n") * 7 &&
        col("_top") * 25 <= col("_n") * 3 && col("_chars") <= col("_n") * 5)
      .drop("_n", "_u", "_chars", "_top")
  }

  /** The run dir's recorded manifest-shard count (`outDir/_layout`,
    * written by [[run]]): a layout parameter, not a constant — at
    * 100 TB, 16 manifest shards is a loader-parallelism ceiling. A
    * missing record REFUSES like the index twins' readers do — a
    * silent default would let a lost record on a non-16-shard run
    * route delta manifest rows with the wrong modulus, the exact
    * mis-shard the record exists to prevent (every run since the
    * record was introduced writes one; none predate it). */
  val DefaultShards = 16

  private[graft] def layoutShards(s: SparkSession, outDir: String): Int =
    SegmentLog.readLayoutShards(s, s"$outDir/_layout").getOrElse(
      throw new IllegalArgumentException(
        s"$outDir: no _layout record — the run predates (or lost) its " +
          "layout descriptor; re-run to record the manifest shard count"))

  private def writeLayout(s: SparkSession, outDir: String, nShards: Int): Unit =
    SegmentLog.writeLayout(s, s"$outDir/_layout", nShards)

  /** Execute (or resume) the run. Stage dirs live under `outDir`;
    * completed stages are skipped by their _SUCCESS marker. */
  def run(s: SparkSession, inputDir: String, outDir: String,
      nShards: Int = DefaultShards): Report = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val clean = s"$outDir/stage1_clean"
    val deduped = s"$outDir/stage2_deduped"
    val reportPq = s"$outDir/report.parquet"

    // stage 3 gate, checked FIRST: the report parquet is written LAST
    // (after final/ and manifest.parquet), so its _SUCCESS proves the
    // whole run landed — a resume of a completed run is a metadata-only
    // no-op read, never a re-run of split/decontamination/final writes
    // (at 100 TB the most expensive redo in the pipeline)
    if (exists(s, s"$reportPq/_SUCCESS")) {
      // a completed run's manifest was routed with the RECORDED count —
      // resuming with a different request must refuse, not silently
      // return a manifest sharded differently than asked
      require(layoutShards(s, outDir) == nShards,
        s"$outDir completed with ${layoutShards(s, outDir)} manifest " +
          s"shards; requested $nShards — re-run into a fresh dir")
      return readReport(s, reportPq)
    }

    // stage 1: quality gate
    if (!done(s, clean))
      writeStage(qualityGate(
        s.read.parquet(s"$inputDir/documents.parquet"), s), clean)

    // stage 2: near-dedup survivor election — the SAME plans the
    // oracle-checked queries run (verified LSH pairs → contraction-
    // seeded CC → longest-doc election), pointed at the stage-1 dir
    if (!done(s, deduped)) {
      val pairs = DedupQueries.lshVerifiedPairs(s, clean)
        .select("doc_a", "doc_b")
      val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val cc = DedupQueries.pointerJumpCC(
        DedupQueries.localUnionFindEdges(edges).localCheckpoint(true))
        .select("doc_id", "cluster_id")
      val docs = readStage(s, clean)
      val kept = cc.join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy("cluster_id")
        .agg(max(struct(col("n_chars"), (-col("doc_id")).as("nd"))).as("best"))
        .select((-col("best.nd")).as("doc_id"))
      val dropped = cc.join(kept, Seq("doc_id"), "left_anti")
        .select("doc_id")
      writeStage(docs.join(dropped, Seq("doc_id"), "left_anti"), deduped)
    }

    // stage 3: split + decontamination + final outputs, one pass over
    // the deduped stage. Split is the t_split_assign convention;
    // Decontamination runs against the stage-2 dir (its holdout bucket
    // IS the val+test slice of the same hash) on word 8-GRAMS — the
    // GPT-3-shaped long-gram match. The registry's 3-gram baseline
    // false-positives catastrophically on a template-generated corpus
    // at scale (sf0.1: flags 4000/4000 train docs -> nFinalTrain = 0;
    // the 8-gram form flags only the 87 genuine near-verbatim
    // overlaps, most of which stage-2 dedup already removed).
    val docs = readStage(s, deduped)
    val bucket = (col("doc_id") % 1000003L * 2654435761L % 100).cast("int")
    val contam = DedupQueries.decontaminateGrams(s, deduped)
      .where(col("n_shared") * 5 >= col("n_grams"))
      .select(col("doc_id"), lit(1).as("ct"))
    val tagged = docs
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .join(contam, Seq("doc_id"), "left")
      .withColumn("drop_contaminated",
        (col("split") === "train" && col("ct").isNotNull).cast("boolean"))
      .drop("ct")
      .cache()
    tagged.count() // several consumers below — populate once
    val fin = tagged.where(!col("drop_contaminated"))
      .drop("drop_contaminated")
    fin.repartition(col("split"), col("source"))
      .sortWithinPartitions("split", "source", "doc_id")
      .write.mode("overwrite").partitionBy("split", "source")
      .parquet(s"$outDir/final")
    // manifest: one row per emitted doc, shard-routed (guarded hash,
    // modulus recorded in _layout so every later reader/ingester agrees)
    writeLayout(s, outDir, nShards)
    fin.select(col("doc_id"), col("split"), col("source"), col("n_chars"),
      (col("doc_id") % 1000003L * 2654435761L % nShards).cast("int").as("shard"))
      .write.mode("overwrite").parquet(s"$outDir/manifest.parquet")

    val nInput = s.read.parquet(s"$inputDir/documents.parquet").count()
    val nClean = readStage(s, clean).count()
    val nDeduped = docs.count()
    val bySplit = tagged.groupBy("split")
      .agg(count(lit(1)).as("n"),
        sum(col("drop_contaminated").cast("long")).as("nc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    tagged.unpersist()
    val (nTrain, nContam) = bySplit.getOrElse("train", (0L, 0L))
    val report = Report(
      nInput = nInput,
      nQualityFail = nInput - nClean,
      nNearDupDropped = nClean - nDeduped,
      nTrain = nTrain,
      nVal = bySplit.getOrElse("val", (0L, 0L))._1,
      nTest = bySplit.getOrElse("test", (0L, 0L))._1,
      nContaminated = nContam,
      nFinalTrain = nTrain - nContam)
    // the stage-3 completion marker (see gate above): one-row parquet,
    // written after every other output, doubles as the durable audit
    // record of the run's attrition accounting
    writeReport(s, report, reportPq)
    report
  }

  private def writeReport(s: SparkSession, r: Report, path: String): Unit = {
    import s.implicits._
    Seq(r).toDF().coalesce(1).write.mode("overwrite").parquet(path)
  }

  private def readReport(s: SparkSession, path: String): Report = {
    import s.implicits._
    s.read.parquet(path).as[Report].head()
  }
}
