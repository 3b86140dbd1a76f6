package graft.operators

import graft.queries.DedupQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental curation — the O(delta) production shape for a corpus
  * that grows daily, composed from the same oracle-checked plans the
  * batch [[CurationRun]] materializes:
  *
  *   1. [[buildIndex]] (once, after a completed run): persist the
  *      probe structures a delta needs — LSH band keys + cluster/keeper
  *      map of every gated base doc, and the word-8-gram inverted
  *      indexes of the final train/holdout slices. This is exactly the
  *      state dedup_incremental's scaladoc says "a 100 TB lake would
  *      keep materialized between ingests".
  *   2. [[ingestDelta]] (per batch): gate → sign → dedup the delta
  *      against ITSELF (same LSH + CC + election plans) → match delta
  *      clusters against the base via the band index (candidates only;
  *      base TEXT is read candidate-bounded, never corpus-scanned) →
  *      merged-cluster election (a delta doc CAN replace a base keeper
  *      it beats) → split assign → two-sided 8-gram decontamination
  *      (delta train vs the full holdout; base train vs the NEW holdout
  *      grams) → final-layout edits (append survivors, rewrite only the
  *      partitions holding removed docs) → index updates.
  *
  * Exactness contract (spec-proven on a corpus exercising every path):
  * the merged output equals a from-scratch [[CurationRun.run]] on the
  * union, EXCEPT three documented divergences inherent to incremental
  * dedup — (a) a delta path BRIDGING two base clusters merges their
  * keepers' election here but cannot resurrect base members the
  * from-scratch merge would also have dropped differently when the
  * bridge changes which member is "best" transitively; (b) a delta
  * batch pushing a base LSH bucket over the hot-cap would retro-drop
  * base-base candidate pairs from that bucket in a from-scratch run
  * (delta-involved pairs ARE capped here, over the combined occupancy,
  * exactly like from-scratch — only the already-committed base-base
  * edges are not retracted);
  * (c) grams of a REPLACED holdout keeper are not retracted from the
  * holdout index (retraction could re-admit previously dropped train
  * docs — a full recompute; keeping them is conservative: it only ever
  * drops MORE train docs than from-scratch, never leaks contamination).
  *
  * Scale shape: every per-delta stage is keyed on the delta or on
  * candidate-bounded probes; index scans are column-pruned id/hash
  * passes, never the corpus text. The two per-ingest index REWRITES
  * (cluster map, train meta — both skinny integer tables) are the
  * simple form; a 100 TB deployment would log-structure them
  * (append increments, fold on read, compact periodically).
  */
object DeltaIngest {

  /** Per-delta attrition + edit accounting. */
  final case class DeltaReport(
      nDelta: Long,
      nQualityFail: Long,
      nDupDropped: Long, // delta docs dropped by dedup (vs base or within delta)
      nReplacedBase: Long, // base keepers beaten + removed
      nTrain: Long,
      nVal: Long,
      nTest: Long,
      nContaminatedDelta: Long, // delta train docs dropped by decontamination
      nContaminatedBase: Long, // base train docs newly contaminated + removed
      nAppended: Long,
      nRemoved: Long) {
    def consistent: Boolean =
      nAppended == nTrain + nVal + nTest - nContaminatedDelta &&
        nRemoved == nReplacedBase + nContaminatedBase
  }

  private def idxDir(outDir: String) = s"$outDir/index"

  /** True once [[buildIndex]] has completed for this run dir. */
  def indexed(s: SparkSession, outDir: String): Boolean =
    CurationRun.exists(s, s"${idxDir(outDir)}/index_meta.parquet/_SUCCESS")

  /** Build the delta-probe index from a COMPLETED run (report marker
    * required). Idempotent: gated by its own marker, written last. */
  def buildIndex(s: SparkSession, outDir: String): Unit = {
    require(CurationRun.exists(s, s"$outDir/report.parquet/_SUCCESS"),
      s"no completed CurationRun at $outDir")
    if (indexed(s, outDir)) return
    val idx = idxDir(outDir)
    val clean = s"$outDir/stage1_clean"
    val cleanDocs = s.read.parquet(s"$clean/documents.parquet")

    // (1) band index over EVERY gated base doc — matching must see the
    // docs stage-2 dropped too (a delta doc near-dupping a dropped
    // member belongs to that member's cluster in a from-scratch run)
    DedupQueries.minhashSigOf(s, cleanDocs)
      .select(col("doc_id"), posexplode(
        array(DedupQueries.MinhashBands.map(b => col(b._1)): _*))
        .as(Seq("band", "bkey")))
      .write.mode("overwrite").parquet(s"$idx/bands.parquet")

    // (2) cluster map: every gated doc → its cluster's keeper (id +
    // length); singletons (absent from the CC output) map to self at
    // probe time via a left join. Same plans stage 2 ran.
    val pairs = DedupQueries.lshVerifiedPairs(s, clean).select("doc_a", "doc_b")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val cc = DedupQueries.pointerJumpCC(
      DedupQueries.localUnionFindEdges(edges).localCheckpoint(true))
      .select("doc_id", "cluster_id")
    val withLen = cc.join(cleanDocs.select("doc_id", "n_chars"), "doc_id")
    val keepers = withLen.groupBy("cluster_id")
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("nd"))).as("b"))
      .select(col("cluster_id"), (-col("b.nd")).as("keeper_id"),
        col("b.n_chars").as("keeper_len"))
    withLen.join(keepers, "cluster_id")
      .select("doc_id", "cluster_id", "keeper_id", "keeper_len")
      .write.mode("overwrite").parquet(s"$idx/cc.parquet")

    // (3) gram indexes over the stage-2 table — the decontamination
    // basis run() used: holdout = buckets >= 80, train = buckets < 80.
    val dedupedDocs = s.read.parquet(s"$outDir/stage2_deduped/documents.parquet")
      .withColumn("bucket", DedupQueries.splitBucket)
      .withColumn("gs", DedupQueries.gramHashes(8))
    dedupedDocs.where(col("bucket") >= 80)
      .select(explode(col("gs")).as("gh")).distinct()
      .write.mode("overwrite").parquet(s"$idx/holdout_grams.parquet")
    // only train SURVIVORS (docs still in final) carry postings: a doc
    // the base run already dropped can never be re-dropped
    val trainMeta = dedupedDocs.where(col("bucket") < 80)
      .select(col("doc_id"), size(col("gs")).as("n_grams"),
        explode(col("gs")).as("gh"))
    val shared = trainMeta
      .join(s.read.parquet(s"$idx/holdout_grams.parquet"), "gh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    val meta = dedupedDocs.where(col("bucket") < 80)
      .select(col("doc_id"), size(col("gs")).as("n_grams"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .where(col("n_shared") * 5 < col("n_grams"))
    meta.write.mode("overwrite").parquet(s"$idx/train_meta.parquet")
    trainMeta.join(meta.select("doc_id"), Seq("doc_id"), "left_semi")
      .select("gh", "doc_id")
      .write.mode("overwrite").parquet(s"$idx/train_grams.parquet")

    // marker last: its _SUCCESS proves every index table landed
    import s.implicits._
    Seq(("v1", 8)).toDF("version", "gram")
      .write.mode("overwrite").parquet(s"$idx/index_meta.parquet")
  }

  /** Streaming composition — the live form of the daily-growth story:
    * a drop directory of JSON-lines files becomes per-micro-batch
    * [[ingestDelta]] calls against the curated layout. Semantics:
    *   - each batch runs the FULL incremental pipeline (gate, dedup vs
    *     corpus + within batch, election, split, two-sided decontam,
    *     layout edits, index updates), so cross-drop duplicates are
    *     caught by the index exactly like base-corpus ones;
    *   - a marker file per batchId makes a replay of a COMMITTED batch
    *     (crash between ingest and checkpoint commit) a no-op;
    *   - a crash MID-ingest leaves the known non-transactional window
    *     (appends landed, marker missing → the replay re-matches
    *     against the index: docs whose index entries landed are
    *     self-deduped, docs in the append-only final but not yet
    *     indexed would duplicate). A production deployment puts the
    *     layout edits and the marker in one commit protocol (e.g. a
    *     table format with transactions); the marker keeps the common
    *     crash window (post-ingest, pre-checkpoint) safe here. */
  def streamInto(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 8): org.apache.spark.sql.streaming.StreamingQuery = {
    val raw = spark.readStream
      .schema(graft.sources.TextIngest.rawSchema
        .add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inDir)
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, batch, batchId, outDir); ()
      }
      .start()
  }

  /** One micro-batch of [[streamInto]]: normalize through the
    * TextIngest contract, skip if this batchId's marker exists
    * (replay), ingest, then land the marker. Package-visible so the
    * replay contract is spec-testable without crashing a stream. */
  private[graft] def ingestBatch(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      outDir: String): Option[DeltaReport] = {
    val marker = new org.apache.hadoop.fs.Path(
      s"$outDir/delta_markers/batch-$batchId")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) return None
    val delta = graft.sources.TextIngest.normalize(batch)
    val report =
      if (delta.isEmpty) None
      else Some(ingestDelta(spark, delta, outDir))
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
    report
  }

  /** Atomically replace a parquet table dir: write to a staging path,
    * then swap via FS rename (Spark cannot overwrite a path that feeds
    * the very plan being written). Crash ordering: the live table is
    * renamed ASIDE (never deleted first), so no instant leaves the
    * table missing — a crash mid-swap leaves either the old table live,
    * or the new one live with a `_old` leftover the next call sweeps.
    * Both renames are CHECKED: object-store shims can return false
    * without throwing, and a silent failure here would corrupt the
    * index. */
  private def replaceTable(s: SparkSession, df: DataFrame, path: String): Unit = {
    val staged = path + "_staged"
    df.write.mode("overwrite").parquet(staged)
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val old = new org.apache.hadoop.fs.Path(path + "_old")
    if (fs.exists(old)) fs.delete(old, true) // prior completed swap's leftover
    if (fs.exists(p) && !fs.rename(p, old))
      throw new java.io.IOException(s"replaceTable: rename $p -> $old failed")
    if (!fs.rename(new org.apache.hadoop.fs.Path(staged), p)) {
      if (fs.exists(old)) fs.rename(old, p) // roll back: never leave the table absent
      throw new java.io.IOException(s"replaceTable: rename $staged -> $p failed")
    }
    fs.delete(old, true)
  }

  /** Ingest one delta batch (canonical documents schema: doc_id, text,
    * lang, source, n_chars) into a completed + indexed run at outDir.
    * Returns the edit report; final layout, manifest, and index are
    * updated in place. */
  def ingestDelta(s: SparkSession, delta: DataFrame, outDir: String): DeltaReport = {
    require(indexed(s, outDir), s"buildIndex has not completed for $outDir")
    val idx = idxDir(outDir)
    val nDelta = delta.count()

    // ---- stage 1: quality gate (row-local, same rules as the run) ----
    // Every shared frame below is localCheckpoint(true), NOT cache():
    // stage 5 WRITES to paths these plans read (stage1_clean, the index
    // tables), and Spark's refreshByPath invalidates cached plans that
    // reference a written path — a late consumer would then silently
    // RECOMPUTE the whole chain against the already-mutated state (the
    // first cut of this operator corrupted its own report and index
    // exactly that way). Checkpointing severs the plan from the files,
    // so every frame is immutable from the moment it materializes.
    val gated = CurationRun.qualityGate(delta, s).localCheckpoint(true)
    val nGated = gated.count()

    // ---- stage 2a: within-delta near-dedup (same LSH + CC plans) ----
    val dShingles = DedupQueries.shinglesOf(s, gated).localCheckpoint(true)
    val dCnt = dShingles.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val dBands = DedupQueries.minhashSigOf(s, gated)
      .select(col("doc_id"), posexplode(
        array(DedupQueries.MinhashBands.map(b => col(b._1)): _*))
        .as(Seq("band", "bkey")))
      .localCheckpoint(true)
    // Hot-bucket cap, mirroring lshVerifiedPairs (capN=100): occupancy
    // is counted over the UNION of delta and base rows — a from-scratch
    // run caps the combined bucket — but only for buckets the delta
    // touches (candidate-bounded: the base side is semi-joined to the
    // delta's bucket keys before counting). Probe rows in hot buckets
    // are dropped from BOTH candidate joins below; a boilerplate-heavy
    // delta can no longer trigger an uncapped quadratic band self-join.
    // The UNFILTERED dBands still feeds occupancy and the stage-5 index
    // append — future ingests must see true bucket occupancy.
    val capN = 100
    val baseBandsIdx = s.read.parquet(s"$idx/bands.parquet")
    val deltaBuckets = dBands.select("band", "bkey").distinct()
    val baseOcc = baseBandsIdx.join(deltaBuckets, Seq("band", "bkey"), "left_semi")
      .groupBy("band", "bkey").agg(count(lit(1)).as("n_base"))
    val hotBuckets = dBands.groupBy("band", "bkey")
      .agg(count(lit(1)).as("n_delta"))
      .join(baseOcc, Seq("band", "bkey"), "left")
      .where(col("n_delta") + coalesce(col("n_base"), lit(0L)) > capN)
      .select("band", "bkey")
    val dProbe = dBands.join(broadcast(hotBuckets), Seq("band", "bkey"), "left_anti")
      .localCheckpoint(true)
    val dCand = dProbe.as("a").join(dProbe.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    def verify(cand: DataFrame, shA: DataFrame, shB: DataFrame,
        cntA: DataFrame, cntB: DataFrame): DataFrame = {
      // exact shingle-Jaccard >= 0.3 on candidates only — the
      // lshVerifiedPairs predicate, verbatim
      cand
        .join(shA.select(col("doc_id").as("doc_a"), col("s")), "doc_a")
        .join(shB.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
        .join(cntA.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(cntB.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .where(col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")) >= 0.3)
        .select("doc_a", "doc_b")
    }
    val dPairs = verify(dCand, dShingles, dShingles, dCnt, dCnt)
    val dEdges = dPairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(dPairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // delta cluster id per delta doc; singletons = own id
    val dCC = DedupQueries.pointerJumpCC(
        DedupQueries.localUnionFindEdges(dEdges).localCheckpoint(true))
      .select("doc_id", "cluster_id")
    val dClusters = gated.select("doc_id", "n_chars")
      .join(dCC, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("cluster_id"), col("doc_id")).as("dcid"))
      .localCheckpoint(true)
    val dBest = dClusters.groupBy("dcid")
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("nd"))).as("b"))
      .select(col("dcid"), (-col("b.nd")).as("d_best_id"),
        col("b.n_chars").as("d_best_len"))

    // ---- stage 2b: delta-vs-base matching (candidate-bounded) ----
    val xCand = dProbe
      .join(baseBandsIdx
          .select(col("band"), col("bkey"), col("doc_id").as("base_id")),
        Seq("band", "bkey"))
      .select(col("doc_id").as("delta_id"), col("base_id")).distinct()
      .localCheckpoint(true)
    // base candidate docs' shingles: read ONLY the candidate ids' text
    val baseCandDocs = s.read
      .parquet(s"$outDir/stage1_clean/documents.parquet")
      .join(xCand.select(col("base_id").as("doc_id")).distinct(), Seq("doc_id"),
        "left_semi")
    val bShingles = DedupQueries.shinglesOf(s, baseCandDocs).localCheckpoint(true)
    val bCnt = bShingles.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val xPairs = verify(
      xCand.select(col("delta_id").as("doc_a"), col("base_id").as("doc_b")),
      dShingles, bShingles, dCnt, bCnt)
      .select(col("doc_a").as("delta_id"), col("doc_b").as("base_id"))

    // ---- stage 2c: merged-cluster election ----
    // per delta cluster: the distinct base KEEPERS its members match
    // (a matched base doc maps to its cluster keeper via the cc index;
    // docs absent from cc are singletons → their own keeper)
    val ccIdx = s.read.parquet(s"$idx/cc.parquet")
    val matchedKeepers = xPairs
      .join(dClusters.select(col("doc_id").as("delta_id"), col("dcid")), "delta_id")
      .join(ccIdx.select(col("doc_id").as("base_id"), col("keeper_id"),
        col("keeper_len")), Seq("base_id"), "left")
      // singleton base doc: keeper is itself — need its length; the
      // verify step already bounded it, reuse bCnt? lengths come from
      // the candidate read (n_chars)
      .join(baseCandDocs.select(col("doc_id").as("base_id"),
        col("n_chars").as("self_len")), "base_id")
      .select(col("dcid"),
        coalesce(col("keeper_id"), col("base_id")).as("k_id"),
        coalesce(col("keeper_len"), col("self_len")).as("k_len"))
      .distinct()
      .localCheckpoint(true)
    // election among {matched base keepers} ∪ {delta best}: winner =
    // max(n_chars, ties to smaller id) — the keep_best rule. From-
    // scratch equivalence: base keepers are the maxima of their
    // clusters and the delta best is the max of its cluster, so the
    // max over keepers IS the max over the merged membership.
    val baseBestPerCluster = matchedKeepers.groupBy("dcid")
      .agg(max(struct(col("k_len"), (-col("k_id")).as("nd"))).as("b"))
      .select(col("dcid"), (-col("b.nd")).as("b_best_id"),
        col("b.k_len").as("b_best_len"))
    val election = dBest.join(baseBestPerCluster, Seq("dcid"), "left")
      .select(col("dcid"), col("d_best_id"), col("d_best_len"),
        col("b_best_id"), col("b_best_len"),
        (col("b_best_id").isNull ||
          struct(col("d_best_len"), (-col("d_best_id")).as("nd")) >
            struct(col("b_best_len"), (-col("b_best_id")).as("nd")))
          .as("delta_wins"))
      .localCheckpoint(true)
    // kept delta docs: the cluster best, when the delta wins
    val keptIds = election.where(col("delta_wins"))
      .select(col("d_best_id").as("doc_id"))
    // replaced base keepers: every matched keeper of a winning cluster
    val replacedBase = matchedKeepers
      .join(election.where(col("delta_wins")).select("dcid"), "dcid")
      .select(col("k_id").as("doc_id")).distinct()
      .localCheckpoint(true)
    val kept = gated.join(keptIds, Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val nDupDropped = nGated - kept.count()

    // ---- stage 3: split + two-sided decontamination ----
    val withSplit = kept
      .withColumn("bucket", DedupQueries.splitBucket)
      .withColumn("split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val")
          .otherwise("test"))
      .withColumn("gs", DedupQueries.gramHashes(8))
      .localCheckpoint(true)
    val bySplit = withSplit.groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val holdIdx = s.read.parquet(s"$idx/holdout_grams.parquet")
    val deltaHold = withSplit.where(col("bucket") >= 80)
      .select(explode(col("gs")).as("gh")).distinct()
    val newHold = deltaHold.join(holdIdx, Seq("gh"), "left_anti")
      .localCheckpoint(true)
    // delta train vs the UNION holdout (old index + new grams)
    val unionHold = holdIdx.unionAll(newHold)
    val dTrainGrams = withSplit.where(col("split") === "train")
      .select(col("doc_id"), size(col("gs")).as("n_grams"),
        explode(col("gs")).as("gh"))
    val dContam = dTrainGrams.join(unionHold, "gh")
      .groupBy("doc_id", "n_grams").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") * 5 >= col("n_grams"))
      .select("doc_id").localCheckpoint(true)
    val nContamDelta = dContam.count()
    // base train survivors vs the NEW holdout grams only (their shared
    // count against the old holdout is frozen in train_meta)
    val trainGrams = s.read.parquet(s"$idx/train_grams.parquet")
    val trainMeta = s.read.parquet(s"$idx/train_meta.parquet")
    val newShared = trainGrams.join(newHold, "gh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_new"))
      .localCheckpoint(true)
    val baseContam = trainMeta.join(newShared, "doc_id")
      .where((col("n_shared") + col("n_new")) * 5 >= col("n_grams"))
      .select("doc_id").localCheckpoint(true)
    val nContamBase = baseContam.count()

    // ---- stage 4: final-layout edits ----
    val finalDir = s"$outDir/final"
    // a replaced keeper may not be IN final (the base run could have
    // dropped it as contaminated train): removals are counted against
    // what the layout actually holds
    val finalIds = s.read.parquet(finalDir).select("doc_id")
    val removed = replacedBase.unionAll(baseContam).distinct()
      .join(finalIds, Seq("doc_id"), "left_semi").localCheckpoint(true)
    val nRemoved = removed.count()
    val nReplacedInFinal = removed.join(baseContam, Seq("doc_id"), "left_anti").count()
    if (nRemoved > 0) {
      // rewrite ONLY the (split, source) partitions holding removed
      // docs: locate them with a column-pruned scan, then dynamic-
      // partition-overwrite the remainder (delete outright if empty)
      val affected = s.read.parquet(finalDir)
        .join(removed, Seq("doc_id"), "left_semi")
        .select("split", "source").distinct().collect()
        .map(r => (r.getString(0), r.getString(1)))
      val affCond = affected.map { case (sp, so) =>
        col("split") === sp && col("source") === so
      }.reduce(_ || _)
      val slice = s.read.parquet(finalDir).where(affCond)
      val remainder = slice.join(removed, Seq("doc_id"), "left_anti")
        .select("doc_id", "text", "lang", "n_chars", "split", "source")
        .localCheckpoint(true) // sever lineage from the dir being rewritten
      remainder
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("split", "source")
        .parquet(finalDir)
      // dynamic overwrite leaves a partition untouched when the new
      // data has NO rows for it — an emptied partition must be deleted
      val left = remainder.select("split", "source").distinct().collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val conf = s.sparkContext.hadoopConfiguration
      affected.filterNot(left).foreach { case (sp, so) =>
        val p = new org.apache.hadoop.fs.Path(s"$finalDir/split=$sp/source=$so")
        p.getFileSystem(conf).delete(p, true)
      }
    }
    val appendRows = withSplit
      .join(dContam, Seq("doc_id"), "left_anti")
      .select("doc_id", "text", "lang", "n_chars", "split", "source")
      .localCheckpoint(true)
    val nAppended = appendRows.count()
    appendRows
      .repartition(col("split"), col("source"))
      .sortWithinPartitions("split", "source", "doc_id")
      .write.mode("append").partitionBy("split", "source").parquet(finalDir)
    // manifest: drop removed, add appended (guarded shard hash)
    val newManifest = s.read.parquet(s"$outDir/manifest.parquet")
      .join(removed, Seq("doc_id"), "left_anti")
      .unionAll(appendRows.select(col("doc_id"), col("split"), col("source"),
        col("n_chars"),
        (col("doc_id") % 1000003L * 2654435761L % 16).cast("int").as("shard")))
    replaceTable(s, newManifest, s"$outDir/manifest.parquet")

    // ---- stage 5: index updates (so the NEXT delta composes) ----
    // EVERY gated delta doc joins the matching corpus (stage1_clean
    // text + band index + cluster map), not just the kept ones: a
    // future delta doc may near-dup a DROPPED member of a cluster
    // without colliding with its keeper, and from-scratch semantics
    // route it through that member. The cluster map records each doc's
    // election winner (the base keeper it lost to, or the delta best).
    gated
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("append").parquet(s"$outDir/stage1_clean/documents.parquet")
    dBands.write.mode("append").parquet(s"$idx/bands.parquet")
    // two winning delta clusters matching the SAME base keeper: from-
    // scratch would merge them through that keeper's cluster (bridge
    // divergence (a)); the index stays deterministic by pointing the
    // keeper at the BEST of the winners
    val winners = election.where(col("delta_wins"))
      .join(matchedKeepers, "dcid")
      .groupBy(col("k_id").as("keeper_id"))
      .agg(max(struct(col("d_best_len"), (-col("d_best_id")).as("nd"))).as("b"))
      .select(col("keeper_id"), (-col("b.nd")).as("new_keeper_id"),
        col("b.d_best_len").as("new_keeper_len"))
    // losing delta clusters recorded keeper = the base keeper they lost
    // to; if THAT keeper was itself replaced by a winning cluster in
    // this same ingest, redirect through `winners` exactly like the
    // ccIdx rows below — otherwise a future delta electing against the
    // stale pointer compares with a doc no longer in the layout. (The
    // winner W that replaced keeper K satisfies W > K > losing-best in
    // the (len, -id) order, so the redirect preserves the election.)
    val deltaKeeper = dClusters.join(election, "dcid")
      .select(col("doc_id"), col("dcid").as("cluster_id"),
        when(col("delta_wins"), col("d_best_id")).otherwise(col("b_best_id"))
          .as("keeper_id"),
        when(col("delta_wins"), col("d_best_len")).otherwise(col("b_best_len"))
          .as("keeper_len"))
      .join(winners, Seq("keeper_id"), "left")
      .select(col("doc_id"), col("cluster_id"),
        coalesce(col("new_keeper_id"), col("keeper_id")).as("keeper_id"),
        coalesce(col("new_keeper_len"), col("keeper_len")).as("keeper_len"))
    val updatedCc = ccIdx.join(winners, Seq("keeper_id"), "left")
      .select(col("doc_id"), col("cluster_id"),
        coalesce(col("new_keeper_id"), col("keeper_id")).as("keeper_id"),
        coalesce(col("new_keeper_len"), col("keeper_len")).as("keeper_len"))
      .unionAll(deltaKeeper)
    replaceTable(s, updatedCc, s"$idx/cc.parquet")
    val newTrainDocs = withSplit.where(col("split") === "train")
      .join(dContam, Seq("doc_id"), "left_anti")
    // meta rewrite FIRST (its plan reads the pre-append train_grams via
    // newShared; appending before executing it would double-read), then
    // append the new postings
    val newTrainShared = newTrainDocs
      .select(col("doc_id"), explode(col("gs")).as("gh"))
      .join(unionHold, "gh")
      .groupBy("doc_id").agg(count(lit(1)).as("ns"))
    val updatedMeta = trainMeta
      .join(removed, Seq("doc_id"), "left_anti")
      .join(newShared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        (col("n_shared") + coalesce(col("n_new"), lit(0L))).as("n_shared"))
      .unionAll(newTrainDocs
        .select(col("doc_id"), size(col("gs")).as("n_grams"))
        .join(newTrainShared, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("ns"), lit(0L)).as("n_shared")))
    replaceTable(s, updatedMeta, s"$idx/train_meta.parquet")
    newTrainDocs
      .select(col("doc_id"), explode(col("gs")).as("gh"))
      .select("gh", "doc_id")
      .write.mode("append").parquet(s"$idx/train_grams.parquet")
    // holdout append LAST: unionHold's plan re-lists this file when the
    // meta rewrite executes — appending first would double-count
    newHold.write.mode("append").parquet(s"$idx/holdout_grams.parquet")

    DeltaReport(
      nDelta = nDelta,
      nQualityFail = nDelta - nGated,
      nDupDropped = nDupDropped,
      nReplacedBase = nReplacedInFinal,
      nTrain = bySplit.getOrElse("train", 0L),
      nVal = bySplit.getOrElse("val", 0L),
      nTest = bySplit.getOrElse("test", 0L),
      nContaminatedDelta = nContamDelta,
      nContaminatedBase = nContamBase,
      nAppended = nAppended,
      nRemoved = nRemoved)
  }
}
