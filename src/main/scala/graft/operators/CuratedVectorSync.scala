package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keep the curated corpus and its ANN index CONSISTENT under
  * incremental ingest — the composition of the two maintained indexes:
  *
  *   1. [[DeltaIngest.ingestKeyed]] curates the delta documents
  *      (dedup vs corpus and within batch, keeper replacement, split,
  *      two-sided decontamination) and commits its layout edits.
  *   2. The batch's own manifest increment (`manifest_log/seg=<n>`, an
  *      O(delta) table — live rows = docs the batch APPENDED, dead
  *      rows = base docs it REMOVED) drives the vector side: appended
  *      docs' embeddings are [[IvfMaintenance.ingestKeyed assigned]]
  *      into the IVF index, removed docs' vectors are
  *      [[IvfMaintenance.remove tombstoned]] out of it.
  *
  * So a near-dup that loses its election never pollutes the ANN index,
  * and a REPLACED base keeper (or a retro-decontaminated train doc)
  * stops serving as a neighbor the same ingest that dropped it from the
  * layout — the two indexes can't drift.
  *
  * Replay contract: the three sub-commits share the caller's batch key
  * (`<key>` on the doc side, `<key>-add` / `<key>-rm` on the vector
  * side) and each skips itself if already committed — a crash between
  * any two leaves a replay that finishes exactly the missing suffix.
  * The doc-side report is only available on the run that actually
  * ingested (staging is swept after commit), hence `docs:
  * Option[DeltaReport]`.
  *
  * Embedding convention: `deltaVecs` rows are (doc_id, embedding) —
  * vectors are keyed by the document they embed (vec_id == doc_id in
  * the index).
  */
object CuratedVectorSync {

  final case class SyncReport(
      docs: Option[DeltaIngest.DeltaReport], // None when replaying a committed doc batch
      nVecIngested: Long,
      nVecRemoved: Long,
      nVecMissing: Long = 0L, // appended docs the caller gave no vector for
      ivf: Option[IvfMaintenance.IngestReport] = None,
      nSearchIngested: Long = 0L,
      nSearchRemoved: Long = 0L,
      export: Option[(Long, TrainingExport.ExportReport)] = None,
      pq: Option[IvfMaintenance.PqHealth] = None, // None = not due / already checked
      epoch: Option[TrainingExport.EpochReport] = None, // Some = this delivery rotated the epoch
      superRebuilt: Boolean = false, // this delivery re-trained the hier coarse layer
      superMapped: Long = 0L) // cells incrementally mapped onto existing supers this delivery

  /** Shape of the optional training-export lockstep: the incremental
    * export's target dir + packing shape. The shape is FIXED per
    * export dir (exportIncremental refuses a mismatch) — a new epoch
    * is a new dir.
    *
    * With `epoch = Some(policy)`, `dir` becomes the EPOCH ROOT: the
    * live export dir is `dir/epoch=<k>` (k = highest present; the
    * first delivery creates epoch=0), each epoch k packs with seed
    * `seed + k` (a fresh permutation per re-pack, deterministic), and
    * [[EpochPolicy]] schedules [[TrainingExport.exportEpoch]]
    * rotations through the sync — retraction hygiene on a cadence, not
    * remembered. */
  final case class ExportCfg(dir: String, nShards: Int = 8,
      seqLen: Int = 64, seed: Long = 0L,
      epoch: Option[EpochPolicy] = None)

  /** When to rotate the export epoch. The pressure gauge is STALE
    * BYTES, measured from committed metadata only: the live epoch's
    * exported-doc total (per-generation manifest sums — docs never
    * leave an epoch's bytes) minus the layout's live train-doc count
    * (id-width manifest) = retracted-but-still-packed docs. Rotate
    * when it reaches `maxStale`. Deterministic in committed state, so
    * a redelivered batch reaches the same due/not-due decision — and
    * after a completed rotation reads pressure ≈ 0 and re-packs
    * nothing. `cadenceBatches` hash-thins the evaluation exactly like
    * [[PqCfg.cadenceBatches]] (the gauge costs one id-width manifest
    * count per due delivery). */
  final case class EpochPolicy(maxStale: Long, cadenceBatches: Int = 1)

  /** Maintenance cadence for the hierarchical coarse quantizer
    * ([[IvfMaintenance.buildSuper]]): cells born after the last super
    * build (ingest splits, fresh seeds) are ORPHANS every hier probe
    * hands to every query unpruned — exact but progressively less
    * pruned. Two-tier upkeep: (1) EVERY enabled delivery incrementally
    * maps uncovered cells onto their nearest EXISTING super
    * ([[IvfMaintenance.mapNewCellsToSuper]] — one argmin vs the
    * broadcast √nlist super table, O(new cells)), so orphans stay ≈ 0
    * at any ingest churn; (2) on the hash-thinned cadence, when the
    * incrementally-mapped share of live cells exceeds `maxOrphanFrac`,
    * the layer RE-TRAINS (full [[IvfMaintenance.buildSuper]], which
    * folds the deltas away) — the full rebuild is drift correction,
    * not a coverage necessity. The layer is always created on the
    * first enabled delivery (even off-cadence). Both gauges are
    * id-width and corpus-free, pure functions of committed state, so a
    * redelivered batch reaches the same decision — and the incremental
    * map is deterministic, so a replay writes nothing (zero uncovered
    * cells). buildSuper itself is deterministic and keyed to the
    * committed segment, so a crash mid-rebuild is healed by running
    * again. */
  final case class SuperCfg(maxOrphanFrac: Double = 0.1,
      nSuper: Option[Int] = None, cadenceBatches: Int = 1)

  /** Shape of the optional PQ drift-maintenance lockstep
    * ([[IvfMaintenance.maintainPq]] on the standing cadence, verdict-
    * style: measure compressed-vs-exact recall on `heldOut`; refresh
    * the codebook generation from `sample` when it degrades below
    * `minRecall`). `cadenceBatches` thins the check: 1 = every batch;
    * n > 1 selects batches by a DETERMINISTIC hash of the batch key
    * (≈ every nth batch, replay-stable — the same redelivered key
    * always reaches the same due/not-due decision, so a crash can
    * never dodge or double a scheduled check). The recall measurement
    * costs two cell-bounded serves of `heldOut` per due batch — size
    * the cadence to the batch rate, not to the corpus. */
  final case class PqCfg(heldOut: DataFrame, sample: DataFrame,
      minRecall: Double = 0.9, k: Int = 5, nprobe: Int = 1, m: Int = 8,
      cadenceBatches: Int = 1)

  // ---------------------------------------------------------------
  // epoch cadence (ExportCfg.epoch)
  // ---------------------------------------------------------------

  private def epochDirsPresent(s: SparkSession, root: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("epoch="))
      .flatMap(st => st.getPath.getName.stripPrefix("epoch=").toLongOption)
      .sorted
  }

  /** Every epoch packs with its own deterministic seed (`seed + k`):
    * a rotation IS the next permutation, reproducibly. */
  private def epochSeed(c: ExportCfg, k: Long): Long =
    if (c.epoch.isDefined) c.seed + k else c.seed

  /** Highest-present epoch dir — the metadata-only resolution health
    * snapshots use (no transition completion, no Spark job). */
  private def liveEpochDir(s: SparkSession, c: ExportCfg): String =
    c.epoch match {
      case None => c.dir
      case Some(_) =>
        val ks = epochDirsPresent(s, c.dir)
        if (ks.isEmpty) s"${c.dir}/epoch=0" else s"${c.dir}/epoch=${ks.last}"
    }

  /** The live export dir under an epoch policy (the cfg dir itself
    * without one). TWO epoch dirs present = a prior rotation crashed
    * between its audit and the old-dir GC: complete it FIRST — the
    * re-run re-reads the sealed gen-0 marker (no re-pack), re-audits,
    * and only then GCs the old dir — because draining new generations
    * into the fresh epoch before the transition settles would hit
    * exportEpoch's gen-0-only refusal on the next resume. */
  private def resolveEpoch(s: SparkSession, textOut: String,
      c: ExportCfg): (String, Long) = c.epoch match {
    case None => (c.dir, 0L)
    case Some(_) =>
      val ks = epochDirsPresent(s, c.dir)
      if (ks.isEmpty) (s"${c.dir}/epoch=0", 0L)
      else {
        if (ks.size >= 2) {
          val o = ks(ks.size - 2); val n = ks.last
          TrainingExport.exportEpoch(s, textOut, s"${c.dir}/epoch=$o",
            s"${c.dir}/epoch=$n", epochSeed(c, n), c.nShards, c.seqLen)
        }
        (s"${c.dir}/epoch=${ks.last}", ks.last)
      }
  }

  /** The stale-bytes gauge and the rotation it schedules. Pressure =
    * exported-doc total of the live epoch (docs never leave an epoch's
    * bytes) − live train docs (id-width manifest count) = retracted-
    * but-still-packed docs. Pure function of committed state plus the
    * hash-thinned cadence gate, so a redelivered key reaches the same
    * decision — and after a completed rotation reads ≈ 0 and re-packs
    * nothing. The rotation itself is [[TrainingExport.exportEpoch]]:
    * audit BEFORE GC, crash-convergent, its own matrix spec-pinned. */
  private def maybeRotateEpoch(s: SparkSession, textOut: String,
      c: ExportCfg, liveDir: String, k: Long,
      key: String): Option[TrainingExport.EpochReport] =
    c.epoch.flatMap { pol =>
      val due = pol.cadenceBatches <= 1 || math.floorMod(
        scala.util.hashing.MurmurHash3.stringHash(key), pol.cadenceBatches) == 0
      if (!due) None
      else {
        val packed = TrainingExport.health(s, liveDir).nDocs
        if (packed == 0L) None
        else {
          val live = DeltaIngest.readManifest(s, textOut)
            .where(col("split") === "train").count()
          if (packed - live < pol.maxStale) None
          else Some(TrainingExport.exportEpoch(s, textOut, liveDir,
            s"${c.dir}/epoch=${k + 1}", epochSeed(c, k + 1), c.nShards,
            c.seqLen))
        }
      }
    }

  /** Ingest one delta (documents + their embeddings) into a curated
    * run at `textOut` (indexed by [[DeltaIngest.buildIndex]]) and its
    * vector index at `ivfOut` (built by [[IvfMaintenance.build]]).
    * `searchOut`, when given, keeps a [[TextSearchIndex]] in the same
    * lockstep — appended docs' postings ingest, removed docs tombstone
    * — through two more skip-if-committed sub-commits (`<key>-sadd` /
    * `<key>-srm`), so ALL THREE serve surfaces (near-dup probe, vector
    * kNN, BM25) move atomically-per-batch with the layout.
    * `exportOut`, when given, drains [[TrainingExport.exportIncremental]]
    * after the batch commits — the FOURTH surface: training shards stay
    * current with the layout, coverage-driven (the manifest segments
    * themselves are the replay identity, so no extra key is needed; the
    * first enabled call brings the whole backlog current as one
    * generation, and a replayed batch exports nothing).
    * `pqOut`, when given, rides the same cadence for the FIFTH
    * maintenance concern: PQ recall drift ([[PqCfg]]) — the check's
    * replay identity is `<key>-pq` (a skip marker when healthy; the
    * refresh, when triggered, commits `<key>-pq-refresh` inside
    * maintainPq, so a redelivered batch re-reads `refreshed = true`
    * without retraining). `telemetry`, when given, receives one
    * corpus-free health snapshot per enabled surface after every
    * delivery (`ivf_health` / `search_health` / `export_health` — the
    * D5 parity for the serve layer), so the maintenance cadences are
    * observable the way queue batches are. */
  def ingest(s: SparkSession, deltaDocs: DataFrame, deltaVecs: DataFrame,
      textOut: String, ivfOut: String, key: String,
      searchOut: Option[String] = None,
      exportOut: Option[ExportCfg] = None,
      pqOut: Option[PqCfg] = None,
      telemetry: Option[graft.metrics.EventHandler] = None,
      superOut: Option[SuperCfg] = None): SyncReport = {
    // hier-layer refresh ([[SuperCfg]]): evaluated after the vector
    // commits on every delivery path (fresh or replay) — the gauge is
    // corpus-free and the rebuild deterministic, so no replay key is
    // needed; a crashed rebuild is finished by the next evaluation
    def maintainSuper(): (Boolean, Long) = superOut.map { c =>
      // missing-layer check BEFORE the cadence gate: the SuperCfg
      // contract is "created on the first ENABLED delivery" — with
      // cadenceBatches > 1 a not-due first key must still create the
      // layer, or sprobe-serving throws until some later due delivery
      IvfMaintenance.superOrphans(s, ivfOut) match {
        case None =>
          IvfMaintenance.buildSuper(s, ivfOut, c.nSuper); (true, 0L)
        case Some(orphans) =>
          // incremental upkeep EVERY delivery, before any cadence:
          // cells born since the layer (ingest splits, fresh seeds)
          // argmin onto the EXISTING supers — O(new cells), so the
          // serve-side orphan fan-out stays ≈ 0 at any ingest churn
          // instead of growing until the next full rebuild
          val mapped =
            if (orphans == 0L) 0L
            else IvfMaintenance.mapNewCellsToSuper(s, ivfOut)
          // drift correction on the cadence: incrementally-mapped
          // cells joined supers never retrained around them — when
          // their share of the live cells passes the threshold, the
          // full rebuild re-trains the layer (and clears the deltas)
          val due = c.cadenceBatches <= 1 || math.floorMod(
            scala.util.hashing.MurmurHash3.stringHash(key), c.cadenceBatches) == 0
          if (!due) (false, mapped)
          else {
            val nDelta = IvfMaintenance.superMappedCells(s, ivfOut)
            if (nDelta == 0L) (false, mapped)
            else {
              val nCells = IvfMaintenance.centroids(s, ivfOut).count()
              if (nDelta.toDouble / nCells < c.maxOrphanFrac) (false, mapped)
              else { IvfMaintenance.buildSuper(s, ivfOut, c.nSuper); (true, mapped) }
            }
          }
      }
    }.getOrElse((false, 0L))
    // drain to EMPTY, not one call: exportIncremental commits ONE
    // generation per call, and its crash-resume path spends its call
    // re-committing a sealed-but-unmarked generation — a single call
    // after such a crash would leave THIS batch's manifest segment
    // uncovered until the next delivery. The loop runs until every
    // committed segment is covered (the common case is one generation +
    // one metadata-only no-op probe); reported: the LAST generation
    // this drain committed — the one carrying the current batch.
    // Under an epoch policy the drain first resolves (and, if a prior
    // rotation crashed between audit and GC, COMPLETES) the live
    // epoch, drains into it, then evaluates the rotation trigger.
    def drainExport(): (Option[(Long, TrainingExport.ExportReport)],
        Option[TrainingExport.EpochReport]) =
      exportOut match {
        case None => (None, None)
        case Some(c) =>
          val (dir, k) = resolveEpoch(s, textOut, c)
          val seed = epochSeed(c, k)
          var last: Option[(Long, TrainingExport.ExportReport)] = None
          var cur = TrainingExport.exportIncremental(
            s, textOut, dir, c.nShards, c.seqLen, seed)
          while (cur.isDefined) {
            last = cur
            cur = TrainingExport.exportIncremental(
              s, textOut, dir, c.nShards, c.seqLen, seed)
          }
          (last, maybeRotateEpoch(s, textOut, c, dir, k, key))
      }
    // The PQ drift check, keyed `<key>-pq`. `keys` is the ivf marker
    // set loaded at delivery start: a healthy check committed a skip
    // marker under that key, so a redelivery is metadata-only; a
    // TRIGGERED refresh deliberately commits no skip — maintainPq's
    // own `<key>-pq-refresh` guard makes the redelivery re-measure and
    // report `refreshed = true` (the accounting-visible truth) without
    // retraining. A crash between the vector commits and this check is
    // healed on redelivery the same way the merge heal works: due-ness
    // is a pure function of the key, so the replay reaches the same
    // decision.
    def runPqMaintenance(keys: Set[String]): Option[IvfMaintenance.PqHealth] =
      pqOut.flatMap { c =>
        val pqKey = s"$key-pq"
        val due = c.cadenceBatches <= 1 || math.floorMod(
          scala.util.hashing.MurmurHash3.stringHash(key), c.cadenceBatches) == 0
        if (!due || keys.contains(pqKey)) None
        else {
          require(IvfMaintenance.pqEnabled(s, ivfOut),
            s"pqOut requires buildPq to have completed for $ivfOut")
          val h = IvfMaintenance.maintainPq(s, ivfOut, c.heldOut, c.sample,
            c.minRecall, c.k, c.nprobe, c.m, key = pqKey)
          if (!h.refreshed) IvfMaintenance.commitSkip(s, ivfOut, pqKey)
          Some(h)
        }
      }
    // one corpus-free snapshot per enabled surface, after the delivery
    // settles — reads the published centroid/stats tables and manifest
    // metadata only, never corpus bytes
    def emitHealth(): Unit = telemetry.foreach { h =>
      val ih = IvfMaintenance.health(s, ivfOut)
      h.handle("ivf_health", ivfOut, Map(
        "nCells" -> ih.nCells.toDouble, "nVectors" -> ih.nVectors.toDouble,
        "minOcc" -> ih.minOcc.toDouble, "maxOcc" -> ih.maxOcc.toDouble,
        "nSplitFlagged" -> ih.nSplitFlagged.toDouble,
        "nMergeFlagged" -> ih.nMergeFlagged.toDouble,
        "nSegments" -> ih.nSegments.toDouble,
        "pq" -> (if (ih.pq) 1.0 else 0.0)) ++
        IvfMaintenance.superOrphans(s, ivfOut)
          .map(o => Map(
            "superOrphans" -> o.toDouble,
            // drift pressure: share of live cells mapped onto supers
            // that were never retrained around them (see SuperCfg)
            "superMappedCells" ->
              IvfMaintenance.superMappedCells(s, ivfOut).toDouble))
          .getOrElse(Map.empty))
      searchOut.foreach { so =>
        val sh = TextSearchIndex.health(s, so)
        h.handle("search_health", so, Map(
          "nDocs" -> sh.nDocs.toDouble, "sumDl" -> sh.sumDl.toDouble,
          "nSegments" -> sh.nSegments.toDouble))
      }
      exportOut.foreach { c =>
        val eh = TrainingExport.health(s, liveEpochDir(s, c))
        // the rotation-pressure gauge, surfaced per delivery: packed
        // docs of the live epoch (docs never leave an epoch's bytes) −
        // live train docs (id-width manifest count) = retracted-but-
        // still-packed docs. Without it an operator could only observe
        // pressure by triggering maybeRotateEpoch's own check; clamped
        // at 0 (an enabled-but-undrained lockstep reads live > packed)
        val liveTrain = DeltaIngest.readManifest(s, textOut)
          .where(col("split") === "train").count()
        val epochK = c.epoch.map(_ =>
          epochDirsPresent(s, c.dir).lastOption.getOrElse(0L)).getOrElse(0L)
        h.handle("export_health", c.dir, Map(
          "nGenerations" -> eh.nGenerations.toDouble,
          "nCoveredSegs" -> eh.nCoveredSegs.toDouble,
          "nDocs" -> eh.nDocs.toDouble, "nSeqs" -> eh.nSeqs.toDouble,
          "nTokens" -> eh.nTokens.toDouble,
          "epoch" -> epochK.toDouble,
          "staleDocs" -> math.max(0L, eh.nDocs - liveTrain).toDouble))
      }
    }
    // ---- doc side (skip-if-committed carries the replay) ----
    val docReport = DeltaIngest.committedSegOf(s, textOut, key) match {
      case Some(_) => None
      case None => Some(DeltaIngest.ingestKeyed(s, deltaDocs, textOut, key))
    }
    val seg = DeltaIngest.committedSegOf(s, textOut, key)
      .getOrElse(sys.error(s"doc ingest for $key did not commit"))
    // a FULLY-synced batch replays to a no-op before the manifest
    // increment is ever consulted — a redelivery arriving after
    // compaction folded the increment away must not error
    val addKey = s"$key-add"; val rmKey = s"$key-rm"
    val sAddKey = s"$key-sadd"; val sRmKey = s"$key-srm"
    val ivfKeys = IvfMaintenance.committedKeys(s, ivfOut)
    // lazy: on a FRESH batch the ivf-keys check already fails, and the
    // search marker dir (one FS open per marker) must not be read for
    // nothing on every delivery
    lazy val searchDone = searchOut.forall { so =>
      val sk = TextSearchIndex.committedKeys(s, so)
      sk.contains(sAddKey) && sk.contains(sRmKey)
    }
    if (ivfKeys.contains(addKey) && ivfKeys.contains(rmKey) && searchDone) {
      // heal the one commit this early return would otherwise skip: the
      // occupancy maintenance riding the remove (its DERIVED key) can
      // crash after the remove committed — without this it would wait
      // for the next removal batch instead of this replay. The already-
      // loaded key set guards it, so a routine redelivery of a fully-
      // synced batch stays metadata-only (no Spark job).
      if (!ivfKeys.contains(s"$rmKey-merge"))
        IvfMaintenance.mergeUnderfull(s, ivfOut, s"$rmKey-merge")
      // the export drain is coverage-driven: a fully-synced replay has
      // nothing uncovered (a few FS reads), a crashed export resumes;
      // the PQ check heals the same way (skip-marker-guarded)
      val (exp, ep) = drainExport()
      val (sRebuilt, sMapped) = maintainSuper()
      val rep = SyncReport(docReport, 0L, 0L, export = exp,
        pq = runPqMaintenance(ivfKeys), epoch = ep,
        superRebuilt = sRebuilt, superMapped = sMapped)
      emitHealth()
      return rep
    }
    // the batch's OWN manifest increment: O(delta) rows, no fold
    // needed. Explicit schema: a batch that appended and removed
    // nothing leaves a part-less segment dir, which would fail schema
    // inference on a bare read. The increment survives until
    // DeltaIngest.compact folds the manifest log — a PARTIAL vector
    // sync must replay before ~CompactAfterSegments further doc
    // ingests, or the remaining edit list is gone (diagnosed here,
    // not as a read error)
    val segDir = s"$textOut/manifest_log/seg=$seg"
    // name the side(s) actually missing: a crash can leave the vector
    // commits done and only the search side pending — "rebuild the
    // vector index" would then fix nothing
    def pendingSides: String = {
      val v = if (ivfKeys.contains(addKey) && ivfKeys.contains(rmKey)) Nil
        else Seq("vector")
      val t = if (searchDone) Nil else Seq("search")
      (v ++ t).mkString("+")
    }
    require(CurationRun.exists(s, segDir),
      s"manifest increment for batch $key (seg=$seg) was compacted away " +
        s"before its $pendingSides sync completed; the index edits for " +
        "this batch cannot be recovered - rebuild that index from the layout")
    val manifestInc =
      s.read.schema("doc_id LONG, dead BOOLEAN")
        .parquet(segDir)
        .localCheckpoint(true)

    // ---- vector side: appended docs assign, removed docs tombstone ----
    val appendedIds = manifestInc.where(!col("dead"))
      .select(col("doc_id").as("vec_id"))
    val vecs = deltaVecs
      .where(col("embedding").isNotNull)
      .select(col("doc_id").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .join(appendedIds, Seq("vec_id"), "left_semi")
    // surfaced, not silent: appended docs the caller gave no vector for
    // are exactly the layout-index drift this operator exists to prevent
    val nVecMissing = appendedIds
      .join(vecs.select("vec_id"), Seq("vec_id"), "left_anti").count()
    val ivfReport =
      if (ivfKeys.contains(addKey)) None
      else if (vecs.isEmpty) { // commit the identity without a segment
        IvfMaintenance.commitSkip(s, ivfOut, addKey); None
      } else Some(IvfMaintenance.ingestKeyed(s, vecs, ivfOut, addKey))
    val removedIds = manifestInc.where(col("dead"))
      .select(col("doc_id").as("vec_id"))
    val nRemoved = IvfMaintenance.remove(s, removedIds, ivfOut, rmKey)
    // ---- search side: appended docs' postings in, removed docs out.
    // Text comes from the batch input itself (appends are always a
    // subset of the delta, and the layout stores the same text) ----
    val (nSIn, nSRm) = searchOut.map { so =>
      val appendedDocs = deltaDocs.select("doc_id", "text")
        .join(manifestInc.where(!col("dead")).select("doc_id"),
          Seq("doc_id"), "left_semi")
      (TextSearchIndex.ingest(s, appendedDocs, so, sAddKey),
        TextSearchIndex.remove(s,
          manifestInc.where(col("dead")).select("doc_id"), so, sRmKey))
    }.getOrElse((0L, 0L))
    val (exp, ep) = drainExport()
    val (sRebuilt, sMapped) = maintainSuper()
    val rep = SyncReport(docReport,
      nVecIngested = ivfReport.map(_.nDelta).getOrElse(0L),
      nVecRemoved = nRemoved,
      nVecMissing = nVecMissing,
      ivf = ivfReport,
      nSearchIngested = nSIn,
      nSearchRemoved = nSRm,
      export = exp,
      pq = runPqMaintenance(ivfKeys),
      epoch = ep,
      superRebuilt = sRebuilt, superMapped = sMapped)
    emitHealth()
    rep
  }

  // ---------------------------------------------------------------
  // streaming composition
  // ---------------------------------------------------------------

  /** Streaming front door for the composition: a drop directory of
    * parquet files carrying documents WITH their embeddings
    * (TextIngest's raw schema + an `embedding` array column) becomes
    * per-micro-batch [[ingest]] calls. Replay safety is the sync's own
    * batch-keyed contract — each of the three sub-commits skips itself,
    * so a redelivered batch (or a crash anywhere in the chain) replays
    * exactly the missing suffix. */
  def streamInto(
      spark: SparkSession,
      inDir: String,
      textOut: String,
      ivfOut: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 8,
      searchOut: Option[String] = None,
      exportOut: Option[ExportCfg] = None,
      pqOut: Option[PqCfg] = None,
      telemetry: Option[graft.metrics.EventHandler] = None,
      superOut: Option[SuperCfg] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val schema = graft.sources.TextIngest.rawSchema
      .add("embedding", ArrayType(DoubleType))
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestDropBatch(spark, batch, batchId, textOut, ivfOut, searchOut,
          exportOut, pqOut, telemetry, superOut); ()
      }
      .start()
  }

  /** One micro-batch of [[streamInto]]. Package-visible so the replay
    * contract is spec-testable without crashing a stream. */
  private[graft] def ingestDropBatch(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      textOut: String,
      ivfOut: String,
      searchOut: Option[String] = None,
      exportOut: Option[ExportCfg] = None,
      pqOut: Option[PqCfg] = None,
      telemetry: Option[graft.metrics.EventHandler] = None,
      superOut: Option[SuperCfg] = None): Option[SyncReport] = {
    val docs = graft.sources.TextIngest.normalize(
      batch.drop("embedding")
        .withColumn("_corrupt_record", lit(null).cast("string")))
    // an empty drop is a no-op with no marker: a replay re-skips
    // identically, and no segment or key is consumed
    if (docs.isEmpty) return None
    Some(ingest(spark, docs,
      batch.select(col("doc_id"), col("embedding"))
        .where(col("embedding").isNotNull),
      textOut, ivfOut, s"batch-$batchId", searchOut, exportOut, pqOut,
      telemetry, superOut))
  }
}
