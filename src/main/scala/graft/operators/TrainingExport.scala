package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The curate → train last mile: turn a curated layout's live TRAIN
  * slice into deterministic, reproducibly-shuffled, fixed-length
  * token-packed training shards — the file set a pretraining loader
  * actually mmaps. Composes the registry's oracle-checked recipes
  * verbatim:
  *
  *   1. epoch shuffle (t_shard_shuffle): a seeded multiplicative hash
  *      gives every doc a pseudo-random key `k`; docs route to
  *      shard = k % nShards and are laid down within a shard in
  *      (k, doc_id) order. Re-exporting with a new `seed` IS the next
  *      epoch's permutation; the same seed reproduces bytes.
  *   2. sequence packing (t_seq_pack / t_seq_pack_pieces): each
  *      shard's token stream is concatenated in write order and cut
  *      into `seqLen`-token sequences; a doc spanning a boundary
  *      contributes a piece to each sequence it crosses — prefix-sum
  *      arithmetic, no token is dropped or duplicated.
  *
  * Scale shape: ONE hash-partition shuffle routes docs (uniform — the
  * key is a multiplicative hash, so no skew), the prefix sum is
  * windowed PER SHARD (shard count scales with the corpus: pick
  * nShards so a shard is one output file's worth), and the only
  * token-weight exchange is the (shard, seq_id)-keyed piece regroup —
  * the unavoidable one, it produces the product. Nothing global-sorts
  * and nothing collects tokens to the driver.
  *
  * Commit protocol (the CurationRun stage pattern): shards land under
  * `exportDir/shards/shard=<k>/`, then the per-shard manifest —
  * written LAST — seals the export; its `_SUCCESS` is the marker. A
  * completed export replays as a metadata-only no-op (the report is
  * re-read from the manifest); a crash before the manifest re-runs the
  * overwrite from the same deterministic inputs, converging to
  * identical bytes.
  *
  * Reference scope note: the reference system (a job-queue engine) has
  * no training-export analog; this operator exists for the
  * 100 TB-training-pipeline mandate, composing with [[CurationRun]] /
  * [[DeltaIngest]] layouts. Registry twin under the DuckDB oracle:
  * t_export_manifest (the shard-manifest arithmetic on the raw
  * documents table).
  */
object TrainingExport {

  final case class ExportReport(
      nDocs: Long,
      nTokens: Long,
      nSeqs: Long,
      nShards: Int,
      seqLen: Int,
      seed: Long)

  private def shardsDir(exportDir: String) = s"$exportDir/shards"
  private def manifestDir(exportDir: String) = s"$exportDir/export_manifest.parquet"

  /** The t_shard_shuffle key, seeded: BOTH operands pre-reduce mod
    * 1000003 before the add and the Knuth multiply, so every
    * intermediate stays far under 2^63 for any doc_id/seed pair —
    * Spark 4 runs ANSI by default and a raw `doc_id + seed` would
    * throw on a huge seed rather than wrap. seed=0 reproduces the
    * registry key exactly (doc_id % 1000003 is unchanged by the
    * guard). */
  private def shuffleKey(seed: Long) = {
    val seedMod = ((seed % 1000003L) + 1000003L) % 1000003L
    pmod(pmod(col("doc_id"), lit(1000003L)) + lit(seedMod), lit(1000003L)) *
      2654435761L % 1048573L
  }

  /** Export the layout's live train docs ([[DeltaIngest.readFinal]] —
    * the base `final/` table plus the committed edit log, with the
    * split=train predicate pruning the partitioned base so val/test
    * text is never read) as packed shards. Idempotent per exportDir: a sealed
    * export returns its report without touching data — and REFUSES a
    * replay with a different shape (a silently-returned seed-0 report
    * would let a caller train a "new epoch" on last epoch's bytes). */
  def export(s: SparkSession, outDir: String, exportDir: String,
      nShards: Int = 8, seqLen: Int = 64, seed: Long = 0L): ExportReport = {
    require(nShards > 0 && seqLen > 0, s"bad shape: $nShards shards × $seqLen")
    if (CurationRun.exists(s, s"${manifestDir(exportDir)}/_SUCCESS")) {
      val rep = readReport(s, exportDir)
      require(rep.nShards == nShards && rep.seqLen == seqLen && rep.seed == seed,
        s"$exportDir is sealed with shape (nShards=${rep.nShards}, " +
          s"seqLen=${rep.seqLen}, seed=${rep.seed}); requested " +
          s"($nShards, $seqLen, $seed) — export each epoch to its own dir")
      return rep
    }
    val docs = DeltaIngest.readFinal(s, outDir)
      .where(col("split") === "train")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    exportDocs(s, docs, exportDir, nShards, seqLen, seed)
  }

  /** The export pipeline over an arbitrary (doc_id, ws: array<string>)
    * frame — [[export]] binds it to a curated layout's train slice. */
  private[graft] def exportDocs(s: SparkSession, docsWs: DataFrame,
      exportDir: String, nShards: Int, seqLen: Int, seed: Long): ExportReport = {
    val L = seqLen.toLong
    // ONE materialization of the keyed slice: the shard write, the
    // per-shard doc counts, and the emptiness probe all read this
    // frame — without it each consumer re-scans the train text, and a
    // concurrent layout edit between the shard write and the manifest
    // would seal doc counts the shards never saw
    val keyed = docsWs
      .select(col("doc_id"), col("ws"), shuffleKey(seed).as("k"))
      .withColumn("shard", pmod(col("k"), lit(nShards.toLong)).cast("int"))
      .withColumn("n_tok", size(col("ws")).cast("long"))
      .where(col("n_tok") > 0)
      .localCheckpoint(true)
    // every shard gets a manifest row (zero-filled when empty): the
    // loader can tell "legitimately empty" from "missing", and an
    // empty export's replayed report still carries the sealed shape
    val allShards = s.range(nShards).select(col("id").cast("int").as("shard"))
    if (keyed.head(1).isEmpty) {
      // empty train slice: CLEAR any stale shards from a crashed prior
      // attempt (the non-empty path overwrites them; this path must not
      // leave them under a now-valid seal), then seal zero rows
      val p = new org.apache.hadoop.fs.Path(shardsDir(exportDir))
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      sealManifest(s, allShards
        .select(col("shard"), lit(0L).as("n_docs"), lit(0L).as("n_seqs"),
          lit(0L).as("n_tokens"), lit(0L).as("checksum")),
        exportDir, nShards, seqLen, seed)
      return readReport(s, exportDir)
    }
    val w = Window.partitionBy("shard").orderBy(col("k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one row per (sequence, doc piece): the t_seq_pack_pieces fan-out
    // (boundary docs only), each piece carrying its token slice
    val pieces = keyed
      .withColumn("cum", sum("n_tok").over(w))
      .withColumn("st", col("cum") - col("n_tok"))
      .select(col("shard"), col("ws"), col("st"), col("n_tok"),
        explode(expr(s"sequence(st div $L, (cum - 1) div $L)")).as("seq_id"))
      .select(col("shard"), col("seq_id"),
        (greatest(col("st"), col("seq_id") * L) - col("seq_id") * L)
          .as("seq_off"),
        slice(col("ws"),
          (greatest(col("st"), col("seq_id") * L) - col("st") + 1).cast("int"),
          (least((col("seq_id") + 1) * L, col("st") + col("n_tok")) -
            greatest(col("st"), col("seq_id") * L)).cast("int")).as("toks"))
    // regroup pieces into whole sequences: collect, order by in-seq
    // offset (array_sort on the struct — seq_off leads), flatten
    val seqs = pieces
      .groupBy("shard", "seq_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("seq_off"), col("toks")))),
        p => p.getField("toks"))).as("tokens"))
      .select(col("shard"), col("seq_id"),
        size(col("tokens")).cast("long").as("n_tokens"), col("tokens"))
    seqs.repartition(col("shard")).sortWithinPartitions("shard", "seq_id")
      .write.mode("overwrite").partitionBy("shard")
      .parquet(shardsDir(exportDir))
    // manifest LAST — the seal. Sequence counts come from the WRITTEN
    // shards (re-read, not the pre-write plan) and doc counts from the
    // checkpointed slice the shards were packed from, so the manifest
    // certifies exactly what is on disk; checksum is order-free (an
    // XOR fold — closed on int64, so no ANSI overflow at any corpus
    // size) over per-sequence content hashes.
    val written = s.read.parquet(shardsDir(exportDir))
    val perDoc = keyed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"))
    sealManifest(s, allShards
      .join(written.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_seqs"), sum("n_tokens").as("n_tokens"),
          bit_xor(xxhash64(concat_ws(" ", col("tokens")))).as("checksum")),
        Seq("shard"), "left")
      .join(perDoc, Seq("shard"), "left")
      .select(col("shard"), coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_seqs"), lit(0L)).as("n_seqs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("checksum"), lit(0L)).as("checksum")),
      exportDir, nShards, seqLen, seed)
    readReport(s, exportDir)
  }

  private def sealManifest(s: SparkSession, perShard: DataFrame,
      exportDir: String, nShards: Int, seqLen: Int, seed: Long): Unit =
    perShard
      .select(col("shard"), col("n_docs"), col("n_seqs"), col("n_tokens"),
        col("checksum"), lit(nShards).as("n_shards"),
        lit(seqLen).as("seq_len"), lit(seed).as("seed"))
      .coalesce(1).write.mode("overwrite").parquet(manifestDir(exportDir))

  /** Per-shard manifest of a sealed export. */
  def readManifest(s: SparkSession, exportDir: String): DataFrame =
    s.read.parquet(manifestDir(exportDir))

  /** Audit a sealed export against its own manifest: recompute each
    * shard's sequence/token counts and XOR content checksum from the
    * bytes on disk and flag any divergence — the operational check for
    * partial loss, truncation, or corruption between export and
    * training. One scan of the shards, nShards output rows; a shard
    * present in only one side (lost dir / stray extra) fails its row.
    * Output: (shard, ok, n_seqs, n_tokens, checksum,
    * actual_n_seqs, actual_n_tokens, actual_checksum). */
  def verify(s: SparkSession, exportDir: String): DataFrame = {
    val man = readManifest(s, exportDir)
      .select(col("shard"), col("n_seqs"), col("n_tokens"), col("checksum"))
    val actual =
      if (!CurationRun.exists(s, shardsDir(exportDir)))
        // no shards directory: legitimate for an all-empty export, a
        // failure for any manifest row with n_seqs > 0 — substituting
        // the empty frame makes each such row fail CLEANLY (ok=false)
        // instead of throwing path-not-found on the whole audit
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("shard",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("a_seqs",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("a_tokens",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("a_checksum",
              org.apache.spark.sql.types.LongType))))
      else s.read.parquet(shardsDir(exportDir))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("a_seqs"), sum("n_tokens").as("a_tokens"),
          bit_xor(xxhash64(concat_ws(" ", col("tokens")))).as("a_checksum"))
    man.join(actual, Seq("shard"), "full_outer")
      .select(col("shard"),
        (coalesce(col("n_seqs"), lit(-1L)) === coalesce(col("a_seqs"), lit(0L)) &&
          coalesce(col("n_tokens"), lit(-1L)) === coalesce(col("a_tokens"), lit(0L)) &&
          coalesce(col("checksum"), lit(-1L)) === coalesce(col("a_checksum"), lit(0L)))
          .as("ok"),
        col("n_seqs"), col("n_tokens"), col("checksum"),
        col("a_seqs").as("actual_n_seqs"), col("a_tokens").as("actual_n_tokens"),
        col("a_checksum").as("actual_checksum"))
  }

  // ---------------------------------------------------------------
  // incremental export (generation-append)
  // ---------------------------------------------------------------
  //
  // A full [[export]] re-packs the whole train slice — at 100 TB, the
  // curate → train loop cannot afford that per delta. The incremental
  // form appends GENERATIONS: each call packs exactly the train docs
  // the layout's manifest increments appended since the last call into
  // `exportDir/gen=<g>/` (a standard export dir: shards + sealed
  // manifest), and records which DeltaIngest manifest segments the
  // generation covered in a `gen-<g>` marker. The loader reads all
  // committed generations; every generation is individually
  // deterministic (same doc-keyed shuffle hash, same seed), so a
  // crashed call converges to identical bytes.
  //
  // Two documented tradeoffs of O(delta) export:
  //   - boundary waste: each generation's final sequence per shard may
  //     be short — O(generations × shards) short sequences, repacked
  //     away by the next full-epoch export (a new seed into a fresh
  //     dir, which is the epoch cadence anyway);
  //   - shipped shards are immutable: a doc REMOVED from the layout
  //     after its generation sealed stays in that generation until the
  //     next epoch re-export — retraction from training data already
  //     shipped is an epoch-level operation ([[exportEpoch]] is that
  //     operation: re-pack, audit, THEN GC the superseded dir).
  //
  // Crash protocol: `_covered` (the seg list) is staged into the gen
  // dir BEFORE packing; the gen's manifest seals the bytes; the
  // `gen-<g>` marker lands LAST and admits the generation. A crash
  // between seal and marker replays: the next call re-derives the same
  // gen number, sees the sealed dir, re-commits the marker from
  // `_covered` (NOT from a fresh seg listing — later ingests may have
  // landed since, and marking them covered would silently drop their
  // docs), and leaves genuinely-new segments to the following call.

  private def genDir(exportDir: String, gen: Long) = s"$exportDir/gen=$gen"
  private def genMarkerDir(exportDir: String) = s"$exportDir/export_markers"

  private def hfs(s: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  // atomic (tmp + checked rename) — a crash mid-write of a generation
  // marker must never admit a generation with truncated coverage: the
  // next call would re-export its segments as a new generation and the
  // loader would train on those docs twice, with no error anywhere
  private def writeSmallFile(s: SparkSession, path: String, content: String): Unit =
    SegmentLog.writeSmallFile(s, path, content)

  private def readSmallFile(s: SparkSession, path: String): String =
    SegmentLog.readSmallFile(s, path)

  /** Committed generations → the manifest segments each covers. */
  private[graft] def genMarkers(s: SparkSession, exportDir: String): Map[Long, Set[Long]] = {
    val root = new org.apache.hadoop.fs.Path(genMarkerDir(exportDir))
    val f = hfs(s, root)
    if (!f.exists(root)) Map.empty
    else f.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName.stripPrefix("gen-").toLongOption.map { g =>
        g -> readSmallFile(s, st.getPath.toString)
          .split(',').flatMap(_.trim.toLongOption).toSet
      }
    }.toMap
  }

  /** Export the train docs appended by manifest segments not yet
    * covered by any committed generation — ONE generation per call
    * (crash resume finishes a sealed-but-unmarked generation first);
    * call again until None to drain. Returns the generation number and
    * its report, or None when every committed segment is covered. */
  def exportIncremental(s: SparkSession, outDir: String, exportDir: String,
      nShards: Int = 8, seqLen: Int = 64, seed: Long = 0L)
      : Option[(Long, ExportReport)] = {
    require(nShards > 0 && seqLen > 0, s"bad shape: $nShards shards × $seqLen")
    val markers = genMarkers(s, exportDir)
    // shape consistency across generations: a mixed-shape export dir
    // is refusal territory, same as a mismatched sealed replay
    markers.keys.maxOption.foreach { g =>
      val r = readReport(s, genDir(exportDir, g))
      require(r.nShards == nShards && r.seqLen == seqLen && r.seed == seed,
        s"$exportDir generations have shape (${r.nShards}, ${r.seqLen}, " +
          s"${r.seed}); requested ($nShards, $seqLen, $seed) — start a new " +
          "epoch dir to change shape")
    }
    val covered = markers.values.flatten.toSet
    val gen = markers.keys.maxOption.map(_ + 1).getOrElse(0L)
    val dir = genDir(exportDir, gen)
    // crash resume: a sealed generation without its marker re-commits
    // from ITS OWN staged coverage record
    if (CurationRun.exists(s, s"${manifestDir(dir)}/_SUCCESS") &&
        CurationRun.exists(s, s"$dir/_covered")) {
      val segs = readSmallFile(s, s"$dir/_covered")
        .split(',').flatMap(_.trim.toLongOption).toSeq
      val rep = readReport(s, dir)
      require(rep.nShards == nShards && rep.seqLen == seqLen && rep.seed == seed,
        s"sealed generation $gen has a different shape than requested")
      writeSmallFile(s, s"${genMarkerDir(exportDir)}/gen-$gen",
        segs.sorted.mkString(","))
      return Some((gen, rep))
    }
    val committed = DeltaIngest.committedSegs(s, outDir)
    val newSegs = (committed -- covered).toSeq.sorted
    if (newSegs.isEmpty) return None
    // the uncovered increments must still exist: DeltaIngest.compact
    // folds the manifest log away, so an export lagging past the
    // compaction cadence is diagnosed, not silently emptied
    for (n <- newSegs if n != 0L)
      require(CurationRun.exists(s, s"$outDir/manifest_log/seg=$n"),
        s"manifest increment seg=$n was compacted away before its export " +
          "generation sealed; run a full epoch export instead")
    val appended = newSegs.map {
      case 0L => s.read.parquet(s"$outDir/manifest.parquet")
        .select("doc_id", "split")
      case n => s.read.schema("doc_id LONG, split STRING, dead BOOLEAN")
        .parquet(s"$outDir/manifest_log/seg=$n")
        .where(!col("dead")).select("doc_id", "split")
    }.reduce(_ unionAll _)
      .where(col("split") === "train").select("doc_id").distinct()
    // text from the LIVE layout (partition-pruned to split=train): a
    // doc appended in these segs but since removed or re-split is
    // absent from final/train and exports nothing
    val docs = DeltaIngest.readFinal(s, outDir)
      .where(col("split") === "train")
      .join(appended, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    writeSmallFile(s, s"$dir/_covered", newSegs.sorted.mkString(","))
    val rep = exportDocs(s, docs, dir, nShards, seqLen, seed)
    writeSmallFile(s, s"${genMarkerDir(exportDir)}/gen-$gen",
      newSegs.sorted.mkString(","))
    Some((gen, rep))
  }

  final case class EpochReport(
      report: ExportReport, // the new epoch's gen 0 (the full live slice)
      nCoveredSegs: Long, // manifest segments gen 0 marks covered
      oldDirRemoved: Boolean) // false when there was nothing to GC

  /** The epoch cadence — the RETRACTION operation the per-delta
    * generations deliberately defer: re-pack the layout's CURRENT live
    * train slice into a fresh incremental export dir (gen 0, new
    * `seed` = the new epoch's permutation), audit every shard of the
    * new epoch against its manifests, and only after that audit passes
    * GC the superseded dir — a doc removed from the layout since it
    * shipped exists in no post-epoch byte, and a failed audit leaves
    * the old epoch serving untouched (never a window with no intact
    * export). The new dir is a standard incremental dir whose gen 0
    * covers every committed manifest segment, so the standing
    * [[CuratedVectorSync]] lockstep continues there unchanged (point
    * its ExportCfg at the new dir; later batches append gen 1+).
    *
    * Works from the LIVE layout, not the manifest increments, so it is
    * compaction-independent — this is also the documented escape hatch
    * when an incremental export lagged past the compaction cadence.
    * Single-writer like every layout operation: run it on the same
    * cadence slot as ingest, not concurrently with one (a segment
    * committing mid-pack would land in gen 0's bytes but not its
    * coverage, and the next incremental call would ship those docs
    * twice). Crash-convergent: a re-run re-seals gen 0 from the same
    * deterministic inputs (or re-commits a sealed-but-unmarked gen 0
    * from its own staged coverage), re-audits, and re-attempts only
    * the GC. */
  def exportEpoch(s: SparkSession, outDir: String, oldExportDir: String,
      newExportDir: String, seed: Long, nShards: Int = 8,
      seqLen: Int = 64): EpochReport = {
    // compare FILESYSTEM-qualified paths, not raw strings: a trailing
    // slash / relative spelling / ./ prefix of the same dir would pass
    // a string inequality and the post-audit GC would then delete the
    // just-verified epoch — the zero-intact-epochs outcome the audit
    // ordering exists to prevent. A parent/child pair is refused for
    // the same reason (deleting old would take new with it).
    val (newQ, oldQ) = {
      def qual(d: String) = {
        val p = new org.apache.hadoop.fs.Path(d)
        hfs(s, p).makeQualified(p).toUri.normalize
      }
      (qual(newExportDir), qual(oldExportDir))
    }
    def covers(a: java.net.URI, b: java.net.URI): Boolean =
      a == b || (a.getScheme == b.getScheme && a.getAuthority == b.getAuthority &&
        (b.getPath + "/").startsWith(a.getPath.stripSuffix("/") + "/"))
    require(!covers(newQ, oldQ) && !covers(oldQ, newQ),
      s"the new epoch needs its own dir — the old one must keep serving " +
        s"until the new one verifies (got old=$oldQ new=$newQ)")
    require(nShards > 0 && seqLen > 0, s"bad shape: $nShards shards × $seqLen")
    val markers = genMarkers(s, newExportDir)
    require(markers.keySet.subsetOf(Set(0L)),
      s"$newExportDir already has post-epoch generations ${markers.keySet} — " +
        "it is a live export dir, not a fresh epoch target")
    val dir = genDir(newExportDir, 0L)
    val (rep, covered) = markers.get(0L) match {
      case Some(segs) => // a completed (or GC-crashed) epoch re-run
        val r = readReport(s, dir)
        require(r.nShards == nShards && r.seqLen == seqLen && r.seed == seed,
          s"$newExportDir gen 0 is sealed with shape (${r.nShards}, " +
            s"${r.seqLen}, ${r.seed}); requested ($nShards, $seqLen, $seed)")
        (r, segs)
      case None =>
        val committed = DeltaIngest.committedSegs(s, outDir).toSeq.sorted
        val docs = DeltaIngest.readFinal(s, outDir)
          .where(col("split") === "train")
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
        writeSmallFile(s, s"$dir/_covered", committed.mkString(","))
        val r = exportDocs(s, docs, dir, nShards, seqLen, seed)
        writeSmallFile(s, s"${genMarkerDir(newExportDir)}/gen-0",
          committed.mkString(","))
        (r, committed.toSet)
    }
    // audit BEFORE any GC — the one ordering that can never strand
    // training with zero intact epochs
    val badRows = verifyAll(s, newExportDir).where(!col("ok")).count()
    require(badRows == 0,
      s"epoch export $newExportDir failed its audit on $badRows shard " +
        s"rows — superseded epoch $oldExportDir left in place")
    val p = new org.apache.hadoop.fs.Path(oldExportDir)
    val removed = hfs(s, p).exists(p) && hfs(s, p).delete(p, true)
    EpochReport(rep, covered.size.toLong, removed)
  }

  /** [[verify]] over every committed generation of an incremental
    * export — each generation is a standard sealed export dir, so the
    * same bytes-vs-manifest audit applies per generation; `gen` column
    * appended. */
  def verifyAll(s: SparkSession, exportDir: String): DataFrame = {
    val gens = genMarkers(s, exportDir).keys.toSeq.sorted
    require(gens.nonEmpty, s"$exportDir has no committed generations")
    gens.map(g => verify(s, genDir(exportDir, g)).withColumn("gen", lit(g)))
      .reduce(_ unionAll _)
  }

  final case class ExportHealth(
      nGenerations: Long,
      nCoveredSegs: Long, // manifest segments the generations cover
      nDocs: Long,
      nSeqs: Long,
      nTokens: Long)

  /** One-call operational snapshot of an incremental export dir — the
    * [[IvfMaintenance.health]] twin for the training-shard surface,
    * read from the generation markers and sealed manifests only
    * (nShards rows per generation — never the shard bytes). Zeroes for
    * a dir with no committed generation yet (an enabled-but-undrained
    * lockstep is a legitimate observable state, not an error). */
  def health(s: SparkSession, exportDir: String): ExportHealth = {
    val markers = genMarkers(s, exportDir)
    if (markers.isEmpty) return ExportHealth(0L, 0L, 0L, 0L, 0L)
    val m = readManifests(s, exportDir)
      .agg(sum("n_docs"), sum("n_seqs"), sum("n_tokens")).head()
    ExportHealth(markers.size.toLong, markers.values.flatten.toSet.size.toLong,
      m.getLong(0), m.getLong(1), m.getLong(2))
  }

  /** Per-shard manifests of every committed generation, with a `gen`
    * column — the loader's one-stop listing. */
  def readManifests(s: SparkSession, exportDir: String): DataFrame = {
    val gens = genMarkers(s, exportDir).keys.toSeq.sorted
    require(gens.nonEmpty, s"$exportDir has no committed generations")
    gens.map(g => readManifest(s, genDir(exportDir, g))
      .withColumn("gen", lit(g))).reduce(_ unionAll _)
  }

  private def readReport(s: SparkSession, exportDir: String): ExportReport = {
    val m = readManifest(s, exportDir)
    // an empty train slice seals an empty manifest — the replayed
    // report must agree with the original (all-zero), not NPE
    if (m.head(1).isEmpty) return ExportReport(0L, 0L, 0L, 0, 0, 0L)
    val r = m.agg(
      sum("n_docs").as("nd"), sum("n_tokens").as("nt"), sum("n_seqs").as("ns"),
      max("n_shards").as("nsh"), max("seq_len").as("sl"), max("seed").as("se"))
      .collect()(0)
    ExportReport(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getInt(3), r.getInt(4), r.getLong(5))
  }
}
