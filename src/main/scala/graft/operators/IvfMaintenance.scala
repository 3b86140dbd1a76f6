package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF index MAINTENANCE — the embedding twin of [[DeltaIngest]]'s
  * dedup-index upkeep, composing the registry's oracle-checked pieces
  * into a persisted, incrementally-updated index:
  *
  *   - [[build]]: the sim_ivf_train loop (Lloyd's k-means, label-seeded,
  *     one corpus-scanning job per round) → publishes `centroids` +
  *     `assignments` tables.
  *   - [[ingest]]: the sim_incremental_assign step — a delta batch is
  *     argmin-assigned against the BROADCAST centroid table
  *     (O(|delta| × nlist), the corpus is never rescanned), appended to
  *     the assignment table, and each cell's post-ingest occupancy is
  *     checked against the split threshold (20·n_cell > 3·n_total, the
  *     integer cross-ratio form that never crosses engines as a
  *     double).
  *   - overgrown cells then get the sim_cell_split primitive: a
  *     deterministic in-cell 2-means (min/max-id seeds, ties to sub 0,
  *     1e-9-quantized exact sub-means), executed ONLY over the flagged
  *     cells' members (a cell-keyed semi-join — O(cell) work per split,
  *     never a retrain), and the index is republished with the two
  *     sub-centroids replacing the parent (sub 0 keeps the cell id,
  *     sub 1 takes max_cell_id + rank — collision-free and
  *     deterministic).
  *
  * Approximation contract (the documented divergence from a full
  * retrain, spec-pinned): a split is ONE 2-means step over the cell's
  * members at split time — sim_ivf_train retrained on the union would
  * let neighboring vectors migrate across the new boundary in later
  * Lloyd rounds. The spec proves the exact pieces instead: untouched
  * cells keep byte-identical centroids and assignments, the delta's
  * assignment equals the brute argmin against the published centroids,
  * and split sub-centroids equal the sim_cell_split arithmetic
  * recomputed from scratch on the union's membership.
  *
  * Publishing is crash-safe the same way DeltaIngest's compaction is:
  * new tables are staged, then swapped in with the checked rename-aside
  * dance — no instant leaves the index missing. (The full write-ahead
  * batch protocol is not replicated here: the index is DERIVED state,
  * rebuildable from the embeddings; the curated layout DeltaIngest
  * guards is not.)
  */
object IvfMaintenance {

  /** Post-ingest occupancy above which a cell is split:
    * 20·n_cell > 3·n_total (i.e. n_cell > 1.5× the mean of ~10 cells),
    * the sim_incremental_assign flag, verbatim. */
  def needsSplit(nCell: Column, nTotal: Column): Column =
    nCell * 20 > nTotal * 3

  final case class IngestReport(
      nDelta: Long,
      nCellsBefore: Long,
      nSplit: Long, // cells split this ingest
      nCellsAfter: Long)

  private def centDir(outDir: String) = s"$outDir/ivf/centroids.parquet"
  private def asgDir(outDir: String) = s"$outDir/ivf/assignments.parquet"

  def centroids(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(centDir(outDir))
  def assignments(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(asgDir(outDir))

  private def dot(a: Column, b: Column): Column =
    VectorFunctions.dot(a, b)
  private def d2(e: Column, c: Column): Column =
    dot(e, e) - lit(2.0) * dot(e, c) + dot(c, c)

  /** The (cell, dim)-keyed 1e-9-quantized exact mean every centroid op
    * here uses (the sim_ivf_train arithmetic), collected back to one
    * array row per group. */
  private def quantCentroid(
      s: SparkSession, vecs: DataFrame, grp: Seq[Column], names: Seq[String]): DataFrame = {
    val cd = vecs
      .select((grp.zip(names).map { case (c, n) => c.as(n) } :+
        posexplode(col("e")).as(Seq("pos", "v"))): _*)
      .groupBy((names.map(col) :+ (col("pos") + 1).as("dim")): _*)
      .agg((sum(round(col("v") * 1e9).cast("long")).cast("double") / 1e9 /
        count(lit(1))).as("cv"),
        count(lit(1)).as("cnt"))
    cd.groupBy(names.map(col): _*)
      .agg(array_sort(collect_list(struct(col("dim"), col("cv")))).as("pairs"),
        max(col("cnt")).as("n_assigned"))
      .select((names.map(col) :+
        transform(col("pairs"), p => p.getField("cv")).as("c") :+
        col("n_assigned")): _*)
  }

  /** argmin cell per vector against a broadcast centroid table —
    * one combinable min(struct), ties to the smaller cell id. */
  private def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents.select("cell", "c")))
      .select(col("vec_id"),
        struct(d2(col("e"), col("c")).as("dst"), col("cell")).as("sc"))
      .groupBy("vec_id").agg(min(col("sc")).as("b"))
      .select(col("vec_id"), col("b.cell").as("cell"))

  /** Train the index with the sim_ivf_train loop (label-seeded Lloyd,
    * `rounds` full assign→recompute rounds) and publish. Embeddings:
    * (vec_id: long, label: int-ish, embedding: array<float|double>). */
  def build(s: SparkSession, embeddings: DataFrame, outDir: String,
      rounds: Int = 3): Unit = {
    VectorFunctions.register(s)
    val e = embeddings
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("e"))
      .localCheckpoint(true)
    var cents = quantCentroid(s, e.select(col("label"), col("e")),
      Seq(col("label")), Seq("cell")).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val asg = assign(e, cents).localCheckpoint(true)
      cents = quantCentroid(s,
        asg.join(e, "vec_id").select(col("cell"), col("e")),
        Seq(col("cell")), Seq("cell")).localCheckpoint(true)
    }
    // the inverted lists are the argmin against the PUBLISHED centroids
    // (rounds = 0 publishes the label-seed index: seed means + argmin
    // lists — the sim_incremental_assign base shape)
    val asg = assign(e, cents).localCheckpoint(true)
    publish(s, outDir, cents, asg.join(e, "vec_id")
      .select(col("vec_id"), col("cell"), col("e")))
  }

  /** Absorb a delta batch: assign against the standing centroids,
    * append, split every cell the occupancy flag catches, republish.
    * Returns the maintenance report. */
  def ingest(s: SparkSession, delta: DataFrame, outDir: String): IngestReport = {
    VectorFunctions.register(s)
    val cents = centroids(s, outDir).localCheckpoint(true)
    val nCellsBefore = cents.count()
    val d = delta
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .localCheckpoint(true)
    val nDelta = d.count()
    val dAsg = assign(d, cents).join(d, "vec_id")
      .select(col("vec_id"), col("cell"), col("e"))
    val all = assignments(s, outDir).unionAll(dAsg).localCheckpoint(true)
    val occ = all.groupBy("cell").agg(count(lit(1)).as("n"))
    val nTotal = all.count()
    val flagged = occ.where(needsSplit(col("n"), lit(nTotal)))
      .select("cell").localCheckpoint(true)
    val nSplit = flagged.count()
    val (newCents, newAsg) =
      if (nSplit == 0) (cents, all)
      else {
        // sim_cell_split over the flagged cells' members ONLY
        val members = all.join(broadcast(flagged), "cell").localCheckpoint(true)
        val seeds = members.groupBy("cell")
          .agg(min("vec_id").as("s0"), max("vec_id").as("s1"))
        val sv = seeds
          .join(members.select(col("vec_id").as("s0"), col("e").as("e0")), "s0")
          .join(members.select(col("vec_id").as("s1"), col("e").as("e1")), "s1")
          .select("cell", "e0", "e1")
        val subbed = members.join(broadcast(sv), "cell")
          .select(col("cell"),
            when(d2(col("e"), col("e1")) < d2(col("e"), col("e0")), 1)
              .otherwise(0).as("sub"),
            col("vec_id"), col("e"))
          .localCheckpoint(true)
        val subCents = quantCentroid(s,
          subbed.select(col("cell"), col("sub"), col("e")),
          Seq(col("cell"), col("sub")), Seq("cell", "sub"))
        // sub 0 keeps the parent id; sub 1 gets max_cell_id + dense rank
        // over the split cells — deterministic, collision-free
        val maxCell = cents.agg(max("cell")).collect()(0).getLong(0)
        val w = org.apache.spark.sql.expressions.Window.orderBy("cell")
        val renames = flagged
          .select(col("cell"), (lit(maxCell) + row_number().over(w))
            .as("sub1_cell"))
        val splitCents = subCents.join(broadcast(renames), "cell")
          .select(
            when(col("sub") === 0, col("cell")).otherwise(col("sub1_cell"))
              .as("cell"),
            col("c"))
        val keptCents = cents.join(broadcast(flagged), Seq("cell"), "left_anti")
          .select("cell", "c") // publish recounts occupancy from the lists
        val splitAsg = subbed.join(broadcast(renames), "cell")
          .select(col("vec_id"),
            when(col("sub") === 0, col("cell")).otherwise(col("sub1_cell"))
              .as("cell"),
            col("e"))
        // a USING-column join (even anti) moves the key to the FRONT,
        // and unionAll is positional — re-select before unioning
        val keptAsg = all.join(broadcast(flagged), Seq("cell"), "left_anti")
          .select("vec_id", "cell", "e")
        (keptCents.unionAll(splitCents).localCheckpoint(true),
          keptAsg.unionAll(splitAsg).localCheckpoint(true))
      }
    publish(s, outDir, newCents, newAsg)
    IngestReport(nDelta, nCellsBefore, nSplit,
      centroids(s, outDir).count())
  }

  /** Stage + checked-rename swap (no instant leaves the index missing).
    * Published occupancy is ALWAYS the inverted lists' count, so the
    * centroid table and the lists can never disagree. */
  private def publish(s: SparkSession, outDir: String,
      cents: DataFrame, asg: DataFrame): Unit = {
    val occ = asg.groupBy("cell").agg(count(lit(1)).as("n_assigned"))
    swapIn(s, cents.select("cell", "c")
      .join(occ, Seq("cell"), "left")
      .select(col("cell"), col("c"),
        coalesce(col("n_assigned"), lit(0L)).as("n_assigned")),
      centDir(outDir))
    swapIn(s, asg.select("vec_id", "cell", "e")
      .repartition(col("cell")).sortWithinPartitions("cell", "vec_id"),
      asgDir(outDir))
  }

  private def swapIn(s: SparkSession, df: DataFrame, path: String): Unit = {
    val staged = path + "_staged"
    // sever lineage: the frame may read the very path being replaced
    df.localCheckpoint(true).write.mode("overwrite").parquet(staged)
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(conf)
    val old = new org.apache.hadoop.fs.Path(path + "_old")
    if (f.exists(old)) f.delete(old, true)
    if (f.exists(p) && !f.rename(p, old))
      throw new java.io.IOException(s"swapIn: rename $p -> $old failed")
    if (!f.rename(new org.apache.hadoop.fs.Path(staged), p)) {
      if (f.exists(old)) f.rename(old, p)
      throw new java.io.IOException(s"swapIn: rename $staged -> $p failed")
    }
    f.delete(old, true)
    // a bare FS rename bypasses DataFrameWriter's cache invalidation:
    // the session's FileStatusCache would keep serving the pre-swap
    // listing (files that no longer exist) to the next reader
    s.catalog.refreshByPath(path)
  }
}
