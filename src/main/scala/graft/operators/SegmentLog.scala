package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The segment-log commit discipline [[IvfMaintenance]] and
  * [[TextSearchIndex]] share — ONE definition so marker semantics,
  * replay identity, crash sweeping, and the compaction swap can never
  * drift bug-for-bug between indexes (they did: the stale-staging
  * defect existed identically in both compacts before this extraction).
  *
  * Contract: data tables live as immutable `<root>/seg=<n>` dirs; a
  * marker file `<markerDir>/seg-<n>` (content = the batch's replay
  * key) admits segment n atomically; `skip-<key>` markers record
  * replay identity without consuming a segment; compaction folds to
  * the top segment, swaps via rename-aside, and consolidates every
  * marker's keys into one `keys-<top>` file. */
private[graft] object SegmentLog {

  def fs(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  def committedSegs(s: SparkSession, markerDir: String): Set[Long] = {
    val root = new Path(markerDir)
    val f = fs(s, root)
    if (!f.exists(root)) Set.empty
    else f.listStatus(root).toSeq
      .flatMap(_.getPath.getName.stripPrefix("seg-").toLongOption).toSet
  }

  /** Replay keys of every committed batch — O(files since last
    * compaction): [[consolidateKeys]] folds old markers into ONE
    * `keys-<n>` file before dropping them. */
  def committedKeys(s: SparkSession, markerDir: String): Set[String] = {
    val root = new Path(markerDir)
    val f = fs(s, root)
    if (!f.exists(root)) Set.empty
    else f.listStatus(root).toSeq
      // a crashed consolidation's .tmp may hold a TRUNCATED key that
      // collides with a real future batch key — never read dotfiles
      .filterNot(_.getPath.getName.startsWith("."))
      .flatMap { st =>
        val in = f.open(st.getPath)
        val txt = try scala.io.Source.fromInputStream(in).mkString
        finally in.close()
        txt.split('\n').map(_.trim).filter(_.nonEmpty)
      }.toSet
  }

  /** Marker NAME carries the segment (visibility); CONTENT carries the
    * batch key (replay identity). seg < 0 writes a skip marker. */
  def commitMarker(s: SparkSession, markerDir: String, seg: Long,
      key: String): Unit = {
    val dir = new Path(markerDir)
    val f = fs(s, dir)
    f.mkdirs(dir)
    val name = if (seg >= 0) s"seg-$seg"
      else "skip-" + key.replaceAll("[^A-Za-z0-9_.-]", "_")
    val out = f.create(new Path(dir, name), true)
    try out.write(key.getBytes("UTF-8")) finally out.close()
  }

  def presentSegs(s: SparkSession, root: String): Seq[Long] = {
    val p = new Path(root)
    val f = fs(s, p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("seg="))
      .flatMap(st => st.getPath.getName.stripPrefix("seg=").toLongOption)
  }

  /** Uncommitted segment dirs are crash leftovers: readers never admit
    * them, the next writer sweeps them. */
  def wipeUncommitted(s: SparkSession, markerDir: String,
      roots: Seq[String]): Unit = {
    val allowed = committedSegs(s, markerDir)
    for (r <- roots; n <- presentSegs(s, r) if !allowed(n)) {
      val p = new Path(s"$r/seg=$n"); fs(s, p).delete(p, true)
    }
  }

  def deleteDir(s: SparkSession, path: String): Unit = {
    val p = new Path(path); fs(s, p).delete(p, true)
  }

  /** Swap a staged dir into place: rename the live dir ASIDE (never
    * delete first), staged in, then drop the old — both renames
    * checked (object-store shims return false without throwing). */
  def swapDir(s: SparkSession, staged: String, path: String): Unit = {
    val p = new Path(path)
    val f = fs(s, p)
    val old = new Path(path + "_old")
    if (f.exists(old)) f.delete(old, true) // prior completed swap's leftover
    if (f.exists(p) && !f.rename(p, old))
      throw new java.io.IOException(s"swapDir: rename $p -> $old failed")
    if (!f.rename(new Path(staged), p)) {
      if (f.exists(old)) f.rename(old, p) // roll back: never leave the table absent
      throw new java.io.IOException(s"swapDir: rename $staged -> $p failed")
    }
    f.delete(old, true)
    s.catalog.refreshByPath(path) // bare renames bypass the FileStatusCache
  }

  /** Compaction tail: fold every marker's keys into one `keys-<top>`
    * file (temp + checked rename — a crash leaves duplicate keys, set
    * semantics) and drop everything except it and seg-<top>. */
  def consolidateKeys(s: SparkSession, markerDir: String, top: Long): Unit = {
    val mDir = new Path(markerDir)
    val f = fs(s, mDir)
    val allKeys = committedKeys(s, markerDir)
    val tmp = new Path(mDir, s".keys-$top.tmp")
    val out = f.create(tmp, true)
    try out.write(allKeys.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val consolidated = new Path(mDir, s"keys-$top")
    if (f.exists(consolidated)) f.delete(consolidated, false)
    if (!f.rename(tmp, consolidated))
      throw new java.io.IOException(
        s"consolidateKeys: rename $tmp -> $consolidated failed")
    f.listStatus(mDir).map(_.getPath.getName)
      .filterNot(n => n == s"seg-$top" || n == s"keys-$top")
      .foreach(n => f.delete(new Path(mDir, n), false))
  }
}
