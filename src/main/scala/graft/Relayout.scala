package graft

import org.apache.spark.sql.SparkSession

/** One-time ingest compaction for unsplittable parquet input.
  *
  * A parquet file with a single row group cannot be split: Spark's
  * byte-range file splits assign all rows to the split containing the
  * row group's start, so the scan — and every row-local stage above it —
  * runs on one core regardless of cluster size. Production lakes fix
  * such layouts once at ingest (compaction / re-bucketing), not with a
  * per-query shuffle; this mirrors that. Tables whose scan yields fewer
  * splittable units than a quarter of `defaultParallelism` are rewritten
  * once into a `defaultParallelism`-way parquet copy; well-laid-out
  * tables are passed through untouched (a symlink into the source dir,
  * so mixed layouts still resolve through one directory).
  *
  * Schema is preserved exactly (BIGINT ns and TIMESTAMP_NTZ fixture
  * generations both round-trip), so results are byte-identical to
  * reading the raw input — only the physical layout changes.
  */
object Relayout {

  /** Returns (directory the benchmark should read, seconds spent).
    * Idempotent per (source dir, parallelism): reuses an existing spread
    * copy only when every source table's mtime predates it. */
  def spreadUnsplittable(spark: SparkSession, sfDir: String): (String, Double) = {
    val t0 = System.nanoTime()
    val src = new java.io.File(sfDir)
    val tables = Option(src.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") && f.isFile)
    if (tables.isEmpty) return (sfDir, 0.0) // already a dir-per-table layout
    val par = spark.sparkContext.defaultParallelism
    val out = new java.io.File(
      s"/tmp/graft-spread-${Integer.toHexString(sfDir.hashCode)}-p$par")
    val stamp = new java.io.File(out, "_GRAFT_SPREAD_DONE")
    val fresh = stamp.isFile && tables.forall(_.lastModified() < stamp.lastModified())
    if (!fresh) {
      // wipe any stale copy, then rebuild
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(out)
      out.mkdirs()
      tables.foreach { f =>
        // true splittable-unit count: row groups from the parquet footer
        // (byte-range split counts over-report — rows land only in the
        // split holding a row group's start)
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          spark.sessionState.newHadoopConf())
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val rowGroups = try reader.getFooter.getBlocks.size finally reader.close()
        if (rowGroups * 4 <= par) {
          val df = spark.read.parquet(f.getAbsolutePath)
          df.repartition(par)
            .write.mode("overwrite")
            .parquet(new java.io.File(out, f.getName).getAbsolutePath)
        } else {
          java.nio.file.Files.createSymbolicLink(
            new java.io.File(out, f.getName).toPath, f.toPath)
        }
      }
      stamp.createNewFile(): Unit
    }
    (out.getAbsolutePath, (System.nanoTime() - t0) / 1e9)
  }
}
