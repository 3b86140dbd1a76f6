package graft

import graft.operators.{IvfMaintenance, TextSearchIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serve-surface benchmark: builds the maintained indexes from the
  * fixture tables once, then times warm top-k serving on each surface
  * (exact kNN, compressed ADC, BM25). Published under `serve_bench` in
  * BENCH.json (full JSON only — the compact driver line stays within
  * its tail-window budget). Protocol matches the query bench: one
  * unmeasured warm pass, then min-of-3. */
object ServeBench {

  def run(spark: SparkSession, sfDir: String): Map[String, Double] = {
    def tmp(n: String) =
      java.nio.file.Files.createTempDirectory(s"serve_$n").toString
    val ivfDir = tmp("ivf"); val sizedDir = tmp("ivf_sized")
    val searchDir = tmp("search"); val cellsDir = tmp("ivf_cells")
    // the fixtures' full IVF+PQ+search copies must not outlive the run:
    // un-deleted temp dirs accumulated /tmp disk across bench rounds
    try runOn(spark, sfDir, ivfDir, sizedDir, searchDir, cellsDir)
    finally for (d <- Seq(ivfDir, sizedDir, searchDir, cellsDir)) {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  private def runOn(spark: SparkSession, sfDir: String,
      ivfDir: String, sizedDir: String,
      searchDir: String, cellsDir: String): Map[String, Double] = {

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("embedding"))
      .localCheckpoint(true)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").localCheckpoint(true)

    def once(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def bench(f: => Unit): Double = { f; (1 to 3).map(_ => once(f)).min }

    val ivfBuild = once {
      IvfMaintenance.build(spark, emb, ivfDir)
      IvfMaintenance.buildPq(spark, emb.select("label", "embedding"), ivfDir, 8)
    }
    // production sizing: nlist = N / targetOcc (the serve path whose
    // per-probe work stays flat as the corpus grows) — a SECOND key
    // set, so the label-seeded numbers stay cross-round comparable
    val targetOcc = 100L
    val sizedBuild = once {
      val n = emb.count()
      IvfMaintenance.build(spark, emb, sizedDir,
        nlist = Some(math.max(1L, n / targetOcc).toInt), targetOcc = targetOcc)
      IvfMaintenance.buildPq(spark, emb.select("label", "embedding"), sizedDir, 8)
    }
    val searchBuild = once { TextSearchIndex.build(spark, docs, searchDir) }
    // hierarchical coarse layer over the production-sized index — the
    // serve shape that stays shippable past ~1M cells (broadcasts
    // O(sqrt(nlist)), never the full centroid table)
    val superBuild = once { IvfMaintenance.buildSuper(spark, sizedDir) }

    val queries = emb.where(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"), col("embedding"))
      .localCheckpoint(true)
    // the t_bm25_topk query convention: the 3 highest-df words len>=4
    val terms = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 4)
      .groupBy("w").agg(count_distinct(col("doc_id")).as("df"))
      .orderBy(col("df").desc, col("w").asc).limit(3)
      .collect().map(_.getString(0)).toSeq

    Map(
      "ivf_build_sec" -> ivfBuild,
      "ivf_build_sized_sec" -> sizedBuild,
      "search_build_sec" -> searchBuild,
      "knn_100q_sec" -> bench {
        IvfMaintenance.knnQuery(spark, ivfDir, queries, k = 5, nprobe = 2)
          .count(); ()
      },
      "adc_100q_sec" -> bench {
        IvfMaintenance.adcKnn(spark, ivfDir, queries, k = 5, nprobe = 2)
          .count(); ()
      },
      "knn_sized_100q_sec" -> bench {
        IvfMaintenance.knnQuery(spark, sizedDir, queries, k = 5, nprobe = 2)
          .count(); ()
      },
      "adc_sized_100q_sec" -> bench {
        IvfMaintenance.adcKnn(spark, sizedDir, queries, k = 5, nprobe = 2)
          .count(); ()
      },
      "super_build_sec" -> superBuild,
      "knn_hier_100q_sec" -> bench {
        IvfMaintenance.knnQuery(spark, sizedDir, queries, k = 5, nprobe = 2,
          sprobe = Some(4)).count(); ()
      },
      "adc_hier_100q_sec" -> bench {
        IvfMaintenance.adcKnn(spark, sizedDir, queries, k = 5, nprobe = 2,
          sprobe = Some(4)).count(); ()
      },
      "bm25_sec" -> bench {
        TextSearchIndex.query(spark, searchDir, terms, 10).count(); ()
      }) ++ cellsSized(spark, emb, cellsDir, once, bench)
  }

  /** Hier-vs-flat at a DESIGN-POINT cell count. The probe cost the
    * hier layer exists to bound is a function of nlist, and the
    * fixture corpora top out at tens of cells — so the `*_hier_100q`
    * keys above can only show the layer's fixed overhead, never its
    * win. This family builds a cells-heavy index: the fixture
    * embeddings replicated with deterministic id-offset perturbations
    * to ~24k vectors, one label per vector (occupancy ≈ 1), rounds = 0
    * — the PROBE then faces ~24k centroids, two orders past the other
    * keys, while the corpus stays bench-sized. At that width the flat
    * probe must broadcast and argmin the full 24k-row centroid table
    * per call; the hier probe broadcasts ~√24k supers plus probed
    * children. Keys publish the measured crossover (sized hier vs
    * sized flat) each certified run. */
  private def cellsSized(spark: SparkSession,
      emb: org.apache.spark.sql.DataFrame, cellsDir: String,
      once: (=> Unit) => Double,
      bench: (=> Unit) => Double): Map[String, Double] = {
    // 8k cells: the smallest width where the crossover is already
    // measurable (flat pays the full-table broadcast+argmin per call)
    // while the one-off build stays bench-sized — the build's final
    // assign is O(nCells²·dim), so doubling the width quadruples it
    val nTarget = 8000L
    val nEmb = emb.count()
    val reps = math.max(1L, (nTarget + nEmb - 1) / nEmb)
    val big = emb.crossJoin(spark.range(reps).toDF("r"))
      .select((col("vec_id") * reps + col("r")).as("vec_id"),
        (col("vec_id") * reps + col("r")).as("label"),
        transform(col("embedding"), (x, i) =>
          x + (col("r") * (i + lit(1)) % lit(97)).cast("double") * lit(0.013))
          .as("embedding"))
      .localCheckpoint(true)
    val nCells = big.count()
    val buildSec = once {
      IvfMaintenance.build(spark, big, cellsDir, rounds = 0)
      // PQ codebooks are per-(subspace, label): the per-vector labels
      // that seed the occ-1 cells would make the codebook AS BIG AS
      // the corpus (degenerate, and O(N²) to encode) — train on a
      // coarse 256-bucket relabeling, the realistic codebook width
      IvfMaintenance.buildPq(spark,
        big.select((col("vec_id") % 256).as("label"), col("embedding")),
        cellsDir, 8)
    }
    val superSec = once { IvfMaintenance.buildSuper(spark, cellsDir) }
    // deterministic 100: the r=0 replica of the first 100 originals
    val queries = big
      .where(col("vec_id") % reps === 0 && col("vec_id") < lit(100L) * reps)
      .select(col("vec_id").as("query_id"), col("embedding"))
      .localCheckpoint(true)
    // sprobe ≈ √(super count): same pruning ratio at each level
    val sprobe = math.max(2,
      math.round(math.pow(nCells.toDouble, 0.25)).toInt)
    Map(
      "cells_sized_nlist" -> nCells.toDouble,
      "cells_sized_sprobe" -> sprobe.toDouble,
      "cells_sized_build_sec" -> buildSec,
      "cells_sized_super_build_sec" -> superSec,
      "knn_flat_sized_100q_sec" -> bench {
        IvfMaintenance.knnQuery(spark, cellsDir, queries, k = 5, nprobe = 8)
          .count(); ()
      },
      "knn_hier_sized_100q_sec" -> bench {
        IvfMaintenance.knnQuery(spark, cellsDir, queries, k = 5, nprobe = 8,
          sprobe = Some(sprobe)).count(); ()
      },
      "adc_flat_sized_100q_sec" -> bench {
        IvfMaintenance.adcKnn(spark, cellsDir, queries, k = 5, nprobe = 8)
          .count(); ()
      },
      "adc_hier_sized_100q_sec" -> bench {
        IvfMaintenance.adcKnn(spark, cellsDir, queries, k = 5, nprobe = 8,
          sprobe = Some(sprobe)).count(); ()
      })
  }
}
