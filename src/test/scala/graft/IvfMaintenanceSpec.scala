package graft

import graft.operators.IvfMaintenance
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed IVF maintenance operator vs its oracle-checked pieces:
  * build == sim_ivf_train's trajectory endpoint, ingest == the
  * sim_incremental_assign step, splits == the sim_cell_split
  * arithmetic on exactly the flagged cells. The divergence from a full
  * retrain (split members partition between the two subs only; distant
  * vectors never migrate) is the operator's documented approximation —
  * everything else is pinned exactly. */
class IvfMaintenanceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"ivf_$name").toString

  private def embeddings: DataFrame =
    graft.queries.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("embedding"))

  private def bruteAssign(vecs: DataFrame, cents: DataFrame): Map[Long, Long] = {
    graft.functions.VectorFunctions.register(spark)
    import graft.functions.VectorFunctions.dot
    def d2(e: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      dot(e, e) - lit(2.0) * dot(e, c) + dot(c, c)
    vecs.crossJoin(broadcast(cents.select("cell", "c")))
      .select(col("vec_id"),
        struct(d2(col("embedding"), col("c")).as("dst"), col("cell")).as("sc"))
      .groupBy("vec_id").agg(min("sc").as("b"))
      .select(col("vec_id"), col("b.cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("build: lists are the argmin against the published centroids; occupancy = list counts") {
    val out = tmp("full")
    IvfMaintenance.build(spark, embeddings, out)
    // the faiss-style index invariant: whatever the training
    // trajectory, the PUBLISHED pair is (final centroids, argmin lists
    // against exactly them) — a probe that argmins the same centroids
    // lands in the list that holds its neighbors
    val brute = bruteAssign(embeddings, IvfMaintenance.centroids(spark, out))
    val stored = IvfMaintenance.assignments(spark, out)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stored == brute, "stored assignments are not the centroid argmin")
    val occ = IvfMaintenance.centroids(spark, out)
      .select("cell", "n_assigned").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val counts = stored.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(occ.filter(_._2 > 0) == counts, s"occupancy diverged from the lists")
    assert(stored.size == embeddings.count(), "every vector must be in a list")
  }

  test("a small delta ingests as pure assignment: no splits, centroids untouched") {
    val out = tmp("small")
    IvfMaintenance.build(spark, embeddings.where(col("vec_id") % 10 =!= 7), out)
    val centsBefore = IvfMaintenance.centroids(spark, out)
      .select("cell", "c").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val delta = embeddings.where(col("vec_id") % 10 === 7)
    val r = IvfMaintenance.ingest(spark, delta, out)
    assert(r.nSplit == 0 && r.nCellsAfter == r.nCellsBefore,
      s"a 10% spread delta must not trigger splits: $r")
    val centsAfter = IvfMaintenance.centroids(spark, out)
      .select("cell", "c").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(centsAfter == centsBefore, "ingest must not move centroids")
    // the delta's stored cells equal the brute argmin — the
    // sim_incremental_assign contract
    val brute = bruteAssign(delta, IvfMaintenance.centroids(spark, out))
    val stored = IvfMaintenance.assignments(spark, out)
      .join(delta.select("vec_id"), "vec_id")
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stored == brute)
  }

  test("an overgrown cell splits: sub-centroids equal the sim_cell_split arithmetic") {
    val out = tmp("split")
    IvfMaintenance.build(spark, embeddings.where(col("vec_id") % 10 =!= 7), out)
    val cents = IvfMaintenance.centroids(spark, out).collect()
    val target = cents.minBy(_.getLong(0))
    val targetCell = target.getLong(0)
    val c = target.getSeq[Double](1).toArray
    // 200 synthetic vectors hugging the target centroid — all assign
    // there, blowing its occupancy past the 1.5x-mean flag
    import spark.implicits._
    val delta = (0 until 200).map { k =>
      val v = c.clone()
      v(k % v.length) += 0.001 * ((k % 7) + 1)
      (900000L + k, v.toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val before = IvfMaintenance.assignments(spark, out)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val membership = before.filter(_._2 == targetCell).keySet ++
      delta.select("vec_id").collect().map(_.getLong(0))
    val r = IvfMaintenance.ingest(spark, delta, out)
    assert(r.nSplit >= 1, s"the hugged cell must flag: $r")
    assert(r.nCellsAfter == r.nCellsBefore + r.nSplit,
      s"each split adds exactly one cell: $r")
    assert(r.nSplit == 1, s"only the hugged cell crosses the threshold: $r")
    val after = IvfMaintenance.centroids(spark, out).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2)))
    val afterMap = after.map(t => t._1 -> t._2).toMap
    // untouched cells keep byte-identical centroids
    cents.filterNot(_.getLong(0) == targetCell).foreach { row =>
      assert(afterMap(row.getLong(0)) == row.getSeq[Double](1),
        s"split must not move cell ${row.getLong(0)}")
    }
    // the split cell's two subs: recompute the deterministic 2-means
    // from scratch on its membership and compare the quantized means
    val memberVecs = IvfMaintenance.assignments(spark, out)
      .where(col("vec_id").isin(membership.toSeq: _*))
      .select("vec_id", "e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(memberVecs.keySet == membership, "split must not lose members")
    val s0 = membership.min; val s1 = membership.max
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val sub1Ids = membership.filter(id =>
      d2(memberVecs(id), memberVecs(s1)) < d2(memberVecs(id), memberVecs(s0)))
    val sub0Ids = membership -- sub1Ids
    // Spark's round() is BigDecimal-HALF_UP on the double's shortest
    // decimal form — Math.round differs at negative exact-.5 values
    // (which the synthetic delta hits: 98 copies of one centroid coord)
    def q(x: Double): Long =
      BigDecimal(x * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def quantMean(ids: Set[Long]): Seq[Double] = {
      val dim = memberVecs(ids.head).length
      (0 until dim).map { d =>
        ids.toSeq.map(id => q(memberVecs(id)(d))).sum.toDouble / 1e9 / ids.size
      }
    }
    val storedCells = IvfMaintenance.assignments(spark, out)
      .where(col("vec_id").isin(membership.toSeq: _*))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sub0Cell = storedCells(sub0Ids.head)
    assert(sub0Cell == targetCell, "sub 0 keeps the parent cell id")
    assert(sub0Ids.map(storedCells).size == 1 && sub1Ids.map(storedCells).size == 1
      && storedCells(sub1Ids.head) != targetCell,
      "members partition exactly into the two subs")
    val c0 = afterMap(sub0Cell)
    val c1 = afterMap(storedCells(sub1Ids.head))
    assert(c0 == quantMean(sub0Ids) && c1 == quantMean(sub1Ids),
      "sub-centroids must equal the sim_cell_split quantized means")
    // occupancies on the published table match the partition sizes
    val occ = after.map(t => t._1 -> t._3).toMap
    assert(occ(sub0Cell) == sub0Ids.size &&
      occ(storedCells(sub1Ids.head)) == sub1Ids.size)
  }

  test("split flags mirror sim_incremental_assign on the same fixture") {
    // ingest the SAME 10% delta the registry query models; the cells
    // the operator splits must be exactly the query's needs_split set
    // the query computes centroids in ONE shot (label means, no Lloyd
    // rounds), so build the matching index with rounds = 0
    val out0 = tmp("mirror0")
    IvfMaintenance.build(spark, embeddings.where(col("vec_id") % 10 =!= 7),
      out0, rounds = 0)
    val flaggedByQuery = SparkEntry.queries("sim_incremental_assign")(spark, sf)
      .where(col("needs_split") === 1).select("c_label")
      .collect().map(_.getLong(0)).toSet
    val r = IvfMaintenance.ingest(spark,
      embeddings.where(col("vec_id") % 10 === 7), out0)
    assert(r.nSplit == flaggedByQuery.size,
      s"operator split ${r.nSplit} cells, query flags $flaggedByQuery")
  }
}
