package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused AllPairsCosine operator must be a drop-in replacement for
  * the BroadcastNestedLoopJoin formulation it displaced: identical rows
  * (same fold order → bit-identical cosines), and the plan shape the
  * design promises (custom exec over a BroadcastExchange, no BNLJ). */
class AllPairsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  import graft.functions.VectorFunctions

  private def unit() = {
    VectorFunctions.register(spark)
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), expr("cast(embedding as array<double>)").as("e"))
      .withColumn("nrm", sqrt(expr("graft_dot(e, e)")))
      .select(col("vec_id"), expr("transform(e, x -> x / nrm)").as("u"))
  }

  test("fused operator matches the BNLJ formulation bit-for-bit") {
    val u = unit()
    val a = u.select(col("vec_id").as("id_a"), col("u").as("ua"))
    val b = u.select(col("vec_id").as("id_b"), col("u").as("ub"))
    val fused = graft.plans.GraftOps.allPairsCosine(a, b, 0.35, ltOnly = true)
      .select("id_a", "id_b", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val bnlj = broadcast(a).join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), expr("graft_dot(ua, ub)").as("cos"))
      .where(col("cos") >= 0.35).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fused.nonEmpty)
    assert(fused == bnlj)
  }

  test("ltOnly=false scores every cross pair (query-vs-corpus mode)") {
    val u = unit()
    val q = u.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("u").as("uq"))
    val c = u.select(col("vec_id").as("cid"), col("u").as("uc"))
    val got = graft.plans.GraftOps.allPairsCosine(c, q, -2.0, ltOnly = false)
    // threshold -2 admits every pair: |corpus| × |queries| exactly
    assert(got.count() == u.count() * 3)
    // self-pair of a unit vector scores 1.0 (regression for fold order)
    val self = got.where(col("cid") === col("qid")).select("cos")
      .collect().map(_.getDouble(0))
    assert(self.length == 3 && self.forall(v => math.abs(v - 1.0) < 1e-12))
  }

  test("ragged dimensions take the scalar fallback and still match BNLJ bit-for-bit") {
    // every fixture embedding shares one dimension, so the uniform
    // blocked kernel covers all oracle traffic — this pins the
    // flat==null / va.length!=d scalar branch (min-length fold, lt
    // binary-search start) against the reference formulation
    import spark.implicits._
    VectorFunctions.register(spark)
    val raw = Seq(
      (1L, Array(1.0, 0.0, 0.0)),
      (2L, Array(0.6, 0.8)), // shorter: min-length fold engages
      (3L, Array(0.0, 1.0, 0.0)),
      (4L, Array(0.5, 0.5, 0.5, 0.5)), // longer
      (5L, Array(0.9, 0.1, 0.2)))
    val a = raw.toDF("id_a", "ua")
    val b = raw.toDF("id_b", "ub")
    for (lt <- Seq(true, false)) {
      val fused = graft.plans.GraftOps.allPairsCosine(a, b, 0.1, ltOnly = lt)
        .select("id_a", "id_b", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val cond = if (lt) col("id_a") < col("id_b") else lit(true)
      val bnlj = broadcast(a).join(b, cond)
        .select(col("id_a"), col("id_b"), expr("graft_dot(ua, ub)").as("cos"))
        .where(col("cos") >= 0.1).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fused.nonEmpty, s"lt=$lt produced no rows")
      assert(fused == bnlj, s"lt=$lt mismatch: ${fused.diff(bnlj)} vs ${bnlj.diff(fused)}")
    }
  }

  test("plan is the fused exec over a broadcast, no nested-loop join") {
    val u = unit()
    val a = u.select(col("vec_id").as("id_a"), col("u").as("ua"))
    val b = u.select(col("vec_id").as("id_b"), col("u").as("ub"))
    val p = graft.plans.GraftOps.allPairsCosine(a, b, 0.35, ltOnly = true)
      .queryExecution.executedPlan.toString
    assert(p.contains("AllPairsCosine"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
