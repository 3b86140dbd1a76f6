package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the fixed-point quality-classifier trainer —
  * the oracle compare proves Spark and DuckDB agree; this spec proves
  * the shared semantics are the GD they claim to be, by re-running the
  * training loop in plain Scala on the collected feature rows. */
class ClassifierSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** driver-side replication of the exact fixed-point GD. */
  private def replicate(): (Array[Array[Long]], Seq[(String, Array[Long], Long)]) = {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rows = docs.select(col("source"),
      lit(1000L), expr("least(n_chars, 2000) * 1000 div 2000"),
      expr("(length(text) - length(replace(text, ' ', ''))) * 1000 div greatest(n_chars, 1)"),
      expr("(n_chars - length(replace(replace(replace(replace(text," +
        " '.', ''), ',', ''), '!', ''), '?', ''))) * 1000 div greatest(n_chars, 1)"),
      expr("length(regexp_replace(text, '[^A-Z]', '')) * 1000 div greatest(n_chars, 1)"))
      .collect()
      .map(r => (r.getString(0),
        Array.tabulate(5)(j => r.getLong(j + 1)),
        if (r.getString(0) == "src0" || r.getString(0) == "src1") 1L else 0L))
      .toSeq
    val n = rows.size.toLong
    val w = Array.fill(5)(0L)
    val traj = (1 to 3).map { _ =>
      val g = Array.fill(5)(0L)
      rows.foreach { case (_, f, y) =>
        val m = (0 until 5).map(j => w(j) * f(j)).sum
        val p = math.min(math.max(500000L + m, 0L), 1000000L)
        val err = p - 1000000L * y
        for (j <- 0 until 5) g(j) += err * f(j)
      }
      for (j <- 0 until 5) w(j) -= g(j) / (n * 1000000L)
      w.clone()
    }.toArray
    (traj, rows)
  }

  test("t_clf_train: distributed GD matches a driver-side replication exactly") {
    val got = run("t_clf_train").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.size == 15)
    val (traj, _) = replicate()
    val names = Seq("bias", "len", "space", "punct", "upper")
    for (e <- 1 to 3; j <- 0 until 5)
      assert(got((e, names(j))) == traj(e - 1)(j),
        s"epoch $e weight ${names(j)} drifted")
    // training moved: the 80/20 class imbalance pushes the bias down
    assert(traj(0)(0) < 0, "bias should go negative on first epoch")
    assert(traj.map(_.toSeq).distinct.size > 1, "weights should keep moving")
  }

  test("t_filter_agreement: quadrants partition docs, marginals match the other audits") {
    val rows = run("t_filter_agreement").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val parts = Seq("n_both", "n_clf_only", "n_rules_only", "n_neither")
        .map(r.getAs[Long](_)).sum
      assert(parts == r.getAs[Long]("n_docs"),
        s"agreement quadrants must partition the docs: $r")
    }
    // classifier marginal (both + clf_only) must equal t_clf_score's
    // predicted positives, source by source
    val clfPos = run("t_clf_score").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_pred_pos")).toMap
    rows.foreach { r =>
      val got = r.getAs[Long]("n_both") + r.getAs[Long]("n_clf_only")
      assert(got == clfPos(r.getString(0)),
        s"clf marginal drifted from t_clf_score for ${r.getString(0)}")
    }
    // rule marginal must equal the funnel's final survivor count
    val funnelOut = run("t_rule_funnel").collect()
      .find(_.getAs[Int]("stage") == 4).get.getAs[Long]("n_out")
    assert(rows.map(r => r.getAs[Long]("n_both") + r.getAs[Long]("n_rules_only")).sum
      == funnelOut, "rule marginal drifted from t_rule_funnel")
  }

  test("t_clf_score: per-source profile is consistent with direct scoring") {
    val prof = run("t_clf_score").collect()
    val (traj, rows) = replicate()
    val w = traj.last
    val bySrc = rows.groupBy(_._1)
    assert(prof.length == bySrc.size)
    prof.foreach { r =>
      val src = r.getString(0)
      val docs = bySrc(src)
      val scores = docs.map { case (_, f, _) =>
        math.min(math.max(500000L + (0 until 5).map(j => w(j) * f(j)).sum, 0L),
          1000000L)
      }
      assert(r.getAs[Long]("n_docs") == docs.size.toLong)
      assert(r.getAs[Long]("sum_score_ppm") == scores.sum)
      assert(r.getAs[Long]("n_pred_pos") == scores.count(_ > 500000L).toLong)
      val agree = docs.zip(scores).count { case ((_, _, y), p) =>
        (if (p > 500000L) 1L else 0L) == y
      }
      assert(r.getAs[Long]("n_agree") == agree.toLong)
    }
  }
}
