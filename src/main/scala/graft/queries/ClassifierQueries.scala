package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Quality-classifier training — the CCNet/DCLM curation stage: fit a
  * linear classifier where the POSITIVE class is a trusted high-quality
  * source slice (here src0/src1, standing in for "Wikipedia/books") and
  * score every document with it, so downstream filtering can threshold
  * on the learned quality probability.
  *
  * Training is batch gradient descent with a HARD-SIGMOID link
  * (clamp(0.5 + m, 0, 1) — the standard quantized-training surrogate),
  * run entirely in FIXED-POINT integer arithmetic: features are
  * per-mille integers, probabilities per-million integers, weights
  * integer "ppm-slope" units, and the learning-rate division is
  * truncating integer division (Spark `div` == DuckDB `//` == Java `/`
  * on longs — all truncate toward zero, verified). No transcendental is
  * evaluated anywhere, so Spark and the DuckDB oracle are bit-exact by
  * construction, not by libm luck.
  *
  * Scale shape (the reason this is THE way to train a filter model on
  * 100 TB): the feature map is a narrow per-row projection fused into
  * the parquet scan by whole-stage codegen; each epoch is ONE
  * map-side-combinable global aggregation producing a single 6-column
  * row (the 5 gradient sums + n); the model lives on the driver between
  * epochs exactly like MLlib's GD loop and is re-broadcast as literals.
  * Nothing but 48-byte partials ever crosses the network; doc bodies
  * never shuffle. Gradient sums stay in range: |err| <= 1e6, f <= 1e3,
  * so a 1e9-doc corpus peaks at 1e18 < Long.MaxValue.
  */
object ClassifierQueries {
  import Tables.t

  private val E = 3 // fixed GD epochs (unrolled in the DuckDB oracle)
  private val FeatNames = Seq("bias", "len", "space", "punct", "upper")

  /** Per-doc integer features (per-mille scales) + weak label. */
  private def feats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      col("source"),
      lit(1000L).as("f0"),
      expr("least(n_chars, 2000) * 1000 div 2000").as("f1"),
      expr("(length(text) - length(replace(text, ' ', ''))) * 1000" +
        " div greatest(n_chars, 1)").as("f2"),
      expr("(n_chars - length(replace(replace(replace(replace(text," +
        " '.', ''), ',', ''), '!', ''), '?', ''))) * 1000" +
        " div greatest(n_chars, 1)").as("f3"),
      expr("length(regexp_replace(text, '[^A-Z]', '')) * 1000" +
        " div greatest(n_chars, 1)").as("f4"),
      expr("CAST(source IN ('src0', 'src1') AS BIGINT)").as("y"))

  /** hard-sigmoid probability in ppm for weight literals `w`. */
  private def pPpm(w: Array[Long]) = {
    val margin = (0 until 5).map(j => col(s"f$j") * lit(w(j)))
      .reduce(_ + _)
    least(greatest(lit(500000L) + margin, lit(0L)), lit(1000000L))
  }

  /** E epochs of distributed GD; returns the per-epoch weight
    * trajectory. One 1-row aggregate collect per epoch — the model is
    * 5 longs, the gradient is computed on the cluster. */
  private def train(s: SparkSession, dir: String): (DataFrame, Array[Array[Long]]) = {
    val f = feats(s, dir).cache()
    val w = Array.fill(5)(0L)
    val traj = (1 to E).map { _ =>
      val err = (pPpm(w) - col("y") * lit(1000000L)).as("err")
      val sums = f.select(err, col("f0"), col("f1"), col("f2"),
          col("f3"), col("f4"))
        .agg(count(lit(1)).as("n"),
          sum(col("err") * col("f0")).as("g0"),
          sum(col("err") * col("f1")).as("g1"),
          sum(col("err") * col("f2")).as("g2"),
          sum(col("err") * col("f3")).as("g3"),
          sum(col("err") * col("f4")).as("g4"))
        .head()
      val n = sums.getLong(0)
      for (j <- 0 until 5)
        w(j) -= sums.getLong(j + 1) / (n * 1000000L) // trunc-toward-zero
      w.clone()
    }.toArray
    (f, traj)
  }

  /** Shared oracle fragments: the feature CTE and one unrolled epoch.
    * wRefs are SQL expressions for the incoming weights. */
  private val FeatCte =
    """f AS (SELECT doc_id, source, CAST(1000 AS BIGINT) AS f0,
      |  LEAST(n_chars, 2000) * 1000 // 2000 AS f1,
      |  (length(text) - length(replace(text, ' ', ''))) * 1000
      |    // GREATEST(n_chars, 1) AS f2,
      |  (n_chars - length(replace(replace(replace(replace(text,
      |    '.', ''), ',', ''), '!', ''), '?', ''))) * 1000
      |    // GREATEST(n_chars, 1) AS f3,
      |  length(regexp_replace(text, '[^A-Z]', '', 'g')) * 1000
      |    // GREATEST(n_chars, 1) AS f4,
      |  CAST(source IN ('src0', 'src1') AS BIGINT) AS y
      |  FROM documents),
      |nn AS (SELECT COUNT(*) AS n FROM f)""".stripMargin

  /** gK/wK CTE pair for epoch k, reading weights from CTE `prev`
    * (columns w0..w4); epoch 1 inlines zero weights. */
  private def epochCtes(k: Int): String = {
    val m =
      if (k == 1) "0"
      else (0 until 5).map(j => s"p.w$j * f.f$j").mkString(" + ")
    val from = if (k == 1) "f" else s"f, w${k - 1} p"
    val gs = (0 until 5).map(j => s"CAST(SUM(e.err * e.f$j) AS BIGINT) AS g$j")
      .mkString(", ")
    val ws = (0 until 5).map { j =>
      val prev = if (k == 1) "0" else s"p.w$j"
      s"$prev - g.g$j // (nn.n * 1000000) AS w$j"
    }.mkString(", ")
    val pj = if (k == 1) "" else ", w" + (k - 1) + " p"
    s"""g$k AS (SELECT $gs FROM (
       |  SELECT LEAST(GREATEST(500000 + ($m), 0), 1000000) - 1000000 * f.y
       |    AS err, f.f0, f.f1, f.f2, f.f3, f.f4 FROM $from) e),
       |w$k AS (SELECT $ws FROM g$k g, nn$pj)""".stripMargin
  }

  private val TrainCtes =
    s"WITH $FeatCte,\n${(1 to E).map(epochCtes).mkString(",\n")}"

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "t_clf_train",
      (s, dir) => {
        val (f, traj) = train(s, dir)
        f.unpersist()
        val rows = for {
          (ws, e) <- traj.zipWithIndex
          (fn, j) <- FeatNames.zipWithIndex
        } yield Row(e + 1, fn, ws(j))
        s.createDataFrame(
          s.sparkContext.parallelize(rows.toSeq, 1),
          new org.apache.spark.sql.types.StructType()
            .add("epoch", "int").add("feature", "string").add("w", "long"))
      },
      Some {
        val epochRows = (1 to E).flatMap { k =>
          FeatNames.zipWithIndex.map { case (fn, j) =>
            s"SELECT CAST($k AS INT) AS epoch, '$fn' AS feature, w$j AS w FROM w$k"
          }
        }
        s"$TrainCtes\n${epochRows.mkString("\nUNION ALL ")}"
      },
      "Quality-filter training: 3 epochs of fixed-point hard-sigmoid GD " +
        "(positives = trusted sources), per-epoch weight trajectory."),

    QueryDef(
      "t_clf_score",
      (s, dir) => {
        // score every doc with the trained model and report the
        // per-source quality profile: docs, summed quality score (ppm),
        // predicted-positive count, and agreement with the weak label.
        // The weights arrive as literals (driver-held model), so the
        // scoring pass is a pure fused map + one |sources|-row agg.
        val (f, traj) = train(s, dir)
        val w = traj.last
        val p = pPpm(w).as("p")
        val out = f.select(col("source"), col("y"), p)
          .select(col("source"), col("y"), col("p"),
            (col("p") > lit(500000L)).cast("long").as("pred"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("p").as("sum_score_ppm"),
            sum("pred").as("n_pred_pos"),
            sum((col("pred") === col("y")).cast("long")).as("n_agree"))
        out
      },
      Some(
        s"""$TrainCtes,
           |sc AS (SELECT f.source, f.y,
           |    LEAST(GREATEST(500000 + (${(0 until 5).map(j => s"w.w$j * f.f$j").mkString(" + ")}), 0),
           |      1000000) AS p
           |  FROM f, w$E w)
           |SELECT source, COUNT(*) AS n_docs,
           |  CAST(SUM(p) AS BIGINT) AS sum_score_ppm,
           |  COUNT(CASE WHEN p > 500000 THEN 1 END) AS n_pred_pos,
           |  COUNT(CASE WHEN (CASE WHEN p > 500000 THEN 1 ELSE 0 END) = y
           |    THEN 1 END) AS n_agree
           |FROM sc GROUP BY source""".stripMargin),
      "Score the corpus with the trained quality filter: per-source " +
        "score mass, predicted positives, weak-label agreement."),

    QueryDef(
      "t_filter_agreement",
      (s, dir) => {
        // Learned-vs-hand-rules agreement audit — the sanity matrix a
        // curation run publishes before swapping its rule cascade for
        // a trained filter: per source, how often the trained
        // classifier and the Gopher-style rule funnel agree to keep,
        // agree to drop, or split. High clf_only = the model keeps
        // what the rules kill (recall gain or noise); high rules_only
        // = the model is stricter than the cascade. Both signals are
        // row-local after training (the classifier scores with
        // literal weights, the rules are integer cross-ratios via the
        // native one-pass MaxFreq), so the whole audit is a fused map
        // plus one |sources|-row combinable aggregation.
        graft.functions.expr.TextExpressions.register(s)
        val (f, traj) = train(s, dir)
        val w = traj.last
        val clf = f.select(col("doc_id"),
          (pPpm(w) > lit(500000L)).cast("int").as("ck"))
        val ws = split(col("text"), " ")
        val rules = t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(ws).as("n"), size(array_distinct(ws)).as("u"),
            (length(col("text")) - (size(ws) - 1)).as("chars"),
            call_function("graft_maxfreq", ws).as("top"))
          .select(col("doc_id"), col("source"),
            (col("n") >= 20 && col("u") * 20 >= col("n") * 7 &&
              col("top") * 25 <= col("n") * 3 &&
              col("chars") <= col("n") * 5).cast("int").as("rk"))
        rules.join(clf, "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(expr("ck * rk")).as("n_both"),
            sum(expr("ck * (1 - rk)")).as("n_clf_only"),
            sum(expr("(1 - ck) * rk")).as("n_rules_only"),
            sum(expr("(1 - ck) * (1 - rk)")).as("n_neither"))
      },
      Some(
        s"""$TrainCtes,
           |rl AS (SELECT doc_id, source,
           |    CAST(n >= 20 AND u * 20 >= n * 7 AND top * 25 <= n * 3
           |      AND chars <= n * 5 AS INT) AS rk
           |  FROM (SELECT doc_id, source,
           |      len(string_split(text, ' ')) AS n,
           |      len(list_distinct(string_split(text, ' '))) AS u,
           |      length(text) - (len(string_split(text, ' ')) - 1) AS chars,
           |      list_max(list_transform(list_distinct(string_split(text, ' ')),
           |        w -> len(list_filter(string_split(text, ' '), x -> x = w)))) AS top
           |    FROM documents)),
           |cf AS (SELECT f.doc_id,
           |    CASE WHEN LEAST(GREATEST(500000 +
           |      (${(0 until 5).map(j => s"w.w$j * f.f$j").mkString(" + ")}), 0),
           |      1000000) > 500000 THEN 1 ELSE 0 END AS ck
           |  FROM f, w$E w)
           |SELECT rl.source, COUNT(*) AS n_docs,
           |  CAST(SUM(cf.ck * rl.rk) AS BIGINT) AS n_both,
           |  CAST(SUM(cf.ck * (1 - rl.rk)) AS BIGINT) AS n_clf_only,
           |  CAST(SUM((1 - cf.ck) * rl.rk) AS BIGINT) AS n_rules_only,
           |  CAST(SUM((1 - cf.ck) * (1 - rl.rk)) AS BIGINT) AS n_neither
           |FROM rl JOIN cf ON rl.doc_id = cf.doc_id
           |GROUP BY rl.source""".stripMargin),
      "Learned-filter vs rule-cascade agreement matrix per source — the " +
        "audit before swapping hand rules for the trained classifier."))
}
