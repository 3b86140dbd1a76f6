package graft.queries

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Scale design (100 TB):
  *   - vectors are L2-normalized ONCE in a prior projection (norm from
  *     one pass, then x/n per element), so every pairwise score is a
  *     single dot product instead of dot + two norms — 3× less float
  *     work on the O(n²) stage, and the normalize stage itself is pure
  *     map (whole-stage codegen, no shuffle);
  *   - brute-force top-k broadcasts the (small) query set and streams
  *     the corpus once — the correctness baseline;
  *   - the scale path is LSH/IVF: sign-bit bucket signatures (zero
  *     float math) and per-label centroids bound the candidate set so
  *     the pairwise join is per-bucket, not corpus²; threshold pairs
  *     would run per-bucket at scale, and the pair join broadcasts the
  *     normalized corpus (MBs — ids + 64 doubles travel, never raw
  *     text/media).
  *
  * Determinism: both engines normalize then fold products sequentially
  * left-to-right, so scores are reproducible bit-for-bit.
  */
object SimilarityQueries {
  import Tables.t

  /** L2-normalized embeddings: one scan, one native pass per row
    * (UnitVector — same ascending fold + divide as the previous
    * norm-column + interpreted transform, bit-identical results). */
  private def unitEmb(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        call_function("graft_unit", asDouble(col("embedding"))).as("u"))
  }

  private val UnitCte =
    """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |un AS (SELECT vec_id, label,
      |  list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS u FROM v)""".stripMargin

  /** Exact 1e-9-ROUND-quantized per-group mean of `v`, folded through
    * [[ExactAgg.chunkedSums]] (long-speed partials, decimal final) —
    * bit-identical to the direct decimal sum, ~3x faster over the
    * posexploded (rows x dims) element table. Per-row magnitude
    * |v|*1e9 stays ~1e9 for unit-scale embeddings, far under the 2^44
    * chunk-safety bound. */
  private def quantMean(
      df: DataFrame,
      keys: Seq[(org.apache.spark.sql.Column, String)],
      v: org.apache.spark.sql.Column,
      as: String,
      cntAs: Option[String] = None): DataFrame = {
    val pre = df.select(
      keys.map { case (c, n) => c.as(n) } :+
        round(v * 1000000000).cast("long").as("_qv"): _*)
    val cnt = cntAs.map(n => col("_cnt").as(n)).toSeq
    ExactAgg.chunkedSums(pre, keys.map(_._2), Seq("_qv"))
      .select(keys.map { case (_, n) => col(n) } ++
        ((col("_qv").cast("double") / 1000000000 / col("_cnt")).as(as) +: cnt): _*)
  }

  /** All (vector, centroid) distances RANKED per vector: rank 1 is the
    * IVF assignment; ranks 2..n are the probe order for nprobe>1
    * search. Distances via the dot identity |x-c|² = x·x - 2x·c + c·c
    * on the codegen'd graft_dot; centroids are exact ROUND-quantized
    * means (broadcast — the centroid table is nlist-sized). */
  private def ivfRanked(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("e"))
    val cents = quantMean(
      e.select(col("label"), posexplode(col("e")).as(Seq("pos", "v"))),
      Seq(col("label") -> "c_label", (col("pos") + 1) -> "dim"),
      col("v"), "cv")
      .groupBy("c_label")
      .agg(array_sort(collect_list(struct(col("dim"), col("cv")))).as("pairs"))
      .select(col("c_label"), transform(col("pairs"), p => p.getField("cv")).as("c"))
    val scored = e.join(broadcast(cents))
      .select(col("vec_id"), col("label"), col("c_label"),
        (dot(col("e"), col("e")) - lit(2.0) * dot(col("e"), col("c")) +
          dot(col("c"), col("c"))).as("dist2"))
    // Every consumer reads rk = 1 (the assignment) or rk <= 2 (the
    // nprobe=2 probe lists), so the corpus × nlist scored frame is
    // heap-pruned to 2 rows per vector BEFORE any exchange or sort
    // (TopKPerKey partial+final, the bruteTop5 idiom) — the old
    // row_number window sorted every vector's full nlist candidate
    // list, a corpus-sized sort that grows with nlist at scale (r17).
    // (dist2, c_label) is a total order per vector (one row per
    // centroid), so the surviving rows and their ranks are identical.
    val top2 = graft.plans.GraftOps.topKPerKey(
      scored, Seq("vec_id"), 2, "+dist2", "+c_label")
    val w = Window.partitionBy("vec_id").orderBy(col("dist2").asc, col("c_label").asc)
    top2.withColumn("rk", row_number().over(w))
  }

  /** IVF coarse assignment (shared by sim_ivf_assign / sim_ivf_knn):
    * each vector's nearest centroid. */
  private def ivfAssigned(s: SparkSession, dir: String): DataFrame =
    ivfRanked(s, dir).where(col("rk") === 1)
      .select(col("vec_id"), col("label"), col("c_label").as("assigned"), col("dist2"))

  /** The sim_ivf_assign oracle, reusable as a CTE prefix. */
  private val IvfAssignCte =
    """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |un AS (SELECT vec_id, label,
      |  list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS u FROM v),
      |cd AS (SELECT label AS c_label, CAST(dim AS INT) AS dim,
      |  CAST(SUM(CAST(ROUND(x * 1000000000) AS BIGINT)) AS DOUBLE) / 1000000000 / COUNT(*) AS cv
      |  FROM (SELECT label, unnest(range(1, 65)) AS dim,
      |        unnest(CAST(embedding AS DOUBLE[])) AS x FROM embeddings)
      |  GROUP BY label, dim),
      |cent AS (SELECT c_label, list(cv ORDER BY dim) AS c FROM cd GROUP BY c_label),
      |iscore AS (SELECT vec_id, label, c_label,
      |  list_dot_product(e, e) - 2.0 * list_dot_product(e, c) + list_dot_product(c, c) AS dist2
      |  FROM v CROSS JOIN cent),
      |assign AS (SELECT vec_id, label, c_label AS assigned, dist2 FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) AS rk
      |  FROM iscore) WHERE rk = 1)""".stripMargin

  /** Exact cosine top-5 per query vector (vec_id < 20) — the ground
    * truth sim_recall_eval measures the ANN paths against. */
  private def bruteTop5(s: SparkSession, dir: String): DataFrame = {
    // both custom operators composed: the fused AllPairsCosine exec
    // scores corpus × broadcast-queries with primitive-array dots (no
    // BNLJ, no joined-row materialization), then TopKPerKey heap-prunes
    // each scan partition to 5 rows per query BEFORE the shuffle — the
    // exchange carries ≤ 5·|queries|·partitions rows and nothing is
    // ever fully sorted. The final row_number window runs over ≤ 5
    // rows per query, only to materialize the rank column.
    val corpus = unitEmb(s, dir)
      .select(col("vec_id").as("neighbor_id"), col("u"))
    val q = unitEmb(s, dir)
      .where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("u").as("qu"))
    val scored = graft.plans.GraftOps
      .allPairsCosine(corpus, q, -2.0, ltOnly = false)
      .where(col("neighbor_id") =!= col("query_id"))
    val top = graft.plans.GraftOps.topKPerKey(
      scored, Seq("query_id"), 5, "-cos", "+neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    top
      .withColumn("rk", row_number().over(w))
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rk").cast("int").as("rk"))
  }

  /** IVF nprobe=1 top-5 per query vector (shared by sim_ivf_knn and
    * sim_recall_eval). */
  private def ivfTop5(s: SparkSession, dir: String): DataFrame = {
    val u = unitEmb(s, dir).select(col("vec_id"), col("u"))
    // cached: au feeds BOTH sides of the cell join, and recomputing
    // it would run the whole centroid aggregation + per-vector
    // window twice (Catalyst does not dedupe common subplans).
    // cache() over a checkpoint keeps construction lazy, the plan
    // inspectable, and the frame recomputable on executor loss; the
    // harness clears caches between queries.
    val au = ivfAssigned(s, dir).select(col("vec_id"), col("assigned"))
      .join(u, "vec_id").cache()
    au.count() // populate BEFORE the join's two legs race it (see NOTES)
    val q = au.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("assigned").as("cell"), col("u").as("qu"))
    val cands = au.select(
      col("vec_id").as("neighbor_id"), col("assigned").as("cell"), col("u").as("nu"))
    val scored = cands.join(broadcast(q), "cell")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), dot(col("qu"), col("nu")).as("cos"))
    // heap-prune each query's cell-bounded candidate list to 5 BEFORE
    // the exchange/sort (bruteTop5 idiom; r17) — the window then ranks
    // only the survivors; rows and ranks identical ((cos, neighbor_id)
    // is a total order)
    val top = graft.plans.GraftOps.topKPerKey(
      scored, Seq("query_id"), 5, "-cos", "+neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    top.withColumn("rk", row_number().over(w))
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rk").cast("int").as("rk"))
  }

  /** IVF nprobe=2 top-5 per query (shared by sim_ivf_knn_probe2 and
    * sim_recall_eval_probe2). nprobe=2 — the recall/latency knob of IVF
    * search: each query probes its TWO nearest cells (ranked by
    * centroid distance) and the candidate set is the union of those
    * cells. The plan stays cell-bounded: candidates join on the cell
    * key against the broadcast (query, probed-cell) list — one corpus
    * row never scores against a query whose probe list misses its
    * cell, and a corpus vector lives in exactly one cell so the union
    * is duplicate-free by construction. */
  private def ivfTop5Probe2(s: SparkSession, dir: String): DataFrame = {
    val u = unitEmb(s, dir).select(col("vec_id"), col("u"))
    // one ranked centroid pass serves both the corpus assignment
    // (rk=1) and the query probe lists (rk<=2)
    val ranked = ivfRanked(s, dir)
      .select(col("vec_id"), col("c_label"), col("rk"))
      .cache()
    ranked.count() // populate BEFORE the probe/candidate legs race it
    val probes = ranked.where(col("vec_id") < 20 && col("rk") <= 2)
      .select(col("vec_id").as("query_id"), col("c_label").as("cell"))
      .join(u.select(col("vec_id").as("query_id"), col("u").as("qu")), "query_id")
    val cands = ranked.where(col("rk") === 1)
      .select(col("vec_id").as("neighbor_id"), col("c_label").as("cell"))
      .join(u.select(col("vec_id").as("neighbor_id"), col("u").as("nu")), "neighbor_id")
    val scored = cands.join(broadcast(probes), "cell")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), dot(col("qu"), col("nu")).as("cos"))
    // heap-prune before the exchange/sort (bruteTop5 idiom; r17) —
    // identical rows and ranks, no full candidate-list sort
    val top = graft.plans.GraftOps.topKPerKey(
      scored, Seq("query_id"), 5, "-cos", "+neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    top.withColumn("rk", row_number().over(w))
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rk").cast("int").as("rk"))
  }

  /** Per-(vector, subspace, codeword) squared distances — the shared PQ
    * primitive (codebook build + scoring): 64-dim vectors split into 8
    * 8-dim subspaces, per-(subspace, label) exact-mean codebooks
    * (broadcast, 80 rows), |sub − c|² via the dot identity. Consumed by
    * sim_pq_adc_knn (linear code scan) and sim_ivfpq_knn (cell-pruned
    * scan — the full IVF-PQ composite). */
  private def pqScored(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val subs = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("e"))
      .select(col("vec_id"), col("label"), posexplode(
        array((0 until 8).map(m => slice(col("e"), m * 8 + 1, 8)): _*))
        .as(Seq("m", "sub")))
      .cache() // shared: codebook build + assignment + query tables
    subs.count() // populate BEFORE the codebook/probe stages race it
    val cb = quantMean(
      subs.select(col("label"), col("m"), posexplode(col("sub")).as(Seq("pos", "x"))),
      Seq(col("m") -> "m", col("label") -> "cw", (col("pos") + 1) -> "dim"),
      col("x"), "cv")
      .groupBy("m", "cw")
      .agg(array_sort(collect_list(struct(col("dim"), col("cv")))).as("pairs"))
      .select(col("m"), col("cw"),
        transform(col("pairs"), p => p.getField("cv")).as("c"))
    subs.join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"), col("cw"),
        (dot(col("sub"), col("sub")) - lit(2.0) * dot(col("sub"), col("c")) +
          dot(col("c"), col("c"))).as("d2"))
  }

  /** The PQ oracle CTE chain (assumes a `v` CTE is already defined):
    * subspaces → codebooks → assignment scores → codes → per-query
    * distance tables. */
  private val PqCtes =
    """subs AS (SELECT vec_id, label, m, list_slice(e, m*8+1, m*8+8) AS sub
      |  FROM v, (SELECT unnest(range(0, 8)) AS m)),
      |cbd AS (SELECT m, label AS cw, CAST(dim AS INT) AS dim,
      |  CAST(SUM(CAST(ROUND(x * 1000000000) AS BIGINT)) AS DOUBLE) / 1000000000 / COUNT(*) AS cv
      |  FROM (SELECT vec_id, label, m, unnest(range(1, 9)) AS dim, unnest(sub) AS x FROM subs)
      |  GROUP BY m, label, dim),
      |cb AS (SELECT m, cw, list(cv ORDER BY dim) AS c FROM cbd GROUP BY m, cw),
      |ascore AS (SELECT s.vec_id, s.m, cb.cw,
      |  list_dot_product(sub, sub) - 2.0 * list_dot_product(sub, c) + list_dot_product(c, c) AS d2
      |  FROM subs s JOIN cb ON s.m = cb.m),
      |codes AS (SELECT vec_id, m, cw AS code FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, cw) AS rk FROM ascore)
      |  WHERE rk = 1),
      |qd AS (SELECT vec_id AS query_id, m, cw, d2 FROM ascore WHERE vec_id < 20)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sim_knn_bruteforce",
      (s, dir) => bruteTop5(s, dir),
      Some(
        s"""$UnitCte,
           |p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           |  list_dot_product(a.u, b.u) AS cos
           |  FROM (SELECT * FROM un WHERE vec_id < 20) a JOIN un b ON a.vec_id <> b.vec_id)
           |SELECT query_id, neighbor_id, cos, CAST(rk AS INT) AS rk FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |  FROM p) WHERE rk <= 5""".stripMargin),
      "Brute-force cosine top-5 for 20 query vectors (broadcast queries)."),

    QueryDef(
      "sim_threshold_pairs",
      (s, dir) => {
        // fused custom operator (plans/AllPairsCosine.scala): pair
        // enumeration + primitive-array dot + threshold in one loop —
        // replaces the BroadcastNestedLoopJoin formulation Spark can't
        // codegen. Same fold order as graft_dot → result unchanged.
        val u = unitEmb(s, dir)
        val a = u.select(col("vec_id").as("id_a"), col("u").as("ua"))
        val b = u.select(col("vec_id").as("id_b"), col("u").as("ub"))
        graft.plans.GraftOps.allPairsCosine(a, b, 0.35, ltOnly = true)
          .select(col("id_a"), col("id_b"), col("cos"))
      },
      Some(
        s"""$UnitCte
           |SELECT id_a, id_b, cos FROM (
           |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, list_dot_product(a.u, b.u) AS cos
           |  FROM un a JOIN un b ON a.vec_id < b.vec_id)
           |WHERE cos >= 0.35""".stripMargin),
      "Embedding-cosine near-duplicate pairs (cos >= 0.35)."),

    QueryDef(
      "sim_signbit_lsh",
      (s, dir) =>
        t(s, dir, "embeddings")
          .select(
            col("vec_id"),
            signBits(col("embedding")).as("sig"))
          .select(col("vec_id"), col("sig"),
            substring(col("sig"), 1, 16).as("bucket")),
      Some(
        """SELECT vec_id,
          |array_to_string(list_transform(embedding, x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), '') AS sig,
          |substr(array_to_string(list_transform(embedding, x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), ''), 1, 16) AS bucket
          |FROM embeddings""".stripMargin),
      "Sign-bit LSH signatures + 16-bit bucket keys (ANN scale path)."),

    QueryDef(
      "sim_lsh_bucket_sizes",
      (s, dir) =>
        t(s, dir, "embeddings")
          .select(substring(signBits(col("embedding")), 1, 8).as("bucket"))
          .groupBy("bucket")
          .agg(count("*").as("n_vecs")),
      Some(
        """SELECT substr(array_to_string(list_transform(embedding,
          |  x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), ''), 1, 8) AS bucket,
          |COUNT(*) AS n_vecs FROM embeddings GROUP BY 1""".stripMargin),
      "LSH bucket occupancy (8-bit prefix) — skew check for the ANN path."),

    QueryDef(
      "sim_ivf_assign",
      (s, dir) => ivfAssigned(s, dir),
      Some(s"""$IvfAssignCte
           |SELECT vec_id, label, assigned, dist2 FROM assign""".stripMargin),
      "IVF coarse assignment: nearest exact-mean centroid per vector."),

    QueryDef(
      "sim_bucketed_pairs",
      (s, dir) => {
        // The scale path for threshold similarity: multi-band sign-bit
        // LSH (8 bands × 8 bits, OR across bands for recall) generates
        // candidates with a per-(band,bucket) equi-join — shuffle keyed
        // on the bucket, never corpus² — then exact cosine re-ranks
        // only the candidates (~3% of all pairs on this fixture). Band
        // width tunes the trade-off: wider bands prune harder but lose
        // recall at moderate thresholds. sim_threshold_pairs stays as
        // the documented small-n exact baseline.
        val u = unitEmb(s, dir)
        val bands = t(s, dir, "embeddings")
          .select(col("vec_id"), signBits(col("embedding")).as("sig"))
          .select(col("vec_id"), posexplode(
            array((0 until 8).map(b => substring(col("sig"), b * 8 + 1, 8)): _*))
            .as(Seq("band", "bkey")))
          // both sides of the self-join; cache() (lazy, plan-visible,
          // recomputable on executor loss) — the harness clears caches
          // between queries, bounding long-session storage
          .cache()
        bands.count() // populate BEFORE the self-join legs race it
        val cand = bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
              col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
          .distinct()
        cand
          .join(u.select(col("vec_id").as("id_a"), col("u").as("ua")), "id_a")
          .join(u.select(col("vec_id").as("id_b"), col("u").as("ub")), "id_b")
          .select(col("id_a"), col("id_b"), dot(col("ua"), col("ub")).as("cos"))
          .where(col("cos") >= 0.35)
      },
      Some(
        s"""$UnitCte,
           |sig AS (SELECT vec_id, array_to_string(list_transform(embedding,
           |  x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), '') AS sig FROM embeddings),
           |bands AS (SELECT vec_id, b AS band, substr(sig, CAST(b*8+1 AS INT), 8) AS bkey
           |  FROM sig, (SELECT unnest(range(0, 8)) AS b)),
           |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
           |  FROM bands x JOIN bands y
           |  ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id)
           |SELECT id_a, id_b, cos FROM (
           |  SELECT id_a, id_b, list_dot_product(a.u, b.u) AS cos
           |  FROM cand JOIN un a ON cand.id_a = a.vec_id JOIN un b ON cand.id_b = b.vec_id)
           |WHERE cos >= 0.35""".stripMargin),
      "Bucketed near-dup pairs: multi-band sign-bit LSH candidates + exact cosine re-rank."),

    QueryDef(
      "sim_ivf_knn",
      // The scale path for kNN: search only the query's IVF cell
      // (nprobe=1) — candidate set bounded by cell size, join keyed
      // on the cell, no corpus scan per query.
      (s, dir) => ivfTop5(s, dir),
      Some(
        s"""$IvfAssignCte,
           |au AS (SELECT a.vec_id, a.assigned, un.u FROM assign a JOIN un ON a.vec_id = un.vec_id),
           |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |  list_dot_product(q.u, c.u) AS cos
           |  FROM au q JOIN au c ON q.assigned = c.assigned AND q.vec_id <> c.vec_id
           |  WHERE q.vec_id < 20)
           |SELECT query_id, neighbor_id, cos, CAST(rk AS INT) AS rk FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |  FROM p) WHERE rk <= 5""".stripMargin),
      "IVF-cell kNN (nprobe=1): top-5 cosine within the query's coarse cell."),

    QueryDef(
      "sim_ivf_knn_probe2",
      (s, dir) => ivfTop5Probe2(s, dir),
      Some(
        s"""$IvfAssignCte,
           |qc AS (SELECT vec_id AS query_id, c_label AS cell FROM (
           |  SELECT vec_id, c_label,
           |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) AS rk
           |  FROM iscore WHERE vec_id < 20) WHERE rk <= 2),
           |au AS (SELECT a.vec_id, a.assigned, un.u FROM assign a JOIN un ON a.vec_id = un.vec_id),
           |p AS (SELECT qc.query_id, c.vec_id AS neighbor_id,
           |  list_dot_product(q.u, c.u) AS cos
           |  FROM qc JOIN au q ON q.vec_id = qc.query_id
           |  JOIN au c ON c.assigned = qc.cell AND c.vec_id <> qc.query_id)
           |SELECT query_id, neighbor_id, cos, CAST(rk AS INT) AS rk FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |  FROM p) WHERE rk <= 5""".stripMargin),
      "IVF kNN with nprobe=2: per-query union of the two nearest cells, still cell-bounded."),

    QueryDef(
      "sim_recall_eval",
      (s, dir) => {
        // Recall@5 of the IVF (nprobe=1) path against brute-force
        // ground truth, per query — the evaluation every ANN
        // deployment needs before trusting an index: it turns the
        // nprobe/nlist knobs into a measured quality number instead of
        // a hope. At 100 TB this runs on a SAMPLE of queries (here the
        // fixed vec_id < 20 query set): ground truth is one broadcast
        // corpus pass per sampled query, amortized over index life.
        val bf = bruteTop5(s, dir).select("query_id", "neighbor_id")
        val iv = ivfTop5(s, dir)
          .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
        bf.join(iv, Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(count(col("hit")).cast("int").as("n_hits"),
            (count(col("hit")) / lit(5.0)).as("recall_at_5"))
      },
      Some(
        s"""$IvfAssignCte,
           |bfp AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           |  list_dot_product(a.u, b.u) AS cos
           |  FROM (SELECT * FROM un WHERE vec_id < 20) a JOIN un b ON a.vec_id <> b.vec_id),
           |bf AS (SELECT query_id, neighbor_id FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |  FROM bfp) WHERE rk <= 5),
           |au AS (SELECT a.vec_id, a.assigned, un.u FROM assign a JOIN un ON a.vec_id = un.vec_id),
           |ivp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |  list_dot_product(q.u, c.u) AS cos
           |  FROM au q JOIN au c ON q.assigned = c.assigned AND q.vec_id <> c.vec_id
           |  WHERE q.vec_id < 20),
           |iv AS (SELECT query_id, neighbor_id FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |  FROM ivp) WHERE rk <= 5)
           |SELECT bf.query_id, CAST(COUNT(iv.neighbor_id) AS INT) AS n_hits,
           |  COUNT(iv.neighbor_id) / 5.0 AS recall_at_5
           |FROM bf LEFT JOIN iv
           |  ON bf.query_id = iv.query_id AND bf.neighbor_id = iv.neighbor_id
           |GROUP BY bf.query_id""".stripMargin),
      "Recall@5 of IVF nprobe=1 vs brute-force ground truth per sampled query."),

    QueryDef(
      "sim_recall_eval_probe2",
      (s, dir) => {
        // The second row of the recall/latency table: recall@5 of
        // nprobe=2 against the same brute-force ground truth — together
        // with sim_recall_eval this turns the nprobe knob into a
        // measured quality CURVE (1 vs 2 probed cells), which is how an
        // IVF deployment picks its operating point. Same sampled-query
        // evaluation shape; both sides reuse the shared top-5 helpers.
        val bf = bruteTop5(s, dir).select("query_id", "neighbor_id")
        val iv = ivfTop5Probe2(s, dir)
          .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
        bf.join(iv, Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(count(col("hit")).cast("int").as("n_hits"),
            (count(col("hit")) / lit(5.0)).as("recall_at_5"))
      },
      Some(
        s"""$IvfAssignCte,
           |bfp AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           |  list_dot_product(a.u, b.u) AS cos
           |  FROM (SELECT * FROM un WHERE vec_id < 20) a JOIN un b ON a.vec_id <> b.vec_id),
           |bf AS (SELECT query_id, neighbor_id FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |  FROM bfp) WHERE rk <= 5),
           |qc AS (SELECT vec_id AS query_id, c_label AS cell FROM (
           |  SELECT vec_id, c_label,
           |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) AS rk
           |  FROM iscore WHERE vec_id < 20) WHERE rk <= 2),
           |au AS (SELECT a.vec_id, a.assigned, un.u FROM assign a JOIN un ON a.vec_id = un.vec_id),
           |p AS (SELECT qc.query_id, c.vec_id AS neighbor_id,
           |  list_dot_product(q.u, c.u) AS cos
           |  FROM qc JOIN au q ON q.vec_id = qc.query_id
           |  JOIN au c ON c.assigned = qc.cell AND c.vec_id <> qc.query_id),
           |iv2 AS (SELECT query_id, neighbor_id FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |  FROM p) WHERE rk <= 5)
           |SELECT bf.query_id, CAST(COUNT(iv2.neighbor_id) AS INT) AS n_hits,
           |  COUNT(iv2.neighbor_id) / 5.0 AS recall_at_5
           |FROM bf LEFT JOIN iv2
           |  ON bf.query_id = iv2.query_id AND bf.neighbor_id = iv2.neighbor_id
           |GROUP BY bf.query_id""".stripMargin),
      "Recall@5 of IVF nprobe=2 vs brute force: the second point of the recall/latency curve."),

    QueryDef(
      "sim_hamming_rerank",
      (s, dir) => {
        // Integer-only re-rank of LSH candidates: same banded candidate
        // generation as sim_bucketed_pairs, but scored by full-signature
        // Hamming distance via the codegen'd graft_hamming expression —
        // no float touched, the cheap first re-rank tier before exact
        // cosine on what survives.
        graft.functions.VectorFunctions.register(s)
        val sigs = t(s, dir, "embeddings")
          .select(col("vec_id"), signBits(col("embedding")).as("sig"))
          // bands + both re-rank join sides
          .cache()
        sigs.count() // populate BEFORE the band/re-rank legs race it
        val bands = sigs.select(col("vec_id"), posexplode(
            array((0 until 8).map(b => substring(col("sig"), b * 8 + 1, 8)): _*))
            .as(Seq("band", "bkey")))
        val cand = bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
              col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
          .distinct()
        cand
          .join(sigs.select(col("vec_id").as("id_a"), col("sig").as("sa")), "id_a")
          .join(sigs.select(col("vec_id").as("id_b"), col("sig").as("sb")), "id_b")
          .select(col("id_a"), col("id_b"),
            call_function("graft_hamming", col("sa"), col("sb")).as("hamming"))
          .where(col("hamming") <= 20)
      },
      Some(
        """WITH sig AS (SELECT vec_id, array_to_string(list_transform(embedding,
          |  x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), '') AS sig FROM embeddings),
          |bands AS (SELECT vec_id, b AS band, substr(sig, CAST(b*8+1 AS INT), 8) AS bkey
          |  FROM sig, (SELECT unnest(range(0, 8)) AS b)),
          |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
          |  FROM bands x JOIN bands y
          |  ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id)
          |SELECT id_a, id_b, CAST(length(list_filter(range(1, 65),
          |  i -> substr(a.sig, CAST(i AS INT), 1) <> substr(b.sig, CAST(i AS INT), 1))) AS INT) AS hamming
          |FROM cand JOIN sig a ON cand.id_a = a.vec_id JOIN sig b ON cand.id_b = b.vec_id
          |WHERE length(list_filter(range(1, 65),
          |  i -> substr(a.sig, CAST(i AS INT), 1) <> substr(b.sig, CAST(i AS INT), 1))) <= 20""".stripMargin),
      "Integer Hamming re-rank of banded LSH candidates (codegen'd graft_hamming)."),

    QueryDef(
      "dedup_embedding_near",
      (s, dir) => {
        // Embedding-cosine near-dup DEDUP over documents (vec_id keys
        // doc_id's embedding): candidates come from the same banded
        // sign-bit LSH as sim_bucketed_pairs — never corpus² — exact
        // cosine confirms, then document metadata joins in for the
        // dedup decision (keeper = lowest doc_id; same_source flags
        // likely mirror-copies vs cross-source near-dups). At 100 TB
        // the doc join is a shuffle on doc_id of the (tiny) confirmed
        // pair set against the pruned (doc_id, source) projection.
        val u = unitEmb(s, dir)
        val bands = t(s, dir, "embeddings")
          .select(col("vec_id"), signBits(col("embedding")).as("sig"))
          .select(col("vec_id"), posexplode(
            array((0 until 8).map(b => substring(col("sig"), b * 8 + 1, 8)): _*))
            .as(Seq("band", "bkey")))
          .cache()
        bands.count() // populate BEFORE the self-join legs race it
        val cand = bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
              col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("doc_a"), col("y.vec_id").as("doc_b"))
          .distinct()
        val pairs = cand
          .join(u.select(col("vec_id").as("doc_a"), col("u").as("ua")), "doc_a")
          .join(u.select(col("vec_id").as("doc_b"), col("u").as("ub")), "doc_b")
          .select(col("doc_a"), col("doc_b"), dot(col("ua"), col("ub")).as("cos"))
          .where(col("cos") >= 0.35)
        val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
        pairs
          .join(docs.select(col("doc_id").as("doc_a"), col("source").as("source_a")), "doc_a")
          .join(docs.select(col("doc_id").as("doc_b"), col("source").as("source_b")), "doc_b")
          .select(col("doc_a"), col("doc_b"), col("cos"),
            (col("source_a") === col("source_b")).cast("int").as("same_source"),
            least(col("doc_a"), col("doc_b")).as("keeper"))
      },
      Some(
        s"""$UnitCte,
           |sig AS (SELECT vec_id, array_to_string(list_transform(embedding,
           |  x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), '') AS sig FROM embeddings),
           |bands AS (SELECT vec_id, b AS band, substr(sig, CAST(b*8+1 AS INT), 8) AS bkey
           |  FROM sig, (SELECT unnest(range(0, 8)) AS b)),
           |cand AS (SELECT DISTINCT x.vec_id AS doc_a, y.vec_id AS doc_b
           |  FROM bands x JOIN bands y
           |  ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id),
           |pairs AS (SELECT doc_a, doc_b, cos FROM (
           |  SELECT doc_a, doc_b, list_dot_product(a.u, b.u) AS cos
           |  FROM cand JOIN un a ON cand.doc_a = a.vec_id JOIN un b ON cand.doc_b = b.vec_id)
           |  WHERE cos >= 0.35)
           |SELECT doc_a, doc_b, cos,
           |  CAST(CASE WHEN da.source = db.source THEN 1 ELSE 0 END AS INT) AS same_source,
           |  LEAST(doc_a, doc_b) AS keeper
           |FROM pairs JOIN documents da ON pairs.doc_a = da.doc_id
           |JOIN documents db ON pairs.doc_b = db.doc_id""".stripMargin),
      "Embedding-cosine near-dup dedup over documents: bucketed LSH candidates, exact cosine, keeper election."),

    QueryDef(
      "dedup_semdedup",
      (s, dir) => {
        // SemDeDup-style SEMANTIC dedup (Abbas et al., arXiv:2303.09540):
        // cluster the embedding space with the exact-mean IVF centroids,
        // generate candidate pairs only WITHIN a cell, and among vectors
        // whose cosine exceeds the dup threshold keep the one FARTHEST
        // from its centroid (the paper's keep-low-centroid-similarity
        // rule — it preserves the cluster's diverse tail, where min-id
        // keeper election would keep arbitrary representatives). The
        // per-edge dominance rule — x is dropped iff some dup-neighbor y
        // sits strictly farther out (tie: lower vec_id wins) — is the
        // greedy local form: one aggregation over the pair list, no
        // iterative connected components, SQL-expressible without
        // recursion.
        //
        // Scale shape (100 TB): centroids BROADCAST (nlist-sized); the
        // pair join is keyed on the cell, so the quadratic stage is
        // bounded per-cell — nlist must grow ~sqrt(n) with the corpus
        // (the fixture's 10 label-cells stand in for a production
        // nlist) exactly as an IVF index scales; the dominance
        // aggregation and the join back to the assignment shuffle
        // id-sized frames keyed on vec_id. Nothing corpus² exists in
        // the plan.
        val au = ivfAssigned(s, dir)
          .join(unitEmb(s, dir).select(col("vec_id"), col("u")), "vec_id")
          .select(col("vec_id"), col("assigned"), col("dist2"), col("u"))
        val dp = au.as("x").join(au.as("y"),
            col("x.assigned") === col("y.assigned") &&
              col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
            col("x.dist2").as("da"), col("y.dist2").as("db"),
            dot(col("x.u"), col("y.u")).as("cos"))
          .where(col("cos") >= 0.35)
          .cache()
        dp.count() // populate BEFORE the two dominated branches race it
        val dominated = dp
          .where(col("db") > col("da") ||
            (col("db") === col("da") && col("id_b") < col("id_a")))
          .select(col("id_a").as("vec_id"))
          .unionAll(dp
            .where(col("da") > col("db") ||
              (col("da") === col("db") && col("id_a") < col("id_b")))
            .select(col("id_b").as("vec_id")))
          .distinct()
          .withColumn("dom", lit(1))
        val ndup = dp.select(col("id_a").as("vec_id"))
          .unionAll(dp.select(col("id_b").as("vec_id")))
          .groupBy("vec_id").agg(count(lit(1)).as("n_dup"))
        ivfAssigned(s, dir)
          .join(ndup, Seq("vec_id"), "left_outer")
          .join(dominated, Seq("vec_id"), "left_outer")
          .select(col("vec_id"), col("assigned").as("cell"), col("dist2"),
            coalesce(col("n_dup"), lit(0L)).as("n_dup_neighbors"),
            when(col("dom").isNull, lit(1)).otherwise(lit(0)).as("keep"))
      },
      Some(
        s"""$IvfAssignCte,
           |au AS (SELECT a.vec_id, a.assigned, a.dist2, un.u
           |  FROM assign a JOIN un ON a.vec_id = un.vec_id),
           |dp AS (SELECT id_a, id_b, da, db, cos FROM (
           |  SELECT x.vec_id AS id_a, y.vec_id AS id_b, x.dist2 AS da,
           |    y.dist2 AS db, list_dot_product(x.u, y.u) AS cos
           |  FROM au x JOIN au y
           |  ON x.assigned = y.assigned AND x.vec_id < y.vec_id)
           |  WHERE cos >= 0.35),
           |dom AS (SELECT DISTINCT vec_id FROM (
           |  SELECT id_a AS vec_id FROM dp
           |    WHERE db > da OR (db = da AND id_b < id_a)
           |  UNION ALL
           |  SELECT id_b AS vec_id FROM dp
           |    WHERE da > db OR (da = db AND id_a < id_b))),
           |ndup AS (SELECT vec_id, COUNT(*) AS n_dup FROM (
           |  SELECT id_a AS vec_id FROM dp
           |  UNION ALL SELECT id_b AS vec_id FROM dp) GROUP BY vec_id)
           |SELECT a.vec_id, a.assigned AS cell, a.dist2,
           |  COALESCE(n.n_dup, 0) AS n_dup_neighbors,
           |  CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS keep
           |FROM assign a
           |LEFT JOIN ndup n ON a.vec_id = n.vec_id
           |LEFT JOIN dom d ON a.vec_id = d.vec_id""".stripMargin),
      "SemDeDup: IVF-cell-bounded cosine dup pairs, keep the vector farthest from its centroid."),

    QueryDef(
      "sim_sq8_error",
      (s, dir) => {
        // int8 scalar quantization — the memory-reduction step an ANN
        // index applies before loading 100 TB of vectors: per-vector
        // symmetric scale (pure map, zero shuffle), codes = round(x /
        // scale * 127), and the query measures the reconstruction
        // cosine so recall loss is observable per vector.
        graft.functions.VectorFunctions.register(s)
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), asDouble(col("embedding")).as("e"))
          // native one-pass quantize+reconstruct (Sq8Recon) — was an
          // interpreted per-element transform for scale AND codes
          .withColumn("sr", call_function("graft_sq8", col("e")))
          .select(col("vec_id"), col("e"),
            col("sr.scale").as("scale"), col("sr.r").as("r"))
        e.select(col("vec_id"), col("scale"),
          (dot(col("e"), col("r")) /
            (sqrt(dot(col("e"), col("e"))) * sqrt(dot(col("r"), col("r")))))
            .as("recon_cos"))
      },
      Some(
        """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          |sc AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS scale FROM v),
          |r AS (SELECT vec_id, e, scale,
          |  list_transform(e, x -> round(x / scale * 127) * scale / 127) AS r FROM sc)
          |SELECT vec_id, scale,
          |  list_dot_product(e, r) /
          |  (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(r, r))) AS recon_cos
          |FROM r""".stripMargin),
      "Int8 scalar quantization with per-vector reconstruction cosine (map-only)."),

    QueryDef(
      "sim_pq_adc_knn",
      (s, dir) => {
        // Product quantization + asymmetric-distance (ADC) search — the
        // compression half of IVF-PQ, the standard 100 TB ANN layout:
        // each 64-dim vector becomes 8 one-byte codes (one per 8-dim
        // subspace, nearest codeword in that subspace), and a query
        // scans CODES (8 bytes/vector instead of 256+ bytes of floats)
        // adding precomputed query↔codeword distances from a broadcast
        // lookup table. The scan stays linear — composing with
        // sim_ivf_knn's cell restriction gives IVF-PQ, which prunes it.
        //   - codebooks are deterministic per-(subspace, label) exact
        //     ROUND-quantized means (80 rows — broadcast), standing in
        //     for k-means so both engines derive identical codebooks;
        //   - code assignment is one shuffle on (vec_id, m) with a
        //     map-side-combinable min(struct) — no window over corpus;
        //   - ADC distances are integer sums of 1e-9-quantized
        //     per-subspace terms: bit-exact under any partial-agg order.
        // |sub - c|² per (vector, subspace, codeword) via the dot
        // identity — the shared pqScored primitive
        val scored = pqScored(s, dir).cache()
        scored.count() // populate BEFORE the codes/qd stages race it
        val codes = scored
          .groupBy("vec_id", "m")
          .agg(min(struct(col("d2"), col("cw"))).as("best"))
          .select(col("vec_id"), col("m"), col("best.cw").as("code"))
        // per-query distance table: query subvector ↔ every codeword
        val qd = scored.where(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("m").as("qm"),
            col("cw"), col("d2"))
        val adc = codes.join(broadcast(qd),
            col("m") === col("qm") && col("code") === col("cw") &&
              col("vec_id") =!= col("query_id"))
          .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
          .agg(sum(round(col("d2") * 1000000000).cast("long")).as("qdist"))
        // TopKPerKey heap-prunes the candidate lists BEFORE any sort:
        // at a 100× corpus the window form would sort every query's
        // full candidate list; here the window only ranks ≤5 survivors.
        val top = graft.plans.GraftOps.topKPerKey(
          adc, Seq("query_id"), 5, "+qdist", "+neighbor_id")
        val w = Window.partitionBy("query_id")
          .orderBy(col("qdist").asc, col("neighbor_id").asc)
        top.withColumn("rk", row_number().over(w))
          .select(col("query_id"), col("neighbor_id"),
            (col("qdist").cast("double") / 1000000000).as("approx_dist2"),
            col("rk").cast("int").as("rk"))
      },
      Some(
        s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
           |$PqCtes,
           |adc AS (SELECT qd.query_id, codes.vec_id AS neighbor_id,
           |  CAST(SUM(CAST(ROUND(qd.d2 * 1000000000) AS BIGINT)) AS BIGINT) AS qdist
           |  FROM codes JOIN qd ON codes.m = qd.m AND codes.code = qd.cw
           |  WHERE codes.vec_id <> qd.query_id
           |  GROUP BY 1, 2)
           |SELECT query_id, neighbor_id, CAST(qdist AS DOUBLE)/1000000000 AS approx_dist2,
           |  CAST(rk AS INT) AS rk FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qdist, neighbor_id) AS rk
           |  FROM adc) WHERE rk <= 5""".stripMargin),
      "PQ (8 subspaces × per-label codebooks) + ADC code-scan top-5 — the compression half of IVF-PQ."),

    QueryDef(
      "sim_ivfpq_knn",
      (s, dir) => {
        // THE composite 100 TB ANN layout, both halves together: IVF
        // cell pruning (nprobe=2 probe lists from the ranked centroid
        // pass) bounds WHICH vectors are scored, PQ/ADC bounds WHAT is
        // read per vector (8 one-byte codes + a broadcast distance
        // table). The ADC scan that sim_pq_adc_knn runs linearly over
        // the corpus here touches only code rows whose cell is probed —
        // candidate generation is an equi-join on the cell key, so the
        // plan scales with cell sizes, not corpus size.
        val ranked = ivfRanked(s, dir)
          .select(col("vec_id"), col("c_label"), col("rk")).cache()
        ranked.count() // populate BEFORE assigned/probes race it
        val assigned = ranked.where(col("rk") === 1)
          .select(col("vec_id").as("neighbor_id"), col("c_label").as("cell"))
        val probes = ranked.where(col("vec_id") < 20 && col("rk") <= 2)
          .select(col("vec_id").as("query_id"), col("c_label").as("cell"))
        // (query, neighbor) candidates: cell-bounded, duplicate-free
        // (each corpus vector lives in exactly one cell)
        val pairs = assigned.join(broadcast(probes), "cell")
          .where(col("query_id") =!= col("neighbor_id"))
          .select("query_id", "neighbor_id")
        val scored = pqScored(s, dir).cache()
        scored.count() // populate BEFORE the codes/qd stages race it
        val codes = scored
          .groupBy("vec_id", "m")
          .agg(min(struct(col("d2"), col("cw"))).as("best"))
          .select(col("vec_id").as("neighbor_id"), col("m"), col("best.cw").as("code"))
        val qd = scored.where(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("m").as("qm"),
            col("cw"), col("d2"))
        val adc = pairs
          .join(codes, "neighbor_id") // 8 code rows per candidate pair
          .join(broadcast(qd),
            col("query_id") === col("qid") && col("m") === col("qm") &&
              col("code") === col("cw"))
          .groupBy("query_id", "neighbor_id")
          .agg(sum(round(col("d2") * 1000000000).cast("long")).as("qdist"))
        // heap-pruned top-5 per query (TopKPerKey operator), window
        // ranks only the survivors — no full candidate-list sort
        val top = graft.plans.GraftOps.topKPerKey(
          adc, Seq("query_id"), 5, "+qdist", "+neighbor_id")
        val w = Window.partitionBy("query_id")
          .orderBy(col("qdist").asc, col("neighbor_id").asc)
        top.withColumn("rk", row_number().over(w))
          .select(col("query_id"), col("neighbor_id"),
            (col("qdist").cast("double") / 1000000000).as("approx_dist2"),
            col("rk").cast("int").as("rk"))
      },
      Some(
        s"""$IvfAssignCte,
           |qc AS (SELECT vec_id AS query_id, c_label AS cell FROM (
           |  SELECT vec_id, c_label,
           |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) AS rk
           |  FROM iscore WHERE vec_id < 20) WHERE rk <= 2),
           |$PqCtes,
           |prs AS (SELECT qc.query_id, a.vec_id AS neighbor_id FROM qc
           |  JOIN assign a ON a.assigned = qc.cell AND a.vec_id <> qc.query_id),
           |adc AS (SELECT p.query_id, p.neighbor_id,
           |  CAST(SUM(CAST(ROUND(qd.d2 * 1000000000) AS BIGINT)) AS BIGINT) AS qdist
           |  FROM prs p JOIN codes c ON c.vec_id = p.neighbor_id
           |  JOIN qd ON qd.query_id = p.query_id AND qd.m = c.m AND qd.cw = c.code
           |  GROUP BY 1, 2)
           |SELECT query_id, neighbor_id, CAST(qdist AS DOUBLE)/1000000000 AS approx_dist2,
           |  CAST(rk AS INT) AS rk FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qdist, neighbor_id) AS rk
           |  FROM adc) WHERE rk <= 5""".stripMargin),
      "IVF-PQ composite: nprobe=2 cell pruning bounds the candidates, ADC code scan bounds the bytes per candidate."),

    QueryDef(
      "sim_label_centroid",
      (s, dir) =>
        quantMean(
          t(s, dir, "embeddings")
            .select(col("label"),
              posexplode(asDouble(col("embedding"))).as(Seq("pos", "v"))),
          Seq(col("label") -> "label", (col("pos") + 1) -> "dim"),
          col("v"), "centroid"),
      Some(
        """SELECT label, CAST(dim AS INT) AS dim,
          |CAST(SUM(CAST(ROUND(v * 1000000000) AS BIGINT)) AS DOUBLE) / 1000000000 / COUNT(*) AS centroid
          |FROM (SELECT label, unnest(range(1, 65)) AS dim,
          |      unnest(CAST(embedding AS DOUBLE[])) AS v FROM embeddings)
          |GROUP BY label, dim""".stripMargin),
      "IVF centroids per label (ROUND-quantized exact mean per dimension)."),

    QueryDef(
      "sim_kmeans_refine",
      (s, dir) => {
        // One Lloyd iteration — the index-build primitive IVF training
        // runs to convergence: re-assign every vector to its nearest
        // centroid (the existing ivfRanked pass), recompute each cell's
        // exact-mean centroid from its NEW members, and report per-cell
        // occupancy plus how far the centroid moved (|c_new - c_old|²
        // via the dot identity). Scale shape: assignment broadcasts the
        // nlist-sized centroid table (no corpus shuffle beyond the
        // per-vector argmin window), the recompute is one map-side-
        // combinable (cell, dim) agg, and the shift join is
        // nlist × nlist — driver-trivial. Iterating = re-running this
        // query on the updated centroid table; convergence is
        // max(shift2) < ε, a scalar. Determinism: centroids are
        // 1e-9-ROUND-quantized exact means in both engines.
        graft.functions.VectorFunctions.register(s)
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("e"))
        val centsOld = quantMean(
          e.select(col("label"), posexplode(col("e")).as(Seq("pos", "v"))),
          Seq(col("label") -> "c_label", (col("pos") + 1) -> "dim"),
          col("v"), "cv")
          .groupBy("c_label")
          .agg(array_sort(collect_list(struct(col("dim"), col("cv")))).as("pairs"))
          .select(col("c_label"), transform(col("pairs"), p => p.getField("cv")).as("co"))
        val asg = ivfAssigned(s, dir).select(col("vec_id"), col("assigned"))
        val members = e.select(col("vec_id"), col("e")).join(asg, "vec_id")
        val centsNew = quantMean(
          members.select(col("assigned"), posexplode(col("e")).as(Seq("pos", "v"))),
          Seq(col("assigned") -> "c_label", (col("pos") + 1) -> "dim"),
          col("v"), "cv")
          .groupBy("c_label")
          .agg(array_sort(collect_list(struct(col("dim"), col("cv")))).as("pairs"))
          .select(col("c_label"), transform(col("pairs"), p => p.getField("cv")).as("cn"))
        val occ = asg.groupBy(col("assigned").as("c_label"))
          .agg(count("*").as("n_assigned"))
        occ.join(centsNew, "c_label").join(centsOld, "c_label")
          .select(col("c_label"), col("n_assigned"),
            (dot(col("cn"), col("cn")) - lit(2.0) * dot(col("cn"), col("co")) +
              dot(col("co"), col("co"))).as("shift2"))
      },
      Some(
        s"""$IvfAssignCte,
           |ncd AS (SELECT assigned AS c_label, CAST(dim AS INT) AS dim,
           |  CAST(SUM(CAST(ROUND(x * 1000000000) AS BIGINT)) AS DOUBLE) / 1000000000 / COUNT(*) AS cv
           |  FROM (SELECT a.assigned, unnest(range(1, 65)) AS dim, unnest(v.e) AS x
           |        FROM assign a JOIN v ON a.vec_id = v.vec_id)
           |  GROUP BY assigned, dim),
           |ncent AS (SELECT c_label, list(cv ORDER BY dim) AS cn FROM ncd GROUP BY c_label),
           |occ AS (SELECT assigned AS c_label, COUNT(*) AS n_assigned FROM assign GROUP BY assigned)
           |SELECT occ.c_label, occ.n_assigned,
           |  list_dot_product(cn, cn) - 2.0 * list_dot_product(cn, c) + list_dot_product(c, c) AS shift2
           |FROM occ JOIN ncent ON occ.c_label = ncent.c_label
           |JOIN cent ON occ.c_label = cent.c_label""".stripMargin),
      "One Lloyd iteration: re-assign, recompute exact-mean centroids, per-cell occupancy + shift."),

    QueryDef(
      "sim_mrl_recall",
      (s, dir) => {
        // Matryoshka-style truncation recall: score with only the FIRST
        // 16 of 64 dims (re-normalized) and measure top-5 overlap with
        // full-dim brute force — the eval that prices the 4× dot-product
        // cost cut MRL embeddings promise before a pipeline adopts the
        // truncated index. Same machinery as sim_recall_eval: ground
        // truth and truncated ranking both run the fused AllPairsCosine
        // exec + TopKPerKey heaps (nothing sorted, nothing cartesian);
        // at 100 TB this runs on a sampled query set exactly like any
        // recall eval.
        graft.functions.VectorFunctions.register(s)
        val bf = bruteTop5(s, dir).select("query_id", "neighbor_id")
        val tcorp = t(s, dir, "embeddings")
          .select(col("vec_id").as("neighbor_id"),
            call_function("graft_unit",
              slice(asDouble(col("embedding")), 1, 16)).as("u"))
        val tq = t(s, dir, "embeddings")
          .where(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"),
            call_function("graft_unit",
              slice(asDouble(col("embedding")), 1, 16)).as("qu"))
        val scored = graft.plans.GraftOps
          .allPairsCosine(tcorp, tq, -2.0, ltOnly = false)
          .where(col("neighbor_id") =!= col("query_id"))
        val mrl = graft.plans.GraftOps.topKPerKey(
            scored, Seq("query_id"), 5, "-cos", "+neighbor_id")
          .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
        bf.join(mrl, Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(count(col("hit")).cast("int").as("n_hits"),
            (count(col("hit")) / lit(5.0)).as("recall_at_5"))
      },
      Some(
        s"""$UnitCte,
           |bfp AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           |  list_dot_product(a.u, b.u) AS cos
           |  FROM (SELECT * FROM un WHERE vec_id < 20) a JOIN un b ON a.vec_id <> b.vec_id),
           |bf AS (SELECT query_id, neighbor_id FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |  FROM bfp) WHERE rk <= 5),
           |tsl AS (SELECT vec_id, list_slice(e, 1, 16) AS sl FROM v),
           |tun AS (SELECT vec_id,
           |  list_transform(sl, x -> x / sqrt(list_dot_product(sl, sl))) AS u FROM tsl),
           |mrp AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           |  list_dot_product(a.u, b.u) AS cos
           |  FROM (SELECT * FROM tun WHERE vec_id < 20) a JOIN tun b ON a.vec_id <> b.vec_id),
           |mrl AS (SELECT query_id, neighbor_id FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |  FROM mrp) WHERE rk <= 5)
           |SELECT bf.query_id, CAST(COUNT(mrl.neighbor_id) AS INT) AS n_hits,
           |  COUNT(mrl.neighbor_id) / 5.0 AS recall_at_5
           |FROM bf LEFT JOIN mrl
           |  ON bf.query_id = mrl.query_id AND bf.neighbor_id = mrl.neighbor_id
           |GROUP BY bf.query_id""".stripMargin),
      "Recall@5 of truncated-16-dim (re-normalized) cosine vs full-dim brute force."),

    QueryDef(
      "sim_mmr_rerank",
      (s, dir) => {
        // MMR (Maximal Marginal Relevance, Carbonell & Goldstein 1998)
        // diversified re-ranking: greedily pick 3 of each query's top-8
        // cosine candidates, each step maximizing
        // 0.5·relevance − 0.5·max-similarity-to-already-picked — the
        // standard "don't return 3 near-copies" pass after ANN
        // retrieval. Scale shape: candidate generation is the proven
        // fused AllPairsCosine + TopKPerKey path (heap-bounded, never
        // corpus²); the greedy is ROW-LOCAL per query over ≤8
        // candidates (flatMapGroups — the engine-dispatch precedent for
        // per-group imperative logic), so the re-rank shuffle carries
        // ≤ 8·|queries| rows of (id, score, 64 doubles). Determinism:
        // dots fold ascending (= list_dot_product), the MMR arithmetic
        // is the identical IEEE tree, ties break on lowest id — the
        // unrolled 3-step SQL greedy matches bit-for-bit.
        import s.implicits._
        val corpus = unitEmb(s, dir)
          .select(col("vec_id").as("neighbor_id"), col("u"))
        val q = unitEmb(s, dir).where(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("u").as("qu"))
        val scored = graft.plans.GraftOps
          .allPairsCosine(corpus, q, -2.0, ltOnly = false)
          .where(col("neighbor_id") =!= col("query_id"))
        val top8 = graft.plans.GraftOps.topKPerKey(
          scored, Seq("query_id"), 8, "-cos", "+neighbor_id")
        val cand = top8.join(corpus, Seq("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"), col("cos"), col("u"))
          .as[(Long, Long, Double, Seq[Double])]
        cand.groupByKey(_._1)
          .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Double, Seq[Double])]) =>
            def dot(a: Array[Double], b: Array[Double]): Double = {
              var acc = 0.0; var i = 0
              while (i < a.length) { acc += a(i) * b(i); i += 1 }
              acc
            }
            val remaining = collection.mutable.ArrayBuffer(
              it.map(c => (c._2, c._3, c._4.toArray)).toSeq: _*)
            var selected = List.empty[Array[Double]]
            val out = collection.mutable.ArrayBuffer[(Long, Int, Long, Double)]()
            var rank = 1
            while (rank <= 3 && remaining.nonEmpty) {
              var bestIdx = -1
              var bestM = Double.NegativeInfinity
              var bestId = Long.MaxValue
              for (i <- remaining.indices) {
                val (id, cos, u) = remaining(i)
                val m =
                  if (selected.isEmpty) cos
                  else {
                    var mx = Double.NegativeInfinity
                    selected.foreach { su =>
                      val d = dot(u, su); if (d > mx) mx = d
                    }
                    0.5 * cos - 0.5 * mx
                  }
                if (m > bestM || (m == bestM && id < bestId)) {
                  bestM = m; bestIdx = i; bestId = id
                }
              }
              val picked = remaining.remove(bestIdx)
              selected ::= picked._3
              out += ((qid, rank, picked._1, bestM))
              rank += 1
            }
            out.iterator
          }
          .toDF("query_id", "rank", "neighbor_id", "mmr")
      },
      Some(
        s"""$UnitCte,
           |p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           |  list_dot_product(a.u, b.u) AS cos, b.u AS u
           |  FROM (SELECT * FROM un WHERE vec_id < 20) a JOIN un b ON a.vec_id <> b.vec_id),
           |cand AS (SELECT * FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |  FROM p) WHERE rk <= 8),
           |s1 AS (SELECT query_id, neighbor_id, cos, u, cos AS mmr FROM cand WHERE rk = 1),
           |r2 AS (SELECT c.query_id, c.neighbor_id, c.cos, c.u,
           |   0.5 * c.cos - 0.5 * list_dot_product(c.u, s1.u) AS mmr
           |   FROM cand c JOIN s1 ON c.query_id = s1.query_id AND c.neighbor_id <> s1.neighbor_id),
           |s2 AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER
           |  (PARTITION BY query_id ORDER BY mmr DESC, neighbor_id) AS rk2 FROM r2) WHERE rk2 = 1),
           |r3 AS (SELECT c.query_id, c.neighbor_id, c.cos,
           |   0.5 * c.cos - 0.5 * greatest(list_dot_product(c.u, s1.u), list_dot_product(c.u, s2.u)) AS mmr
           |   FROM cand c JOIN s1 ON c.query_id = s1.query_id JOIN s2 ON c.query_id = s2.query_id
           |   WHERE c.neighbor_id <> s1.neighbor_id AND c.neighbor_id <> s2.neighbor_id),
           |s3 AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER
           |  (PARTITION BY query_id ORDER BY mmr DESC, neighbor_id) AS rk3 FROM r3) WHERE rk3 = 1)
           |SELECT query_id, 1 AS rank, neighbor_id, mmr FROM s1
           |UNION ALL SELECT query_id, 2 AS rank, neighbor_id, mmr FROM s2
           |UNION ALL SELECT query_id, 3 AS rank, neighbor_id, mmr FROM s3""".stripMargin),
      "MMR diversified top-3 re-rank of each query's top-8 cosine candidates."),

    QueryDef(
      "sim_pca_power",
      (s, dir) => {
        // Top principal component of the embedding corpus via two
        // QUANTIZED power-iteration rounds (v0 = all-ones): the
        // dimensionality-analysis primitive behind whitening, ABTT
        // ("all-but-the-top") embedding post-processing, and OPQ
        // rotation training. w_{k+1} = Σ_x x̃ (x̃ᵀ v_k) with x̃ = x − μ,
        // normalized by n between rounds (keeps magnitudes bounded
        // without a norm, whose cross-engine float fold would not be
        // order-free).
        //
        // Scale shape (100 TB): μ and each w_k are d-sized (64 rows) —
        // every per-dim model joins BROADCAST; the corpus-scale stages
        // are (vec_id)-keyed — the dot-product agg map-side combines
        // n×d rows down to one row per vector, and the scatter join
        // reuses the same hash partitioning across both rounds (one
        // exchange, Catalyst reuse). Nothing ever shuffles by dim
        // except the d-row model aggs themselves. Determinism: every
        // cross-row fold (μ, per-row dots, per-dim scatters) is a
        // ROUND-quantized BIGINT sum — order-free; the doubles between
        // folds are identical scalar chains on identical inputs in
        // both engines.
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), asDouble(col("embedding")).as("e"))
        val x = e.select(col("vec_id"), posexplode(col("e")).as(Seq("pos", "xv")))
          .select(col("vec_id"), (col("pos") + 1).as("dim"), col("xv"))
        val nd = e.agg(count("*").as("n"))
        val mu = quantMean(x, Seq(col("dim") -> "dim"), col("xv"), "mu")
        val xc = x.join(broadcast(mu), "dim")
          .select(col("vec_id"), col("dim"), (col("xv") - col("mu")).as("xc"))
          .cache()
        xc.count() // populate BEFORE the d1/join legs race it
        def round_(c: org.apache.spark.sql.Column) = round(c).cast("long")
        val d1 = xc.groupBy("vec_id")
          .agg(sum(round_(col("xc") * 1000000)).as("d1q"))
        val s1 = xc.join(d1, "vec_id")
          .groupBy("dim")
          .agg(sum(round_(col("xc") * (col("d1q").cast("double") / 1000000)
            * 1000)).as("s1"))
        val v1 = s1.crossJoin(broadcast(nd))
          .select(col("dim"), (col("s1").cast("double") / 1000 / col("n")).as("v1"))
        val d2 = xc.join(broadcast(v1), "dim")
          .groupBy("vec_id")
          .agg(sum(round_(col("xc") * col("v1") * 1000000)).as("d2q"))
        val s2 = xc.join(d2, "vec_id")
          .groupBy("dim")
          .agg(sum(round_(col("xc") * (col("d2q").cast("double") / 1000000)
            * 1000)).as("s2"))
        s2.crossJoin(broadcast(nd))
          .select(col("dim").cast("int").as("dim"),
            (col("s2").cast("double") / 1000 / col("n")).as("pc"))
      },
      Some(
        """WITH x AS (SELECT vec_id, unnest(range(1, 65)) AS dim,
          |    unnest(CAST(embedding AS DOUBLE[])) AS xv FROM embeddings),
          |nd AS (SELECT COUNT(*) AS n FROM embeddings),
          |mu AS (SELECT dim, CAST(SUM(CAST(ROUND(xv * 1000000000) AS BIGINT)) AS DOUBLE)
          |    / 1000000000 / COUNT(*) AS mu FROM x GROUP BY dim),
          |xc AS (SELECT vec_id, x.dim, xv - mu AS xc FROM x JOIN mu USING (dim)),
          |d1 AS (SELECT vec_id, SUM(CAST(ROUND(xc * 1000000) AS BIGINT)) AS d1q
          |   FROM xc GROUP BY vec_id),
          |s1 AS (SELECT dim,
          |    SUM(CAST(ROUND(xc * (CAST(d1q AS DOUBLE) / 1000000) * 1000) AS BIGINT)) AS s1
          |   FROM xc JOIN d1 USING (vec_id) GROUP BY dim),
          |v1 AS (SELECT dim, CAST(s1 AS DOUBLE) / 1000 / n AS v1 FROM s1, nd),
          |d2 AS (SELECT vec_id, SUM(CAST(ROUND(xc * v1 * 1000000) AS BIGINT)) AS d2q
          |   FROM xc JOIN v1 USING (dim) GROUP BY vec_id),
          |s2 AS (SELECT dim,
          |    SUM(CAST(ROUND(xc * (CAST(d2q AS DOUBLE) / 1000000) * 1000) AS BIGINT)) AS s2
          |   FROM xc JOIN d2 USING (vec_id) GROUP BY dim)
          |SELECT CAST(dim AS INT) AS dim, CAST(s2 AS DOUBLE) / 1000 / n AS pc
          |FROM s2, nd""".stripMargin),
      "Top principal component: two quantized power-iteration rounds over centered embeddings."),

    QueryDef(
      "sim_hard_negatives",
      (s, dir) => {
        // Hard-negative mining for contrastive training: per query, the
        // top-3 most-similar vectors whose LABEL DIFFERS — the
        // highest-value negatives for a batch sampler. Scale shape:
        // both custom operators again (fused AllPairsCosine scoring ×
        // broadcast queries, then TopKPerKey heap-pruning per scan
        // partition BEFORE the shuffle), with one twist: AllPairsCosine
        // children are exactly (id, vec), so the label rides INSIDE the
        // id (id·16+label, labels are 0..9 < 16) and is unpacked
        // row-locally after scoring — the label filter costs ZERO extra
        // joins or shuffles at any scale, vs shuffling the corpus label
        // table against |corpus|·|queries| scored pairs.
        val u = unitEmb(s, dir)
        val corpus = u.select((col("vec_id") * 16 + col("label")).as("id"), col("u"))
        val q = u.where(col("vec_id") < 20)
          .select((col("vec_id") * 16 + col("label")).as("qid"), col("u").as("qu"))
        val scored = graft.plans.GraftOps
          .allPairsCosine(corpus, q, -2.0, ltOnly = false)
          .select(expr("qid DIV 16").as("query_id"), (col("qid") % 16).as("ql"),
            expr("id DIV 16").as("neighbor_id"),
            (col("id") % 16).cast("int").as("n_label"), col("cos"))
          .where(col("ql") =!= col("n_label"))
          .select("query_id", "neighbor_id", "n_label", "cos")
        val top = graft.plans.GraftOps.topKPerKey(
          scored, Seq("query_id"), 3, "-cos", "+neighbor_id")
        top.withColumn("rk", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("neighbor_id").asc)))
      },
      Some(
        s"""$UnitCte,
           |p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           |  CAST(b.label AS INT) AS n_label, list_dot_product(a.u, b.u) AS cos
           |  FROM (SELECT * FROM un WHERE vec_id < 20) a
           |  JOIN un b ON a.label <> b.label)
           |SELECT query_id, neighbor_id, n_label, cos, CAST(rk AS INT) AS rk FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           |    ORDER BY cos DESC, neighbor_id) AS rk FROM p) WHERE rk <= 3""".stripMargin),
      "Hard-negative mining: top-3 cross-label cosine neighbors per query."),

    QueryDef(
      "sim_knn_classify",
      (s, dir) => {
        // kNN pseudo-labeling — the label-propagation stage of a
        // semi-supervised curation run: every 5th vector plays the
        // "unlabeled" doc, gets its k=10 nearest (cosine, within its
        // IVF cell — the scale-bounded candidate set, not a corpus
        // scan), and takes the neighbors' majority label (ties break
        // on the smaller label id). The true label rides along so the
        // output doubles as the pseudo-labeler's accuracy audit.
        // Scale shape: the candidate join is keyed on the cell and
        // deliberately NOT broadcast-hinted — at 20% of a 100 TB
        // corpus the query side is itself huge, so both sides
        // shuffle-partition by cell (AQE may still broadcast at tiny
        // SF); the vote is a (query, label) count — map-side
        // combinable — and the argmax window runs over <= |labels|
        // rows per query. Doc vectors cross the network once each.
        val au = ivfAssigned(s, dir).select(col("vec_id"), col("assigned"))
          .join(unitEmb(s, dir), "vec_id").cache()
        au.count() // populate BEFORE the query/candidate legs race it
        val q = au.where(col("vec_id") % 5 === 0)
          .select(col("vec_id").as("query_id"), col("label").as("true_label"),
            col("assigned").as("cell"), col("u").as("qu"))
        val cands = au.select(col("vec_id").as("neighbor_id"),
          col("label").as("n_label"), col("assigned").as("cell"), col("u").as("nu"))
        val wTop = Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("neighbor_id").asc)
        val top10 = cands.join(q, "cell")
          .where(col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("true_label"), col("neighbor_id"),
            col("n_label"), dot(col("qu"), col("nu")).as("cos"))
          .withColumn("rk", row_number().over(wTop)).where(col("rk") <= 10)
        val wVote = Window.partitionBy("query_id")
          .orderBy(col("cnt").desc, col("n_label").asc)
        top10.groupBy("query_id", "true_label", "n_label")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("vrk", row_number().over(wVote)).where(col("vrk") === 1)
          .select(col("query_id"), col("true_label"),
            col("n_label").as("pred_label"), col("cnt").as("n_votes"),
            (col("n_label") === col("true_label")).cast("int").as("correct"))
      },
      Some(
        s"""$IvfAssignCte,
           |au AS (SELECT a.vec_id, a.label, a.assigned, un.u
           |  FROM assign a JOIN un ON a.vec_id = un.vec_id),
           |p AS (SELECT q.vec_id AS query_id, q.label AS true_label,
           |    c.vec_id AS neighbor_id, c.label AS n_label,
           |    list_dot_product(q.u, c.u) AS cos
           |  FROM au q JOIN au c ON q.assigned = c.assigned AND q.vec_id <> c.vec_id
           |  WHERE q.vec_id % 5 = 0),
           |top10 AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (
           |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |  FROM p) WHERE rk <= 10),
           |votes AS (SELECT query_id, true_label, n_label, COUNT(*) AS cnt
           |  FROM top10 GROUP BY 1, 2, 3)
           |SELECT query_id, true_label, n_label AS pred_label,
           |  CAST(cnt AS BIGINT) AS n_votes,
           |  CAST(n_label = true_label AS INT) AS correct
           |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           |    ORDER BY cnt DESC, n_label) AS vrk FROM votes) WHERE vrk = 1""".stripMargin),
      "kNN pseudo-labeling: majority label of the 10 nearest in-cell " +
        "neighbors per sampled vector, with accuracy audit."),

    QueryDef(
      "sim_source_map",
      (s, dir) => {
        // Domain-similarity map — the input to data-mixing decisions:
        // one embedding centroid per document SOURCE (docs ⋈ embeddings
        // on the id), then the full pairwise cosine matrix between
        // source centroids. Tells a curation run which domains are
        // near-duplicates of each other and which add diversity.
        // Scale shape: one id-keyed equi-join (both sides shuffle by
        // the id once), a map-side-combinable (source, dim) mean — the
        // exact 1e-9-quantized fold every centroid op here uses — and
        // a |sources|² pair matrix that is driver-trivial at any
        // corpus size. Doc bodies never move; vectors cross the
        // network once.
        graft.functions.VectorFunctions.register(s)
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), asDouble(col("embedding")).as("e"))
        val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
        val joined = docs.join(emb, col("doc_id") === col("vec_id"))
        val cents = quantMean(
          joined.select(col("source"), posexplode(col("e")).as(Seq("pos", "v"))),
          Seq(col("source") -> "source", (col("pos") + 1) -> "dim"),
          col("v"), "cv")
          .groupBy("source")
          .agg(array_sort(collect_list(struct(col("dim"), col("cv")))).as("pairs"))
          .select(col("source"),
            transform(col("pairs"), p => p.getField("cv")).as("c"))
        val a = cents.select(col("source").as("source_a"), col("c").as("ca"))
        val b = cents.select(col("source").as("source_b"), col("c").as("cb"))
        // |sources| rows: broadcast keeps the non-equi pair join a BNLJ
        // against a replicated tiny side at ANY corpus size (a plain
        // cartesian here would repartition both sides)
        a.join(broadcast(b), col("source_a") < col("source_b"))
          .select(col("source_a"), col("source_b"),
            (dot(col("ca"), col("cb")) /
              sqrt(dot(col("ca"), col("ca")) * dot(col("cb"), col("cb"))))
              .as("cos"))
      },
      Some(
        """WITH cd AS (SELECT d.source, CAST(dim AS INT) AS dim,
          |    CAST(SUM(CAST(ROUND(v * 1000000000) AS BIGINT)) AS DOUBLE)
          |      / 1000000000 / COUNT(*) AS cv
          |  FROM (SELECT vec_id, unnest(range(1, 65)) AS dim,
          |        unnest(CAST(embedding AS DOUBLE[])) AS v FROM embeddings) x
          |  JOIN documents d ON x.vec_id = d.doc_id
          |  GROUP BY 1, 2),
          |cent AS (SELECT source, list(cv ORDER BY dim) AS c FROM cd GROUP BY source)
          |SELECT a.source AS source_a, b.source AS source_b,
          |  list_dot_product(a.c, b.c) /
          |    sqrt(list_dot_product(a.c, a.c) * list_dot_product(b.c, b.c)) AS cos
          |FROM cent a JOIN cent b ON a.source < b.source""".stripMargin),
      "Domain-similarity map: pairwise cosine between per-source " +
        "embedding centroids — the data-mixing diversity signal."),

    QueryDef(
      "sim_ivf_train",
      (s, dir) => {
        // The index BUILD loop: Lloyd's k-means run for 3 full rounds
        // (assign → exact-mean recompute), emitting per-round cell
        // occupancy and centroid shift — the convergence trajectory an
        // IVF deployment watches to pick its stopping round. Completes
        // the story next to sim_kmeans_refine (one step) and the
        // sim_ivf_* searchers (consumers of the built index).
        // Scale shape per round: the centroid table (nlist × d) is
        // broadcast; assignment is a fused scan + argmin (one
        // combinable min(struct) — never a window over the corpus);
        // the recompute is the same map-side-combinable (cell, dim)
        // quantized mean every centroid op here uses — with the CELL
        // OCCUPANCY folded into that same aggregate (the count rides
        // the (cell, dim=1) partials for free), so each round runs
        // exactly ONE corpus-scanning job. The first cut of this loop
        // checkpointed the centroids and then ran a SECOND job for the
        // occupancy/shift report — re-executing the whole assignment
        // per round because `assigned` is lineage, not cache; folding
        // the report into the centroid checkpoint halved the round
        // cost. The corpus is scanned from the materialized cache;
        // each round's tiny centroid+occupancy frame is eagerly
        // local-checkpointed so round N's plan does not nest round
        // N-1's, and the shift report is pure arithmetic over two
        // checkpointed nlist-sized frames. Determinism: 1e-9-quantized
        // means, argmin ties break on the cell id.
        graft.functions.VectorFunctions.register(s)
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("e"))
          .cache()
        e.count() // scanned by assignment + recompute in every round
        // (cell, dim) means + per-cell count → one row per cell:
        // centroid array (dim-sorted) + occupancy (every dim of a cell
        // carries the same count; max() collapses them)
        def toCent(cd: DataFrame): DataFrame = cd
          .groupBy("c_label")
          .agg(array_sort(collect_list(struct(col("dim"), col("cv")))).as("pairs"),
            max(col("cnt")).as("n_assigned"))
          .select(col("c_label"),
            transform(col("pairs"), p => p.getField("cv")).as("c"),
            col("n_assigned"))
        def centsOf(df: DataFrame, grp: org.apache.spark.sql.Column): DataFrame =
          toCent(quantMean(
            df.select(grp.as("g"), posexplode(col("e")).as(Seq("pos", "v"))),
            Seq(col("g") -> "c_label", (col("pos") + 1) -> "dim"),
            col("v"), "cv", Some("cnt")))
        var cents = centsOf(e, col("label")).localCheckpoint(true)
        val rounds = (1 to 3).map { it =>
          val assigned = e.crossJoin(broadcast(cents.select("c_label", "c")))
            .select(col("vec_id"),
              struct((dot(col("e"), col("e")) -
                lit(2.0) * dot(col("e"), col("c")) +
                dot(col("c"), col("c"))).as("d2"), col("c_label")).as("sc"))
            .groupBy("vec_id").agg(min(col("sc")).as("b"))
            .select(col("vec_id"), col("b.c_label").as("cell"))
          val newCents = centsOf(assigned.join(e, "vec_id"), col("cell"))
            .localCheckpoint(true)
          val row = newCents
            .join(cents.select(col("c_label"), col("c").as("co")), "c_label")
            .select(lit(it).cast("int").as("iter"), col("c_label"),
              col("n_assigned"),
              (dot(col("c"), col("c")) - lit(2.0) * dot(col("c"), col("co")) +
                dot(col("co"), col("co"))).as("shift2"))
          cents = newCents
          row
        }
        rounds.reduce(_ unionAll _)
      },
      Some {
        def round(i: Int): String = {
          val prev = s"l${i - 1}"
          s"""a$i AS (SELECT vec_id, c_label AS cell FROM (
             |  SELECT v.vec_id, l.c_label, ROW_NUMBER() OVER (
             |    PARTITION BY v.vec_id ORDER BY
             |      list_dot_product(v.e, v.e) - 2.0 * list_dot_product(v.e, l.c)
             |        + list_dot_product(l.c, l.c), l.c_label) AS rk
             |  FROM v CROSS JOIN $prev l) WHERE rk = 1),
             |c${i}d AS (SELECT a.cell AS c_label, CAST(x.dim AS INT) AS dim,
             |  CAST(SUM(CAST(ROUND(x.xv * 1000000000) AS BIGINT)) AS DOUBLE)
             |    / 1000000000 / COUNT(*) AS cv
             |  FROM a$i a JOIN x ON a.vec_id = x.vec_id GROUP BY 1, 2),
             |l$i AS (SELECT c_label, list(cv ORDER BY dim) AS c FROM c${i}d GROUP BY c_label),
             |s$i AS (SELECT o.c_label, o.n_assigned,
             |  list_dot_product(n.c, n.c) - 2.0 * list_dot_product(n.c, p.c)
             |    + list_dot_product(p.c, p.c) AS shift2
             |  FROM (SELECT cell AS c_label, COUNT(*) AS n_assigned
             |        FROM a$i GROUP BY cell) o
             |  JOIN l$i n ON o.c_label = n.c_label
             |  JOIN $prev p ON o.c_label = p.c_label)""".stripMargin
        }
        s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
           |x AS (SELECT vec_id, unnest(range(1, 65)) AS dim, unnest(e) AS xv FROM v),
           |c0 AS (SELECT label AS c_label, CAST(x.dim AS INT) AS dim,
           |  CAST(SUM(CAST(ROUND(x.xv * 1000000000) AS BIGINT)) AS DOUBLE)
           |    / 1000000000 / COUNT(*) AS cv
           |  FROM v JOIN x ON v.vec_id = x.vec_id GROUP BY 1, 2),
           |l0 AS (SELECT c_label, list(cv ORDER BY dim) AS c FROM c0 GROUP BY c_label),
           |${(1 to 3).map(round).mkString(",\n")}
           |SELECT CAST(1 AS INT) AS iter, * FROM s1
           |UNION ALL SELECT CAST(2 AS INT), * FROM s2
           |UNION ALL SELECT CAST(3 AS INT), * FROM s3""".stripMargin
      },
      "IVF index build: 3 Lloyd rounds with per-round cell occupancy " +
        "and quantized centroid shift — the convergence trajectory."),

    QueryDef(
      "sim_incremental_assign",
      (s, dir) => {
        // Incremental index MAINTENANCE — the embedding twin of
        // dedup_incremental: a 10% delta batch (vec_id % 10 = 7)
        // arrives against an index built from the other 90%, gets
        // assigned to the existing centroids (no rebuild), and each
        // cell reports its occupancy growth plus a needs_split flag
        // (post-ingest occupancy > 1.5x the mean cell size, stated as
        // the integer cross-ratio 20·(n_base+n_new) > 3·n_total so the
        // threshold never crosses engines as a double). This is the
        // O(delta) ingest path: per delta batch the work is
        // |delta| × nlist argmin against a broadcast centroid table —
        // the corpus is never rescanned, exactly how a production IVF
        // absorbs a day's embeddings and schedules targeted re-splits
        // instead of nightly rebuilds.
        graft.functions.VectorFunctions.register(s)
        val v = t(s, dir, "embeddings")
          .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("e"))
          .cache()
        v.count() // base centroids + base assign + delta assign share it
        val base = v.where(col("vec_id") % 10 =!= 7)
        val delta = v.where(col("vec_id") % 10 === 7)
        val cents = quantMean(
          base.select(col("label"), posexplode(col("e")).as(Seq("pos", "x"))),
          Seq(col("label") -> "c_label", (col("pos") + 1) -> "dim"),
          col("x"), "cv")
          .groupBy("c_label")
          .agg(array_sort(collect_list(struct(col("dim"), col("cv")))).as("pairs"))
          .select(col("c_label"),
            transform(col("pairs"), p => p.getField("cv")).as("c"))
        def assign(vs: DataFrame): DataFrame = vs.crossJoin(broadcast(cents))
          .select(col("vec_id"),
            struct((dot(col("e"), col("e")) - lit(2.0) * dot(col("e"), col("c")) +
              dot(col("c"), col("c"))).as("d2"), col("c_label")).as("sc"))
          .groupBy("vec_id").agg(min(col("sc")).as("b"))
          .select(col("vec_id"), col("b.c_label").as("cell"))
        val nb = assign(base).groupBy(col("cell").as("c_label"))
          .agg(count(lit(1)).as("n_base"))
        val nn = assign(delta).groupBy(col("cell").as("c_label"))
          .agg(count(lit(1)).as("n_new"))
        val tot = v.agg(count(lit(1)).as("n_total"))
        nb.join(nn, Seq("c_label"), "left")
          .select(col("c_label"), col("n_base"),
            coalesce(col("n_new"), lit(0L)).as("n_new"))
          .crossJoin(broadcast(tot))
          .select(col("c_label"), col("n_base"), col("n_new"),
            ((col("n_base") + col("n_new")) * 20 > col("n_total") * 3)
              .cast("int").as("needs_split"))
      },
      Some(
        """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          |b0 AS (SELECT * FROM v WHERE vec_id % 10 <> 7),
          |d0 AS (SELECT * FROM v WHERE vec_id % 10 = 7),
          |cd AS (SELECT label AS c_label, CAST(dim AS INT) AS dim,
          |  CAST(SUM(CAST(ROUND(x * 1000000000) AS BIGINT)) AS DOUBLE)
          |    / 1000000000 / COUNT(*) AS cv
          |  FROM (SELECT label, unnest(range(1, 65)) AS dim, unnest(e) AS x
          |        FROM b0) GROUP BY 1, 2),
          |cent AS (SELECT c_label, list(cv ORDER BY dim) AS c FROM cd GROUP BY c_label),
          |ab AS (SELECT vec_id, c_label AS cell FROM (
          |  SELECT b0.vec_id, cent.c_label, ROW_NUMBER() OVER (
          |    PARTITION BY b0.vec_id ORDER BY
          |      list_dot_product(b0.e, b0.e) - 2.0 * list_dot_product(b0.e, cent.c)
          |        + list_dot_product(cent.c, cent.c), cent.c_label) AS rk
          |  FROM b0 CROSS JOIN cent) WHERE rk = 1),
          |ad AS (SELECT vec_id, c_label AS cell FROM (
          |  SELECT d0.vec_id, cent.c_label, ROW_NUMBER() OVER (
          |    PARTITION BY d0.vec_id ORDER BY
          |      list_dot_product(d0.e, d0.e) - 2.0 * list_dot_product(d0.e, cent.c)
          |        + list_dot_product(cent.c, cent.c), cent.c_label) AS rk
          |  FROM d0 CROSS JOIN cent) WHERE rk = 1),
          |nb AS (SELECT cell AS c_label, COUNT(*) AS n_base FROM ab GROUP BY cell),
          |nn AS (SELECT cell AS c_label, COUNT(*) AS n_new FROM ad GROUP BY cell),
          |tot AS (SELECT COUNT(*) AS n_total FROM v)
          |SELECT nb.c_label, nb.n_base, COALESCE(nn.n_new, 0) AS n_new,
          |  CAST((nb.n_base + COALESCE(nn.n_new, 0)) * 20 > tot.n_total * 3
          |    AS INT) AS needs_split
          |FROM nb LEFT JOIN nn ON nb.c_label = nn.c_label, tot""".stripMargin),
      "Incremental IVF maintenance: delta batch assigned to existing " +
        "centroids, per-cell growth + integer-ratio split flags."),

    QueryDef(
      "sim_cell_split",
      (s, dir) => {
        // The cell-SPLIT primitive that incremental IVF maintenance
        // schedules (sim_incremental_assign flags overgrown cells; this
        // is the operation that executes on them — run here over every
        // cell so the output is never trivially empty): inside each
        // cell, one deterministic 2-means step. Seeds are the cell's
        // min- and max-id members (reproducible in any engine, no RNG);
        // each member goes to the nearer seed via the dot identity
        // (ties to sub 0); the sub-centroids are the standard
        // 1e-9-quantized exact means. Scale shape: O(cell) work per
        // cell — seeds broadcast (2 vectors/cell), the assignment is a
        // cell-keyed join, the mean is the map-side-combinable
        // (cell, sub, dim) aggregate — a split NEVER retrains the
        // corpus. Emitted per (cell, sub, dim) row so the compare
        // stays scalar (no array columns in the hash gate).
        graft.functions.VectorFunctions.register(s)
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), asDouble(col("embedding")).as("e"))
        val au = ivfAssigned(s, dir)
          .select(col("vec_id"), col("assigned").as("cell"))
          .join(e, "vec_id").cache()
        au.count() // seeds + the assignment legs both read it
        val seeds = au.groupBy("cell")
          .agg(min("vec_id").as("s0"), max("vec_id").as("s1"))
        val sv = seeds
          .join(au.select(col("vec_id").as("s0"), col("e").as("e0")), "s0")
          .join(au.select(col("vec_id").as("s1"), col("e").as("e1")), "s1")
          .select("cell", "e0", "e1")
        val d0 = dot(col("e"), col("e")) - lit(2.0) * dot(col("e"), col("e0")) +
          dot(col("e0"), col("e0"))
        val d1 = dot(col("e"), col("e")) - lit(2.0) * dot(col("e"), col("e1")) +
          dot(col("e1"), col("e1"))
        val assigned = au.join(broadcast(sv), "cell")
          .select(col("cell"), when(d1 < d0, 1).otherwise(0).as("sub"), col("e"))
        quantMean(
          assigned.select(col("cell"), col("sub"),
            posexplode(col("e")).as(Seq("pos", "x"))),
          Seq(col("cell").cast("int") -> "cell", col("sub") -> "sub",
            (col("pos") + 1).cast("int") -> "dim"),
          col("x"), "cv", Some("n_members"))
      },
      Some(
        s"""$IvfAssignCte,
           |ae AS (SELECT a.vec_id, a.assigned AS cell, v.e
           |  FROM assign a JOIN v ON a.vec_id = v.vec_id),
           |sd AS (SELECT cell, MIN(vec_id) AS s0, MAX(vec_id) AS s1
           |  FROM ae GROUP BY cell),
           |sv AS (SELECT sd.cell, a0.e AS e0, a1.e AS e1 FROM sd
           |  JOIN ae a0 ON a0.vec_id = sd.s0 AND a0.cell = sd.cell
           |  JOIN ae a1 ON a1.vec_id = sd.s1 AND a1.cell = sd.cell),
           |asg AS (SELECT ae.cell, ae.e,
           |  CASE WHEN (list_dot_product(ae.e, ae.e)
           |      - 2.0 * list_dot_product(ae.e, sv.e1)
           |      + list_dot_product(sv.e1, sv.e1))
           |    < (list_dot_product(ae.e, ae.e)
           |      - 2.0 * list_dot_product(ae.e, sv.e0)
           |      + list_dot_product(sv.e0, sv.e0))
           |  THEN 1 ELSE 0 END AS sub
           |  FROM ae JOIN sv ON ae.cell = sv.cell)
           |SELECT CAST(cell AS INT) AS cell, sub, CAST(dim AS INT) AS dim,
           |  CAST(SUM(CAST(ROUND(x * 1000000000) AS BIGINT)) AS DOUBLE)
           |    / 1000000000 / COUNT(*) AS cv,
           |  CAST(COUNT(*) AS BIGINT) AS n_members
           |FROM (SELECT cell, sub, unnest(range(1, 65)) AS dim,
           |    unnest(e) AS x FROM asg)
           |GROUP BY 1, 2, 3""".stripMargin),
      "IVF cell split: deterministic in-cell 2-means (min/max-id seeds), quantized sub-centroids."),

    QueryDef(
      "sim_split_reassign",
      (s, dir) => {
        // The COMPOSED maintenance step operators/IvfMaintenance runs
        // per ingest, under one hash gate: assign everything against
        // the base-slice centroids (sim_incremental_assign's shape),
        // flag overgrown cells, execute the deterministic 2-means
        // split on exactly the flagged cells, and emit the post-split
        // assignment (vec_id, cell, sub). The flag here is 9·n_cell >
        // n_total (1.11x the 10-cell mean) rather than the operator's
        // production 1.5x — the fixture's cells sit within ±25% of the
        // mean, so the production constant would leave the split
        // branch dead on every SF; this constant exercises BOTH
        // branches under the oracle (sf0.01: one cell splits, nine
        // pass through). Scale shape: one corpus scan for centroids
        // (broadcast back), one fused argmin scan, split work keyed to
        // the flagged cells' members only — never a retrain.
        graft.functions.VectorFunctions.register(s)
        val v = t(s, dir, "embeddings")
          .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("e"))
          .cache()
        v.count() // centroid + argmin + member legs share it
        val base = v.where(col("vec_id") % 10 =!= 7)
        val cents = quantMean(
          base.select(col("label"), posexplode(col("e")).as(Seq("pos", "x"))),
          Seq(col("label") -> "c_label", (col("pos") + 1) -> "dim"),
          col("x"), "cv")
          .groupBy("c_label")
          .agg(array_sort(collect_list(struct(col("dim"), col("cv")))).as("pairs"))
          .select(col("c_label"),
            transform(col("pairs"), p => p.getField("cv")).as("c"))
        val aall = v.crossJoin(broadcast(cents))
          .select(col("vec_id"),
            struct((dot(col("e"), col("e")) - lit(2.0) * dot(col("e"), col("c")) +
              dot(col("c"), col("c"))).as("d2"), col("c_label")).as("sc"))
          .groupBy("vec_id").agg(min(col("sc")).as("b"))
          .select(col("vec_id"), col("b.c_label").as("cell"))
          .cache()
        aall.count() // occupancy + member + pass-through legs race it
        val tot = v.agg(count(lit(1)).as("n_total"))
        val flagged = aall.groupBy("cell").agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(tot))
          .where(col("n") * 9 > col("n_total"))
          .select("cell")
        val mem = aall.join(broadcast(flagged), "cell").join(v, "vec_id")
          .select(col("vec_id"), col("cell"), col("e")).cache()
        mem.count() // seed lookup + both assignment legs read it
        val seeds = mem.groupBy("cell")
          .agg(min("vec_id").as("s0"), max("vec_id").as("s1"))
        val sv = seeds
          .join(mem.select(col("vec_id").as("s0"), col("e").as("e0")), "s0")
          .join(mem.select(col("vec_id").as("s1"), col("e").as("e1")), "s1")
          .select("cell", "e0", "e1")
        val d0 = dot(col("e"), col("e")) - lit(2.0) * dot(col("e"), col("e0")) +
          dot(col("e0"), col("e0"))
        val d1 = dot(col("e"), col("e")) - lit(2.0) * dot(col("e"), col("e1")) +
          dot(col("e1"), col("e1"))
        val split = mem.join(broadcast(sv), "cell")
          .select(col("vec_id"), col("cell").cast("long").as("cell"),
            when(d1 < d0, 1).otherwise(0).as("sub"))
        aall.join(flagged, Seq("cell"), "left_anti")
          .select(col("vec_id"), col("cell").cast("long").as("cell"),
            lit(0).as("sub"))
          .unionAll(split)
      },
      Some(
        """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          |b0 AS (SELECT * FROM v WHERE vec_id % 10 <> 7),
          |cd AS (SELECT label AS c_label, CAST(dim AS INT) AS dim,
          |  CAST(SUM(CAST(ROUND(x * 1000000000) AS BIGINT)) AS DOUBLE)
          |    / 1000000000 / COUNT(*) AS cv
          |  FROM (SELECT label, unnest(range(1, 65)) AS dim, unnest(e) AS x
          |        FROM b0) GROUP BY 1, 2),
          |cent AS (SELECT c_label, list(cv ORDER BY dim) AS c FROM cd GROUP BY c_label),
          |aall AS (SELECT vec_id, c_label AS cell FROM (
          |  SELECT v.vec_id, cent.c_label, ROW_NUMBER() OVER (
          |    PARTITION BY v.vec_id ORDER BY
          |      list_dot_product(v.e, v.e) - 2.0 * list_dot_product(v.e, cent.c)
          |        + list_dot_product(cent.c, cent.c), cent.c_label) AS rk
          |  FROM v CROSS JOIN cent) WHERE rk = 1),
          |fl AS (SELECT cell FROM
          |  (SELECT cell, COUNT(*) AS n FROM aall GROUP BY cell),
          |  (SELECT COUNT(*) AS n_total FROM v)
          |  WHERE n * 9 > n_total),
          |mem AS (SELECT a.vec_id, a.cell, v.e FROM aall a
          |  JOIN fl ON a.cell = fl.cell JOIN v ON a.vec_id = v.vec_id),
          |sd AS (SELECT cell, MIN(vec_id) AS s0, MAX(vec_id) AS s1
          |  FROM mem GROUP BY cell),
          |sv AS (SELECT sd.cell, m0.e AS e0, m1.e AS e1 FROM sd
          |  JOIN mem m0 ON m0.cell = sd.cell AND m0.vec_id = sd.s0
          |  JOIN mem m1 ON m1.cell = sd.cell AND m1.vec_id = sd.s1)
          |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell, CAST(0 AS INT) AS sub
          |FROM aall a LEFT JOIN fl ON a.cell = fl.cell WHERE fl.cell IS NULL
          |UNION ALL
          |SELECT mem.vec_id, CAST(mem.cell AS BIGINT) AS cell,
          |  CAST(CASE WHEN
          |    (list_dot_product(mem.e, mem.e)
          |      - 2.0 * list_dot_product(mem.e, sv.e1)
          |      + list_dot_product(sv.e1, sv.e1))
          |    < (list_dot_product(mem.e, mem.e)
          |      - 2.0 * list_dot_product(mem.e, sv.e0)
          |      + list_dot_product(sv.e0, sv.e0))
          |  THEN 1 ELSE 0 END AS INT) AS sub
          |FROM mem JOIN sv ON mem.cell = sv.cell""".stripMargin),
      "Composed IVF maintenance: assign, flag overgrown cells, split them, emit the post-split assignment."),

    QueryDef(
      "sim_merge_rehome",
      (s, dir) => {
        // The INVERSE maintenance step — operators/IvfMaintenance
        // .mergeUnderfull's rule under one hash gate: assign everything
        // against the base-slice centroids (sim_split_reassign's
        // prefix), flag UNDERFULL cells, retire them, and argmin-rehome
        // exactly their members onto the nearest SURVIVING centroid.
        // The flag here is 100·n_cell < 9·n_total (0.9x the 10-cell
        // mean) rather than the operator's production half-mean — the
        // fixture's cells sit within ±25% of the mean, so the
        // production constant would leave the rehome branch dead on
        // every SF; this constant flags 1-2 cells per SF and leaves
        // 8-9 survivors, exercising BOTH branches under the oracle.
        // Scale shape: one corpus scan for centroids (broadcast back),
        // one fused argmin scan, rehome work keyed to the flagged
        // cells' members x survivor broadcast — never a retrain, never
        // a second corpus pass.
        graft.functions.VectorFunctions.register(s)
        val v = t(s, dir, "embeddings")
          .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("e"))
          .cache()
        v.count() // centroid + argmin + member legs share it
        val base = v.where(col("vec_id") % 10 =!= 7)
        val cents = quantMean(
          base.select(col("label"), posexplode(col("e")).as(Seq("pos", "x"))),
          Seq(col("label") -> "c_label", (col("pos") + 1) -> "dim"),
          col("x"), "cv")
          .groupBy("c_label")
          .agg(array_sort(collect_list(struct(col("dim"), col("cv")))).as("pairs"))
          .select(col("c_label"),
            transform(col("pairs"), p => p.getField("cv")).as("c"))
          .cache()
        cents.count() // the argmin leg and the survivor leg both read it
        val aall = v.crossJoin(broadcast(cents))
          .select(col("vec_id"),
            struct((dot(col("e"), col("e")) - lit(2.0) * dot(col("e"), col("c")) +
              dot(col("c"), col("c"))).as("d2"), col("c_label")).as("sc"))
          .groupBy("vec_id").agg(min(col("sc")).as("b"))
          .select(col("vec_id"), col("b.c_label").as("cell"))
          .cache()
        aall.count() // occupancy + member + pass-through legs race it
        val tot = v.agg(count(lit(1)).as("n_total"))
        val fl = aall.groupBy("cell").agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(tot))
          .where(col("n") * 100 < col("n_total") * 9)
          .select("cell")
        val surv = cents.join(broadcast(fl),
          cents("c_label") === fl("cell"), "left_anti")
        val mem = aall.join(broadcast(fl), "cell").join(v, "vec_id")
          .select(col("vec_id"), col("e"))
        val re = mem.crossJoin(broadcast(surv))
          .select(col("vec_id"),
            struct((dot(col("e"), col("e")) - lit(2.0) * dot(col("e"), col("c")) +
              dot(col("c"), col("c"))).as("d2"), col("c_label")).as("sc"))
          .groupBy("vec_id").agg(min(col("sc")).as("b"))
          .select(col("vec_id"), col("b.c_label").cast("long").as("cell"),
            lit(1).as("rehomed"))
        aall.join(broadcast(fl), Seq("cell"), "left_anti")
          .select(col("vec_id"), col("cell").cast("long").as("cell"),
            lit(0).as("rehomed"))
          .unionAll(re)
      },
      Some(
        """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          |b0 AS (SELECT * FROM v WHERE vec_id % 10 <> 7),
          |cd AS (SELECT label AS c_label, CAST(dim AS INT) AS dim,
          |  CAST(SUM(CAST(ROUND(x * 1000000000) AS BIGINT)) AS DOUBLE)
          |    / 1000000000 / COUNT(*) AS cv
          |  FROM (SELECT label, unnest(range(1, 65)) AS dim, unnest(e) AS x
          |        FROM b0) GROUP BY 1, 2),
          |cent AS (SELECT c_label, list(cv ORDER BY dim) AS c FROM cd GROUP BY c_label),
          |aall AS (SELECT vec_id, c_label AS cell FROM (
          |  SELECT v.vec_id, cent.c_label, ROW_NUMBER() OVER (
          |    PARTITION BY v.vec_id ORDER BY
          |      list_dot_product(v.e, v.e) - 2.0 * list_dot_product(v.e, cent.c)
          |        + list_dot_product(cent.c, cent.c), cent.c_label) AS rk
          |  FROM v CROSS JOIN cent) WHERE rk = 1),
          |fl AS (SELECT cell FROM
          |  (SELECT cell, COUNT(*) AS n FROM aall GROUP BY cell),
          |  (SELECT COUNT(*) AS n_total FROM v)
          |  WHERE n * 100 < n_total * 9),
          |surv AS (SELECT cent.c_label, cent.c FROM cent
          |  LEFT JOIN fl ON cent.c_label = fl.cell WHERE fl.cell IS NULL),
          |mem AS (SELECT a.vec_id, v.e FROM aall a
          |  JOIN fl ON a.cell = fl.cell JOIN v ON a.vec_id = v.vec_id),
          |re AS (SELECT vec_id, c_label AS cell FROM (
          |  SELECT mem.vec_id, surv.c_label, ROW_NUMBER() OVER (
          |    PARTITION BY mem.vec_id ORDER BY
          |      list_dot_product(mem.e, mem.e)
          |        - 2.0 * list_dot_product(mem.e, surv.c)
          |        + list_dot_product(surv.c, surv.c), surv.c_label) AS rk
          |  FROM mem CROSS JOIN surv) WHERE rk = 1)
          |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell, CAST(0 AS INT) AS rehomed
          |FROM aall a LEFT JOIN fl ON a.cell = fl.cell WHERE fl.cell IS NULL
          |UNION ALL
          |SELECT vec_id, CAST(cell AS BIGINT) AS cell, CAST(1 AS INT) AS rehomed
          |FROM re""".stripMargin),
      "Composed IVF maintenance, the underfull inverse: retire flagged cells, argmin-rehome their members to surviving centroids."),

    QueryDef(
      "sim_asg_log_fold",
      (s, dir) => {
        // The log-structured index READ path (operators/IvfMaintenance
        // and DeltaIngest keep every index table as immutable seg=<n>
        // increments) under the oracle: a deterministic 3-segment
        // assignment log synthesized from the embeddings table — seg 0
        // assigns every vector to its label cell; seg 1 moves the
        // vec_id%7==0 vectors (tombstone in the OLD cell + live row in
        // the new one, the rule that makes the fold commute with cell
        // predicates); seg 2 moves the %14==0 subset again. The fold
        // is the operators' latest-segment-wins + tombstone-drop rule
        // per (cell, vec_id): one combinable max(struct), shuffle
        // keyed on (cell, vec_id) — never index-wide.
        val v = t(s, dir, "embeddings")
          .select(col("vec_id"), col("label").cast("long").as("cell"))
        val m1 = v.where(col("vec_id") % 7 === 0)
        val m2 = v.where(col("vec_id") % 14 === 0)
        def row(src: DataFrame, cellShift: Int, seg: Int, dead: Boolean) =
          src.select(col("vec_id"), (col("cell") + cellShift).as("cell"),
            lit(seg.toLong).as("seg"), lit(dead).as("dead"))
        row(v, 0, 0, dead = false)
          .unionAll(row(m1, 0, 1, dead = true))
          .unionAll(row(m1, 100, 1, dead = false))
          .unionAll(row(m2, 100, 2, dead = true))
          .unionAll(row(m2, 200, 2, dead = false))
          .groupBy("cell", "vec_id")
          .agg(max(struct(col("seg"), col("dead"))).as("b"))
          .where(!col("b.dead"))
          .select(col("vec_id"), col("cell"))
      },
      Some(
        """WITH base AS (SELECT vec_id, CAST(label AS BIGINT) AS cell FROM embeddings),
          |log AS (
          |  SELECT vec_id, cell, 0 AS seg, false AS dead FROM base
          |  UNION ALL SELECT vec_id, cell, 1, true FROM base WHERE vec_id % 7 = 0
          |  UNION ALL SELECT vec_id, cell + 100, 1, false FROM base WHERE vec_id % 7 = 0
          |  UNION ALL SELECT vec_id, cell + 100, 2, true FROM base WHERE vec_id % 14 = 0
          |  UNION ALL SELECT vec_id, cell + 200, 2, false FROM base WHERE vec_id % 14 = 0)
          |SELECT vec_id, cell FROM (
          |  SELECT vec_id, cell, dead,
          |    ROW_NUMBER() OVER (PARTITION BY cell, vec_id ORDER BY seg DESC) AS rn
          |  FROM log)
          |WHERE rn = 1 AND NOT dead""".stripMargin),
      "Log-structured index fold: latest committed segment wins per (cell, vec_id); tombstones drop."),

    QueryDef(
      "sim_pq_code_fold",
      (s, dir) => {
        // The PQ-codes read path (operators/IvfMaintenance.adcKnn)
        // under the oracle: codes are a latest-wins log per
        // (vec_id, m) with NO tombstones — a removed vector's codes
        // are unreachable because the serve path joins them through
        // the folded lists, so liveness is a semi-join, not a flag.
        // Synthesized 3-segment log over the embeddings table: seg 0
        // codes every vector in 8 subspaces (code = label), seg 1
        // re-encodes the vec_id%5==0 vectors, seg 2 the %10==0 subset
        // again; the %3==0 vectors are "removed from the lists" and
        // must not survive the reachability screen. Fold shape: one
        // combinable max(struct) keyed (vec_id, m) + an id-keyed
        // semi-join — never index-wide.
        val v = t(s, dir, "embeddings")
          .select(col("vec_id"), col("label").cast("long").as("c0"))
          .select(col("vec_id"), col("c0"),
            explode(sequence(lit(0), lit(7))).as("m"))
        def seg(src: DataFrame, shift: Int, n: Int) =
          src.select(col("vec_id"), col("m"),
            (col("c0") + shift).as("code"), lit(n.toLong).as("seg"))
        val live = t(s, dir, "embeddings")
          .where(col("vec_id") % 3 =!= 0).select("vec_id")
        seg(v, 0, 0)
          .unionAll(seg(v.where(col("vec_id") % 5 === 0), 1, 1))
          .unionAll(seg(v.where(col("vec_id") % 10 === 0), 2, 2))
          .groupBy("vec_id", "m")
          .agg(max(struct(col("seg"), col("code"))).as("b"))
          .join(live, Seq("vec_id"), "left_semi")
          .select(col("vec_id"), col("m"), col("b.code").as("code"))
      },
      Some(
        """WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS c0, unnest(range(0, 8)) AS m
          |  FROM embeddings),
          |log AS (
          |  SELECT vec_id, m, c0 AS code, 0 AS seg FROM v
          |  UNION ALL SELECT vec_id, m, c0 + 1, 1 FROM v WHERE vec_id % 5 = 0
          |  UNION ALL SELECT vec_id, m, c0 + 2, 2 FROM v WHERE vec_id % 10 = 0)
          |SELECT vec_id, CAST(m AS INT) AS m, code FROM (
          |  SELECT vec_id, m, code,
          |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY seg DESC) AS rn
          |  FROM log)
          |WHERE rn = 1 AND vec_id % 3 <> 0""".stripMargin),
      "PQ-codes log fold: latest segment wins per (vec_id, subspace); liveness via the lists semi-join, no tombstones."))
}
