package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-11 training-pipeline operators —
  * properties the DuckDB oracle compare can't see (it only proves both
  * engines agree, not that the shared semantics are right). */
class PipelineOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("t_cms_heavy: sketch estimate is a one-sided overestimate") {
    val rows = run("t_cms_heavy").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val exact = r.getAs[Long]("c_exact")
      val est = r.getAs[Long]("cms_est")
      assert(est >= exact, s"CMS must never undercount: $r")
      assert(r.getAs[Long]("overcount") == est - exact)
    }
  }

  test("t_cms_heavy: estimate is exact when no bucket collides at this SF") {
    // with 512 buckets x 4 rows and a few thousand distinct words the
    // MIN over 4 rows should usually equal the exact count for the
    // heavy hitters; require at least half exact so a broken hash
    // (all words in one bucket) fails loudly
    val rows = run("t_cms_heavy").collect()
    val nExact = rows.count(r => r.getAs[Long]("overcount") == 0L)
    assert(nExact * 2 >= rows.length, s"only $nExact/20 CMS-exact — hash degenerate?")
  }

  test("t_pmi_colloc: every surviving bigram meets the min count and PMI is finite") {
    val rows = run("t_pmi_colloc").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("c12") >= 5)
      // integer ppm ratio: positive (a c12>=5 collocation is never
      // rarer than independence by 1e6x on this corpus) and inside
      // e^50 equivalent
      val ppm = r.getAs[Long]("pmi_ratio_ppm")
      assert(ppm >= 0 && ppm < math.exp(50).toLong)
    }
    // the conversion's contract: ln(ppm/1e6) IS the PMI — spot-check
    // one row's order against raw-count arithmetic at this SF
    assert(rows.exists(_.getAs[Long]("pmi_ratio_ppm") > 1000000L),
      "at least one genuine collocation must beat independence")
  }

  test("t_pmi_colloc: ratio arithmetic survives counts past the int64 wrap point") {
    // c12·T·10⁶ wraps a bigint once c12·T > 9.2e12 — any frequent
    // bigram on a realistic corpus. The query computes in
    // decimal(38,0); this pins the exact decimal expression it ships
    // against BigInt ground truth on counts that WOULD wrap (old form:
    // c12·t·10⁶ = 5e21). Non-ANSI Spark would have wrapped silently.
    import spark.implicits._
    val t = 5000000000000L // 5e12 tokens (a ~100 TB corpus)
    val (c12, n, c1, c2) = (1000000L, t - 40000000L, 900000000L, 700000000L)
    val got = Seq((c12, t, n, c1, c2)).toDF("c12", "t", "n", "c1", "c2")
      .selectExpr("""cast(cast(c12 as decimal(38,0)) * t * 1000000 div n
                    |  as decimal(38,0)) * t
                    |  div (cast(c1 as decimal(38,0)) * c2)""".stripMargin)
      .as[Long].head()
    val want =
      (BigInt(c12) * t * 1000000 / n * t / (BigInt(c1) * c2)).toLong
    assert(got == want && want > 0,
      s"decimal path diverged from BigInt ground truth: $got vs $want")
  }

  test("t_shard_shuffle: positions are a contiguous 1..n permutation per shard") {
    val rows = run("t_shard_shuffle").collect()
    assert(rows.length == 500)
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (shard, rs) =>
      val pos = rs.map(_.getAs[Int]("pos")).sorted
      assert(pos.toSeq == (1 to rs.length), s"shard $shard write order has gaps")
    }
    // deterministic: same seed -> same assignment on a re-run
    val again = run("t_shard_shuffle").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet ==
      again.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet)
  }

  test("dedup_incremental: one verdict row per batch doc; flags consistent") {
    val rows = run("dedup_incremental").collect()
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length)
    assert(ids.forall(_ % 5 == 0))
    rows.foreach { r =>
      val exactDup = r.getAs[Int]("is_exact_dup")
      val n = r.getAs[Long]("n_exact_matches")
      assert((exactDup == 1) == (n > 0), s"flag/count disagree: $r")
    }
  }

  test("dedup_incremental: near-candidate flag agrees with a direct band probe") {
    import org.apache.spark.sql.functions._
    // an independent formulation: any batch doc sharing a FULL minhash
    // signature with a base doc must be flagged as a near candidate
    // (identical signature => all 4 bands collide)
    val sig = run("dedup_minhash_sig")
    val base = sig.where(col("doc_id") % 5 =!= 0)
      .select(col("mh0"), col("mh1"), col("mh2"), col("mh3")).distinct()
    val mustHit = sig.where(col("doc_id") % 5 === 0)
      .join(base, Seq("mh0", "mh1", "mh2", "mh3"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flagged = run("dedup_incremental")
      .where(col("is_near_candidate") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(mustHit.subsetOf(flagged),
      s"sig-identical batch docs missing from near candidates: ${mustHit -- flagged}")
  }

  test("sim_hard_negatives: negatives really are cross-label and ranked by cosine") {
    import org.apache.spark.sql.functions._
    val rows = run("sim_hard_negatives").collect()
    assert(rows.nonEmpty)
    val labels = SparkEntry.queries("sim_ivf_assign")(spark, sf) // has vec_id+label
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.length <= 3)
      val byRk = rs.sortBy(_.getAs[Int]("rk"))
      assert(byRk.map(_.getAs[Int]("rk")).toSeq == (1 to rs.length))
      // cosines non-increasing in rank
      val cos = byRk.map(_.getAs[Double]("cos"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      rs.foreach { r =>
        assert(labels(r.getAs[Long]("neighbor_id")) == r.getAs[Int]("n_label"))
        assert(r.getAs[Int]("n_label") != labels(q), s"same-label negative for query $q")
      }
    }
  }

  test("sim_knn_classify: one verdict per sampled vector, votes bounded, majority beats runner-up") {
    import org.apache.spark.sql.functions._
    val rows = run("sim_knn_classify").collect()
    val nQueries = spark.read.parquet(s"$sf/embeddings.parquet")
      .where(col("vec_id") % 5 === 0).count()
    assert(rows.length.toLong == nQueries, "one row per sampled query")
    assert(rows.map(_.getAs[Long]("query_id")).distinct.length == rows.length)
    rows.foreach { r =>
      val votes = r.getAs[Long]("n_votes")
      // the winner of a 10-ballot vote over >= 1 candidate labels
      assert(votes >= 1 && votes <= 10, s"vote count out of range: $r")
      assert(r.getAs[Int]("correct") ==
        (if (r.getAs[Int]("pred_label") == r.getAs[Int]("true_label")) 1 else 0))
      // majority of 10 ballots needs > 10/|labels| when all 10 labels
      // appear; at minimum the winner holds at least ceil(10/10) = 1
      assert(r.getAs[Int]("pred_label") >= 0 && r.getAs[Int]("pred_label") <= 9)
    }
    // the fixture's labels are only weakly clustered (measured 0.26
    // here), but a broken vote collapses to the 10% random baseline —
    // require clear daylight above that
    val acc = rows.map(_.getAs[Int]("correct")).sum.toDouble / rows.length
    assert(acc > 0.15, s"pseudo-label accuracy $acc is at the random baseline")
  }

  test("sim_source_map: full strict-upper pair matrix, cosines valid, one pair replays exactly") {
    import org.apache.spark.sql.functions._
    val rows = run("sim_source_map").collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val bySrc = docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("source"), col("embedding")).collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val n = bySrc.size
    assert(rows.length == n * (n - 1) / 2, "strict upper triangle of the matrix")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12, s"cosine out of range: $r")
    }
    // exact replication of one pair with the same quantized-mean +
    // sequential-fold arithmetic
    val Seq(sa, sb) = bySrc.keys.toSeq.sorted.take(2)
    def centroid(vs: Array[Array[Double]]): Array[Double] =
      Array.tabulate(64) { d =>
        vs.map(v => math.round(v(d) * 1e9)).sum.toDouble / 1e9 / vs.length
      }
    def dotd(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val (ca, cb) = (centroid(bySrc(sa)), centroid(bySrc(sb)))
    val want = dotd(ca, cb) / math.sqrt(dotd(ca, ca) * dotd(cb, cb))
    val got = rows.find(r => r.getString(0) == sa && r.getString(1) == sb).get
      .getAs[Double]("cos")
    assert(got == want, s"pair ($sa,$sb) drifted: got $got want $want")
  }

  test("sim_ivf_train: occupancy partitions the corpus every round, round 1 matches the assigner") {
    import org.apache.spark.sql.functions._
    val rows = run("sim_ivf_train").collect()
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val byIter = rows.groupBy(_.getAs[Int]("iter"))
    assert(byIter.keySet == Set(1, 2, 3))
    byIter.foreach { case (it, rs) =>
      assert(rs.map(_.getAs[Long]("n_assigned")).sum == nVecs,
        s"round $it occupancy must partition the corpus")
      // shift² is a squared distance of quantized means: exact zero on
      // a converged cell, never negative
      rs.foreach(r => assert(r.getAs[Double]("shift2") >= -1e-9, s"$r"))
    }
    // round 1 assigns against the SAME label-seeded centroids as
    // sim_ivf_assign — occupancies must agree cell for cell
    val want = run("sim_ivf_assign").collect()
      .groupBy(_.getAs[Int]("assigned")).map { case (c, rs) => c -> rs.length.toLong }
    val got = byIter(1).map(r => r.getAs[Int]("c_label") -> r.getAs[Long]("n_assigned")).toMap
    assert(got == want, "round-1 occupancy drifted from sim_ivf_assign")
  }

  test("decontaminate dfCap: a non-binding cap is the identity, a zero cap matches nothing") {
    import org.apache.spark.sql.functions._
    val base = graft.queries.DedupQueries.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val capped = graft.queries.DedupQueries
      .decontaminate(spark, sf, dfCap = Some(Int.MaxValue)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == base, "df <= MaxValue must not change anything")
    assert(graft.queries.DedupQueries
      .decontaminate(spark, sf, dfCap = Some(0)).count() == 0,
      "no shingle has df <= 0")
    // a binding cap can only REMOVE evidence, never add it
    val tight = graft.queries.DedupQueries
      .decontaminate(spark, sf, dfCap = Some(2)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    tight.foreach { case (id, n) => assert(n <= base(id), s"doc $id gained evidence") }
  }

  test("decontaminateGrams: long grams only fire on near-verbatim overlap") {
    import org.apache.spark.sql.functions._
    val g8 = graft.queries.DedupQueries.decontaminateGrams(spark, sf).collect()
    // every reported doc is in the train bucket and shares at least one
    // full 8-word gram with the holdout
    g8.foreach { r =>
      val id = r.getLong(0)
      assert(id % 1000003L * 2654435761L % 100 < 80, s"holdout doc reported: $r")
      assert(r.getAs[Long]("n_shared") >= 1 &&
        r.getAs[Long]("n_shared") <= r.getAs[Int]("n_grams").toLong)
    }
    // the long-gram evidence set is a small subset of the 3-gram one —
    // the false-positive collapse the variant exists for
    val g3docs = graft.queries.DedupQueries.decontaminate(spark, sf)
      .where(col("n_shared") * 5 >= col("n_shingles")).count()
    val g8docs = g8.count(r => r.getAs[Long]("n_shared") * 5 >= r.getAs[Int]("n_grams").toLong)
    assert(g8docs <= g3docs, "8-gram flags must not exceed 3-gram flags")
  }

  test("q_skew_profile: ratios floor at uniform, the known-skewed key reads hot") {
    val rows = run("q_skew_profile").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 4)
    rows.values.foreach { r =>
      // max >= total/n_keys, so the per-mille ratio is always >= ~1000
      // (integer floor can shave at most 1)
      assert(r.getAs[Long]("skew_permille") >= 999, s"impossible ratio: $r")
      assert(r.getAs[Long]("max_cnt") * r.getAs[Long]("n_keys")
        >= r.getAs[Long]("total"))
    }
    // 5 event types over the whole stream: far more uniform than the
    // per-order lineitem key (1..7 items); both must profile sane
    assert(rows("events.event_type").getAs[Long]("n_keys") == 5)
  }

  test("q_write_plan: shard math is exact ceil-div and hits the size target") {
    val rows = run("q_write_plan").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val chars = r.getAs[Long]("total_chars")
      val shards = r.getAs[Long]("n_shards")
      assert(shards == (chars + 262143L) / 262144L, s"ceil-div drifted: $r")
      assert(r.getAs[Long]("avg_shard_chars") == chars / shards)
      // a planned shard never exceeds 2x the target on average
      assert(r.getAs[Long]("avg_shard_chars") <= 262144L)
    }
  }

  test("sim_incremental_assign: base+delta partition the corpus, split flag is the exact ratio") {
    import org.apache.spark.sql.functions._
    val rows = run("sim_incremental_assign").collect()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val nTotal = emb.count()
    val nDelta = emb.where(col("vec_id") % 10 === 7).count()
    assert(rows.map(_.getAs[Long]("n_base")).sum == nTotal - nDelta)
    assert(rows.map(_.getAs[Long]("n_new")).sum == nDelta,
      "every delta vector must land in some existing cell")
    rows.foreach { r =>
      val occ = r.getAs[Long]("n_base") + r.getAs[Long]("n_new")
      assert(r.getAs[Int]("needs_split") == (if (occ * 20 > nTotal * 3) 1 else 0),
        s"split flag drifted: $r")
    }
  }

  test("t_hash_outlier: one score per doc in (0,1], identical-text docs tie, replayed exactly") {
    import org.apache.spark.sql.functions._
    val rows = run("t_hash_outlier").collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
    assert(rows.length == docs.length, "one score per doc")
    rows.foreach { r =>
      val c = r.getAs[Double]("cos")
      // tf and S share every doc's mass, so the dot is strictly positive
      assert(c > 0 && c <= 1.0 + 1e-12, s"cosine out of range: $r")
    }
    // exact driver-side replay of the integer formulation
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(w: String): Long = {
      val h = md.digest(w.getBytes("UTF-8")).take(4)
        .foldLeft(0L)((a, b) => a << 8 | (b & 0xff))
      h % 64
    }
    val tf = docs.map { r =>
      (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).groupBy(bucket).map { case (k, v) => k -> v.length.toLong })
    }
    val sv = tf.groupBy(_._2).map { case (src, ds) =>
      src -> ds.flatMap(_._3).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    }
    val got = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("cos")).toMap
    tf.take(50).foreach { case (id, src, v) =>
      val s = sv(src)
      val p = v.map { case (b, t) => t * s(b) }.sum
      val b2 = v.values.map(t => t * t).sum
      val c0 = s.values.map(x => x * x).sum
      val want = p / (math.sqrt(b2.toDouble) * math.sqrt(c0.toDouble))
      assert(got(id) == want, s"doc $id drifted: got ${got(id)} want $want")
    }
  }

  test("q_quantile_sketch: approx quantile brackets the exact within one bin width") {
    import org.apache.spark.sql.functions._
    val vmax = SparkEntry.queries("q_value_quantiles")(spark, sf)
      .agg(max("v_max")).collect()(0).getDouble(0)
    val binW = vmax / 128
    val rows = run("q_quantile_sketch").collect()
    assert(rows.length >= 9) // >=3 types x 3 quantiles at any SF
    // the defining CDF property of the upper-edge estimate, checked
    // against the raw values: at least p·n values sit at or below the
    // reported edge, and strictly fewer than p·n sit below the bin's
    // LOWER edge (i.e. the sketch picked the first sufficient bin)
    val vals = spark.read.parquet(s"$sf/events.parquet")
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(_.getDouble(1)).sorted }
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val p = r.getAs[Double]("p")
      val approx = r.getAs[Double]("approx_q")
      val xs = vals(t)
      val need = p * xs.length
      assert(xs.count(_ <= approx + 1e-9) >= need, s"edge too low: $r")
      assert(xs.count(_ < approx - binW - 1e-9) < need, s"edge too high: $r")
    }
  }

  test("q_kmv_union: union estimate tracks exact; naive sum double-counts") {
    val r = run("q_kmv_union").collect()(0)
    val exact = r.getAs[Long]("n_exact")
    val naive = r.getAs[Long]("n_naive_sum")
    val est = r.getAs[Double]("est_union")
    assert(naive >= exact, "per-type sum can never be below the union")
    // k=8 KMV has ~1/sqrt(k-1) ~ 38% relative error; allow 3 sigma
    assert(est > exact * 0.1 && est < exact * 4 + 50,
      s"union estimate unreasonable: est=$est exact=$exact")
  }

  test("q_kmv_jaccard: estimates are sketch-consistent and track the exact overlap") {
    import org.apache.spark.sql.functions._
    val r = run("q_kmv_jaccard").collect()(0)
    val rho = r.getAs[Long]("rho")
    val inter = r.getAs[Long]("n_inter_exact")
    val union = r.getAs[Long]("n_union_exact")
    assert(rho >= 0 && rho <= 8, s"rho out of sketch range: $rho")
    assert(inter <= union)
    assert(r.getAs[Double]("est_jaccard") == rho / 8.0)
    // exact counts must agree with a direct two-set computation
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val a = ev.where(col("event_type") === "click")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val b = ev.where(col("event_type") === "purchase")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(inter == (a & b).size.toLong)
    assert(union == (a | b).size.toLong)
    // k=8 is coarse, but a zero/huge estimate against a real overlap
    // means the sketch intersection logic is broken
    val estI = r.getAs[Double]("est_intersection")
    if (inter > 0) assert(estI > 0, "overlap exists but sketch says 0... rho lost")
    assert(estI < union * 6 + 50, s"intersection estimate unreasonable: $estI")
  }

  test("dedup_triangles: incidence sums to 3 per triangle, bounded by degree pairs") {
    val rows = run("dedup_triangles").collect()
    assert(rows.nonEmpty)
    val totalIncidence = rows.map(_.getAs[Int]("n_tri").toLong).sum
    assert(totalIncidence % 3 == 0,
      s"every triangle touches exactly 3 docs; got incidence $totalIncidence")
    rows.foreach { r =>
      val d = r.getAs[Int]("degree")
      val t = r.getAs[Int]("n_tri")
      assert(d >= 1)
      assert(t <= d.toLong * (d - 1) / 2,
        s"more triangles than neighbor pairs at $r")
    }
  }

  test("dedup_triangles: doc set is exactly the verified-pair doc set") {
    val pairDocs = run("dedup_lsh_verified").collect()
      .flatMap(r => Seq(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val triDocs = run("dedup_triangles").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(triDocs == pairDocs)
  }

  test("t_oov_rate: rates in [0,1], consistent with counts, vocab cap binds") {
    val rows = run("t_oov_rate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val oov = r.getAs[Long]("n_oov")
      val rate = r.getAs[Double]("oov_rate")
      assert(oov >= 0 && oov <= n)
      assert(math.abs(rate - oov.toDouble / n) < 1e-12)
    }
    // the cap must bind at this SF (otherwise the query degenerates to
    // rate=0 everywhere and tests nothing)
    assert(rows.exists(_.getAs[Long]("n_oov") > 0), "vocab cap never bound")
  }

  test("dedup_cluster_sizes: histogram accounts for every clustered doc, sizes >= 2") {
    val hist = run("dedup_cluster_sizes").collect()
    assert(hist.nonEmpty)
    // every component has >= 2 members (it came from a pair graph)
    assert(hist.forall(_.getAs[Int]("cluster_size") >= 2))
    val docsInHist = hist.map(r =>
      r.getAs[Int]("cluster_size").toLong * r.getAs[Long]("n_clusters")).sum
    val docsInCc = run("dedup_clusters").count()
    assert(docsInHist == docsInCc,
      s"histogram covers $docsInHist docs, CC labels $docsInCc")
  }

  test("s_cms_topk and s_hll_users: sketch evals are one-sided / in-envelope per window") {
    run("s_cms_topk").collect().foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("c_exact"),
        s"CMS undercounted: $r")
    }
    run("s_hll_users").collect().foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Double]("hll_est")
      assert(est > 0 && est < exact * 30 + 100, s"HLL unhinged: $r")
      assert(r.getAs[Int]("n_buckets_hit") <= math.min(64, exact),
        s"more registers hit than distinct users: $r")
    }
  }

  test("dedup_keep_best: one survivor per cluster, consistent with the size histogram") {
    val best = run("dedup_keep_best").collect()
    assert(best.nonEmpty)
    assert(best.forall(_.getAs[Int]("n_members") >= 2))
    assert(best.forall(_.getAs[Long]("chars_dropped") >= 0))
    // the survivor is a member of its own cluster (cluster_id = min id)
    assert(best.forall(r =>
      r.getAs[Long]("kept_doc") >= r.getAs[Long]("cluster_id")))
    // membership totals agree with the independent histogram query
    val histDocs = run("dedup_cluster_sizes").collect().map(r =>
      r.getAs[Int]("cluster_size").toLong * r.getAs[Long]("n_clusters")).sum
    assert(best.map(_.getAs[Int]("n_members").toLong).sum == histDocs)
  }

  test("dedup_pipeline_funnel: stages partition every doc, near-drops match survivor election") {
    val f = run("dedup_pipeline_funnel").collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      val parts = Seq("n_near_dropped", "n_holdout", "n_contaminated", "n_final")
        .map(r.getAs[Long](_)).sum
      assert(parts == r.getAs[Long]("n_docs"),
        s"funnel stages don't partition the docs: $r")
      assert(r.getAs[Long]("chars_final") >= 0)
    }
    // total near-drops = sum over clusters of (members - 1), i.e. the
    // docs dedup_keep_best decided NOT to keep
    val expectedDrops = run("dedup_keep_best").collect()
      .map(_.getAs[Int]("n_members").toLong - 1).sum
    assert(f.map(_.getAs[Long]("n_near_dropped")).sum == expectedDrops)
  }

  test("s_drift_kl: windows partition the stream, KL is Gibbs-nonnegative and replays") {
    import org.apache.spark.sql.functions._
    val rows = run("s_drift_kl").collect()
    assert(rows.nonEmpty)
    val ev = spark.read.parquet(s"$sf/events.parquet")
    assert(rows.map(_.getAs[Long]("n_events")).sum == ev.count(),
      "windows must partition every event")
    // Gibbs: KL >= 0 up to per-term 1e-9 quantization slack (<= 5 terms)
    rows.foreach(r => assert(r.getAs[Double]("kl") >= -1e-8, s"negative KL: $r"))
    // replicate the heaviest window driver-side from raw counts
    val top = rows.maxBy(_.getAs[Long]("n_events"))
    val ws = top.getAs[Long]("window_start_us")
    val global = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTot = global.values.sum
    val inWin = ev
      .select(graft.queries.Tables.tsUs(ev).as("us"), col("event_type"))
      .where(col("us") >= ws && col("us") < ws + 900000000L)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val nW = inWin.map(_._2).sum
    val want = inWin.map { case (t, n) =>
      (n.toDouble / nW) * math.log((n * nTot).toDouble / (nW * global(t)).toDouble)
    }.sum
    assert(math.abs(top.getAs[Double]("kl") - want) < 1e-6,
      s"KL drifted from direct recompute: got ${top.getAs[Double]("kl")}, want $want")
  }

  test("s_log_quantiles: bucket edge brackets the disc quantile, monotone in p") {
    val rows = run("s_log_quantiles").collect()
    assert(rows.nonEmpty)
    // the TRUE invariant is against the DISC quantile v_k (k-th smallest,
    // k = ceil(p·n)) — that's the value whose bucket the cum>=p·n scan
    // selects, so edge ∈ [v_k - 0.01, 2·v_k + 0.02] by log2-bin
    // construction. The query's exact_q (interpolating percentile) is
    // only a report: on a 2-event window it averages the two values and
    // can sit arbitrarily far above the p50 bucket edge.
    import org.apache.spark.sql.functions.col
    val raw = graft.queries.Tables.t(spark, sf, "events")
    val byWindow = raw
      .select(graft.queries.Tables.tsUs(raw).as("us"), col("value"))
      .collect()
      .groupBy(r => Math.floorDiv(r.getLong(0), 3600000000L) * 3600000000L)
      .map { case (ws, rs) => ws -> rs.map(_.getDouble(1)).sorted }
    rows.foreach { r =>
      val vs = byWindow(r.getAs[Long]("window_start_us"))
      val k = math.ceil(r.getAs[Double]("p") * vs.length).toInt.max(1)
      val vk = vs(k - 1)
      val a = r.getAs[Double]("approx_q")
      assert(a >= vk - 0.01 && a <= 2 * vk + 0.02,
        s"edge $a outside [${vk - 0.01}, ${2 * vk + 0.02}] for disc-q $vk: $r")
    }
    rows.groupBy(_.getAs[Long]("window_start_us")).foreach { case (_, ws) =>
      val byP = ws.sortBy(_.getAs[Double]("p")).map(_.getAs[Double]("approx_q"))
      assert(byP.sliding(2).forall(s => s.head <= s.last),
        s"approx quantiles not monotone in p: ${ws.mkString(",")}")
    }
  }

  test("q_hll_distinct: raw estimator lands within the m=64 error envelope") {
    val rows = run("q_hll_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("hll_est")
      val hit = r.getAs[Int]("n_buckets_hit")
      assert(hit >= 1 && hit <= 64)
      // raw HLL (no small-range correction) biases HIGH at n << m; the
      // standard error at m=64 is ~13%, so accept a generous band that
      // still catches a broken register computation (off by 2x+)
      assert(est > 0)
      assert(est < exact * 3 + 200, s"HLL wildly high: est=$est exact=$exact")
      assert(est > exact / 3 - 10, s"HLL wildly low: est=$est exact=$exact")
    }
  }
}
