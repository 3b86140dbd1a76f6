package graft

import org.scalatest.funsuite.AnyFunSuite

/** Results must be BIT-IDENTICAL at any parallelism — the property the
  * whole oracle-parity design (quantized decimal sums, sequential dot
  * folds, total-order tie-breaks) exists to guarantee. A 1000-executor
  * cluster partitions nothing like local[4]; these tests re-run
  * representative queries under different shuffle-partition counts and
  * require exact row-set equality, catching any aggregation that
  * silently depends on partial-aggregation order. */
class DeterminismSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // one query per determinism-sensitive family: decimal-quantized float
  // agg, broadcast-model integer scores, iterative float centroids,
  // cosine re-rank, rollup re-aggregation, heap-based top-k, KMV sketch
  private val queries = Seq(
    "q1_pricing_summary", "t_unigram_logppl", "sim_ivf_assign",
    "sim_bucketed_pairs", "q_rollup_revenue", "q_topk_operator",
    "q_kmv_distinct", "q_rolling_avg", "t_seq_pack",
    "q_ntile_quartiles", "dedup_rank_propagate",
    // round 4: two-level quantized codebooks under cell pruning,
    // windowed long sums, min-agg funnel chain, demuxed byte sums
    "sim_ivfpq_knn", "s_windowed_counts", "q_funnel_3step",
    "mm_video_frames",
    // round 6: size-probed holdout join + per-doc shared-shingle counts
    "dedup_decontaminate",
    // round 10: quantized sqrt mixing weights, dual-model broadcast
    // log-ratio scores, stateful LSH bucket canon under regrouping
    "t_mix_weights", "t_dsir_weights", "s_lsh_dedup",
    // partition-count sweep IS the contraction sweep here: 4/3/17
    // partitions contract the edge graph completely differently
    "dedup_clusters_prepass", "t_bigram_logppl",
    // pure-integer entropy estimate: the sweep pins the row-local
    // CompressBitsQ pass against repartitioning (its oracle covers
    // values; this covers plan-shape independence)
    "t_compression_ratio",
    // round 11: quantized-ln PMI, exact-power HLL register sums, and
    // histogram-edge quantiles — the three new float-bearing aggs
    "t_pmi_colloc", "q_hll_distinct", "q_quantile_sketch",
    // round 11 session 4: fixed-point GD (the gradient is a global sum
    // — THE order-sensitivity trap this sweep exists for), quantized-ln
    // KL terms, sketch-ratio estimates, quantized centroid cosines
    "t_clf_train", "s_drift_kl", "q_kmv_jaccard", "sim_source_map",
    // 3-round Lloyd: iterative quantized centroids under re-partitioning
    "sim_ivf_train",
    // delta argmin over broadcast centroids; double distances, int output
    "sim_incremental_assign",
    // round 12: dual-partition CC + keeper election (the contraction
    // sweep exercises the fused fixpoint), quantized sub-centroid
    // means under re-partitioning, and the labeled-holdout gram counts
    "dedup_delta_election", "sim_cell_split", "dedup_delta_decontam",
    // round 13: composed flag→split→reassign — argmin + in-cell 2-means
    // double comparisons under re-partitioning
    "sim_split_reassign",
    // log-fold: latest-wins max(struct) per (cell, vec_id) — the sweep
    // pins the fold against partial-aggregation regrouping
    "sim_asg_log_fold",
    "sim_merge_rehome", "dedup_lsh_recall_sampled")

  private def rows(name: String): Set[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    val cols = df.columns.sorted.toIndexedSeq
    val out = df.collect().map(r => cols.map(c =>
      String.valueOf(r.getAs[Any](c))).mkString("|")).toSet
    spark.catalog.clearCache()
    out
  }

  for (q <- queries)
    test(s"$q is partition-count invariant (4 vs 3 vs 17)") {
      val conf = spark.conf
      val base = conf.get("spark.sql.shuffle.partitions")
      try {
        conf.set("spark.sql.shuffle.partitions", "4")
        val r4 = rows(q)
        conf.set("spark.sql.shuffle.partitions", "3")
        val r3 = rows(q)
        conf.set("spark.sql.shuffle.partitions", "17")
        val r17 = rows(q)
        assert(r4 == r3, s"$q differs between 4 and 3 shuffle partitions")
        assert(r4 == r17, s"$q differs between 4 and 17 shuffle partitions")
        assert(r4.nonEmpty)
      } finally conf.set("spark.sql.shuffle.partitions", base)
    }
}
