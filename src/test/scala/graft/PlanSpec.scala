package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards for the scale-critical queries.
  *
  * Correctness is the oracle's job; these tests pin the PLAN SHAPE the
  * 100 TB design depends on — a refactor that silently turns a
  * broadcast join into a cartesian product or un-pushes a filter still
  * returns the right rows at sf0.001, and only these assertions catch
  * it before a cluster does.
  */
class PlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  // --- no accidental quadratic joins in the scale paths ---
  // (queries cache stage frames internally — cache(), not checkpoint —
  // so the FULL plan including pre-cache stages is visible here and
  // these assertions cover the whole pipeline, not a truncated tail)

  for (q <- Seq("sim_bucketed_pairs", "dedup_lsh_verified",
      "dedup_decontaminate", "dedup_embedding_near", "t_corpus_clean"))
    test(s"$q plan has no cartesian or nested-loop join") {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"CartesianProduct in:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"BroadcastNestedLoopJoin in:\n$p")
    }

  test("dedup_decontaminate_bloom probes the sketch before the exact join, same rows") {
    val p = plan("dedup_decontaminate_bloom")
    // the codegen'd membership probe must sit on the train side ahead
    // of the shuffle, and the confirm join must be the non-broadcast
    // at-scale path this variant exists for
    assert(p.contains("might_contain"), p)
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    val bloom = SparkEntry.queries("dedup_decontaminate_bloom")(spark, sf)
    val exact = SparkEntry.queries("dedup_decontaminate")(spark, sf)
    assert(bloom.except(exact).isEmpty, "bloom path emitted extra rows")
    assert(exact.except(bloom).isEmpty, "bloom path dropped rows")
  }

  test("dedup_semdedup pair stage is cell-keyed, centroids broadcast") {
    val p = plan("dedup_semdedup")
    // the quadratic stage must be bounded per IVF cell: an equi-join on
    // the assigned cell (shuffle or broadcast hash), never a corpus²
    // cartesian; the only nested-loop join allowed is the vector ×
    // broadcast-centroid scoring of the assignment stage
    assert(!p.contains("CartesianProduct"), s"CartesianProduct in:\n$p")
    assert(p.contains("BroadcastExchange"), p)
  }

  // the IVF/PQ family deliberately cross-joins every vector against the
  // BROADCAST centroid/codebook table (nlist-sized — that IS the
  // algorithm); a BroadcastNestedLoopJoin is expected there, but a
  // non-broadcast CartesianProduct never is
  for (q <- Seq("sim_ivf_knn", "sim_ivf_knn_probe2", "sim_pq_adc_knn",
      "sim_kmeans_refine"))
    test(s"$q plan has no non-broadcast cartesian") {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"CartesianProduct in:\n$p")
    }

  // --- broadcast where a broadcast is the design ---

  test("q5_region_revenue star join broadcasts the dimensions") {
    val p = plan("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup_decontaminate semi-joins train shingles against a broadcast") {
    assert(plan("dedup_decontaminate").contains("BroadcastHashJoin"))
  }

  test("dedup_decontaminate size gate: oversize holdout plans a shuffle join, same results") {
    // force the gate shut (threshold 0): the holdout no longer fits a
    // broadcast, so the hold join must degrade to sort-merge instead of
    // OOMing executors with an unconditional broadcast
    val sm = graft.queries.DedupQueries.decontaminate(spark, sf, broadcastMaxShingles = 0)
    val p = sm.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    val bc = graft.queries.DedupQueries.decontaminate(spark, sf)
    assert(sm.except(bc).isEmpty, "shuffle path emitted extra rows")
    assert(bc.except(sm).isEmpty, "shuffle path dropped rows")
  }

  // the ADC scans must end in the heap-pruning TopKPerKey operator,
  // not a window sort over every candidate list
  for (q <- Seq("sim_pq_adc_knn", "sim_ivfpq_knn"))
    test(s"$q ranks candidates through TopKPerKeyExec") {
      assert(plan(q).contains("TopKPerKey"), plan(q))
    }

  test("t_unigram_logppl model is K-bounded and broadcast") {
    val p = plan("t_unigram_logppl")
    // the top-K vocab selection must plan as TakeOrderedAndProject
    // (bounded by K, never a full vocab sort/collect) and the model +
    // OOV bucket must reach the token join as broadcasts
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "corpus-side shuffle join in:\n" + p)
  }

  // --- pushdown + pruning reach the parquet scan ---

  test("q1_pricing_summary scan reads only the five aggregated columns") {
    val p = plan("q1_pricing_summary")
    // projection pruning: unreferenced lineitem columns never load
    assert(!p.contains("l_comment"), "l_comment survived pruning:\n" + p)
    assert(!p.contains("l_shipdate"), "l_shipdate survived pruning:\n" + p)
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      "map-side partial aggregation missing:\n" + p)
  }

  test("q_revenue_by_nation pushes filters into the scans") {
    assert(plan("q_revenue_by_nation").contains("PushedFilters: ["))
  }

  // --- map-only ops stay key-shuffle-free ---
  // (the input-parallelism floor in Tables.t may add ONE round-robin
  // redistribution over a single-row-group fixture file; the invariant
  // these guard is that the OPERATOR itself never shuffles on a key —
  // a hash/range exchange would mean the map-only design regressed)

  private def assertMapOnly(q: String): Unit = {
    val p = plan(q)
    val pl = p.toLowerCase
    assert(!pl.contains("hashpartitioning") && !pl.contains("rangepartitioning"),
      s"key shuffle in map-only op:\n$p")
    assert("Exchange".r.findAllIn(p).length <= 1,
      s"more than the input-floor exchange in:\n$p")
  }

  for (q <- Seq("dedup_minhash_sig", "dedup_simhash", "t_split_assign",
      "sim_sq8_error", "t_repetition"))
    test(s"$q is key-shuffle-free (pure map)") { assertMapOnly(q) }

  test("t_tfidf_topk joins the vocabulary model as a broadcast") {
    val p = plan("t_tfidf_topk")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "corpus-side shuffle join in:\n" + p)
  }

  test("q_event_pivot is one pass (pinned values, single scan)") {
    val p = plan("q_event_pivot")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected 1 scan, got $scans:\n$p")
  }

  test("q_topk_operator plans partial + final heap passes around one exchange") {
    val p = plan("q_topk_operator")
    assert("TopKPerKey \\[".r.findAllIn(p).length == 2,
      "expected partial+final TopKPerKeyExec:\n" + p)
    assert(p.contains("Exchange"), "missing key-clustered exchange:\n" + p)
    assert(!p.toLowerCase.contains("sort"), "heap operator must not sort:\n" + p)
  }

  test("q_rollup_revenue expands grouping sets in one agg pass") {
    val p = plan("q_rollup_revenue")
    assert(p.contains("Expand"), "grouping-set Expand missing:\n" + p)
    assert(p.contains("BroadcastHashJoin"), p)
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 4, s"expected 4 scans (fact + 3 dims), got $scans:\n$p")
  }

  test("sim_threshold_pairs plans the fused all-pairs exec, no BNLJ") {
    val p = plan("sim_threshold_pairs")
    assert(p.contains("AllPairsCosine"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sim_knn_bruteforce composes fused scoring with heap top-k") {
    val p = plan("sim_knn_bruteforce")
    assert(p.contains("AllPairsCosine"), p)
    assert("TopKPerKey \\[".r.findAllIn(p).length == 2,
      "expected partial+final TopKPerKeyExec:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sim_mrl_recall runs both rankings on fused scoring, no BNLJ") {
    val p = plan("sim_mrl_recall")
    // ground truth (full-dim) and truncated ranking each plan the fused
    // exec; the truncated side also gets the heap pair
    assert("AllPairsCosine".r.findAllIn(p).length >= 2, p)
    assert(p.contains("TopKPerKey ["), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t_seq_pack windows per source, never a global single partition") {
    val p = plan("t_seq_pack")
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"),
      s"global-window shuffle would serialize packing:\n$p")
  }

  test("t_boilerplate broadcasts the frequent-shingle set back") {
    val p = plan("t_boilerplate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_range_join_clicks bins the interval join into an equi-join") {
    val p = plan("q_range_join_clicks")
    assert(!p.contains("CartesianProduct"), s"CartesianProduct in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"theta-join fell back to BNLJ:\n$p")
  }

  test("q_cube_orders expands the full lattice in one scan") {
    val p = plan("q_cube_orders")
    assert(p.contains("Expand"), "grouping-set Expand missing:\n" + p)
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected 1 scan, got $scans:\n$p")
  }

  test("q_nation_share windows over the nation-level aggregate") {
    val p = plan("q_nation_share")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), "fact-side shuffle join in:\n" + p)
  }

  test("t_ttr is key-shuffle-free (pure map)") { assertMapOnly("t_ttr") }

  test("sim_ivfpq_knn prunes candidates by cell equi-join (no cartesian ADC scan)") {
    val p = plan("sim_ivfpq_knn")
    assert(!p.contains("CartesianProduct"), s"CartesianProduct in:\n$p")
    assert(p.contains("BroadcastExchange"),
      "probe lists / distance tables should broadcast:\n" + p)
  }

  test("q_funnel_3step chains user-keyed aggregations (no event-level self-join blowup)") {
    val p = plan("q_funnel_3step")
    assert(!p.contains("CartesianProduct"), s"CartesianProduct in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ in:\n$p")
    assert(!p.toLowerCase.contains("window"),
      "funnel must not window over raw events:\n" + p)
  }

  test("s_interval_join stays an equi-join with a range filter (no BNLJ)") {
    val p = plan("s_interval_join")
    assert(!p.contains("CartesianProduct"), s"CartesianProduct in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"time-range join fell back to BNLJ:\n$p")
  }

  test("s_windowed_counts is one scan + one aggregation pass") {
    val p = plan("s_windowed_counts")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected 1 scan, got $scans:\n$p")
    assert(p.contains("HashAggregate"), "hash aggregation missing:\n" + p)
  }

  test("dedup_substring shuffles 128-bit gram hashes, never gram strings") {
    val p = plan("dedup_substring")
    // both wide stages (count-distinct + semi-join) must partition on
    // the double-xxhash64 key — a raw 8-token gram string in the
    // exchange key is ~4x the shuffle bytes at 100 TB
    assert(!p.contains("hashpartitioning(gram"),
      "gram strings travel the shuffle:\n" + p)
    assert(p.contains("xxhash64"), "gram hash key missing:\n" + p)
  }

  test("t_ngram_novelty shuffles 128-bit shingle hashes, never strings") {
    val p = plan("t_ngram_novelty")
    assert(!p.contains("hashpartitioning(s#") &&
      !p.contains("hashpartitioning(s,"),
      "shingle strings travel the shuffle:\n" + p)
    assert(p.contains("xxhash64"), "hash key missing:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  // --- no corpus-sized broadcast builds in the Jaccard verification ---
  // A broadcast() hint over a map-only projection of `documents` (e.g.
  // the per-doc shingle-count frame) is correct at test SF and a driver
  // OOM at 100 TB. Every explicit BROADCAST hint in these plans must sit
  // above an Aggregate (the hot-bucket count list is bucket-bounded);
  // hint-free small joins are left to AQE's runtime size measurement.
  for (q <- Seq("dedup_lsh_verified", "dedup_ngram_jaccard"))
    test(s"$q never hints a broadcast of a non-aggregated corpus frame") {
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, ResolvedHint}
      val analyzed = SparkEntry.queries(q)(spark, sf).queryExecution.analyzed
      val hints = analyzed.collect {
        case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h
      }
      hints.foreach { h =>
        assert(h.child.collectFirst { case a: Aggregate => a }.nonEmpty,
          s"$q broadcasts a non-aggregated (corpus-sized) frame:\n${h.child}")
      }
    }

  test("q_trending_topk heap-prunes the pre-aggregated frame, no window sort") {
    val p = plan("q_trending_topk")
    assert("TopKPerKey \\[".r.findAllIn(p).length == 2,
      "expected partial+final TopKPerKeyExec:\n" + p)
    assert(p.contains("HashAggregate"), "pre-agg missing:\n" + p)
    assert(!p.toLowerCase.contains("sort"), "heap operator must not sort:\n" + p)
  }

  test("q_cohort_retention joins id-sized frames, no cartesian") {
    val p = plan("q_cohort_retention")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t_domain_cap plans heap passes, no per-partition sort") {
    val p = plan("t_domain_cap")
    assert("TopKPerKey \\[".r.findAllIn(p).length == 2,
      "expected partial+final TopKPerKeyExec:\n" + p)
    assert(!p.toLowerCase.contains("sort"), "heap operator must not sort:\n" + p)
  }

  test("t_mix_weights broadcasts the 1-row total, no global window") {
    val p = plan("t_mix_weights")
    assert(p.contains("BroadcastExchange"), "total must broadcast:\n" + p)
    assert(!p.contains("Window"), "no single-partition window allowed:\n" + p)
  }

  test("t_dsir_weights joins both capped models as broadcasts") {
    val p = plan("t_dsir_weights")
    // the scored corpus-side join must be broadcast (model is K-capped);
    // the cap itself must plan as TakeOrdered, never a full sort+limit
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t_bigram_logppl joins both capped models as broadcasts") {
    val p = plan("t_bigram_logppl")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s_lsh_dedup state stage shuffles bucket keys only, no cartesian") {
    val p = plan("s_lsh_dedup")
    assert(p.contains("FlatMapGroupsWithState") || p.contains("MapGroups"),
      "stateful band stage missing:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("s_enrich joins the dimension as a broadcast (stateless stream-static shape)") {
    val p = plan("s_enrich")
    // the fact stream must never shuffle for the join — a SortMergeJoin
    // here means join state / a fact-side exchange at 100 TB
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_value_zscore broadcasts the per-type moments, fact never shuffles twice") {
    val p = plan("q_value_zscore")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_value_mad joins both median frames as broadcasts") {
    val p = plan("q_value_mad")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup_lines keeper election shuffles 128-bit segment hashes, never text") {
    val p = plan("dedup_lines")
    // the election + verdict-join exchanges must key on the double
    // xxhash64, not the ~50-byte segment string; only the final
    // doc_id-keyed reassembly may carry text (the algorithm's floor)
    assert(!p.contains("hashpartitioning(seg#"),
      "segment strings key a shuffle:\n" + p)
    assert(p.contains("xxhash64"), "hash key missing:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup_cross_source self-join is fp-keyed (group size bounded by |sources|)") {
    val p = plan("dedup_cross_source")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup_edit_verified runs the DP on candidates only, no corpus² join") {
    val p = plan("dedup_edit_verified")
    assert(p.contains("levenshtein"), "edit-distance stage missing:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup_minhash_est reuses the candidate path, joins signatures by id") {
    val p = plan("dedup_minhash_est")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sim_mmr_rerank: fused candidate gen + heap + per-query local greedy") {
    val p = plan("sim_mmr_rerank")
    assert(p.contains("AllPairsCosine"), "fused scorer missing:\n" + p)
    assert(p.contains("TopKPerKey") || p.contains("GraftTopK"),
      "heap prune missing:\n" + p)
    assert(p.contains("FlatMapGroups") || p.contains("MapGroups"),
      "row-local greedy stage missing:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s_sliding_counts expands rows per overlapping window, no join") {
    val p = plan("s_sliding_counts")
    assert(!p.contains("Join"), "sliding windows must not plan a join:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t_weighted_sample plans a heap top-k, never a global sort") {
    val p = plan("t_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), "heap top-k missing:\n" + p)
    assert(!p.contains("Sort "), "global sort in the sample path:\n" + p)
  }

  test("t_rule_funnel flags via native maxfreq, one aggregation pass") {
    val p = plan("t_rule_funnel")
    assert(p.contains("maxfreq"), "native MaxFreq missing:\n" + p)
    assert(!p.contains("LambdaFunction"),
      "interpreted HOF on the flag path:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  // --- round-11 operators ---

  test("sim_hard_negatives: packed-id label filter, no label join, fused scorer + heap") {
    val p = plan("sim_hard_negatives")
    assert(p.contains("AllPairsCosine"), "fused scorer missing:\n" + p)
    assert(p.contains("TopKPerKey") || p.contains("GraftTopK"),
      "heap prune missing:\n" + p)
    // the label rides inside the packed id: the ONLY join in the plan
    // is the fused broadcast scorer itself — any hash/merge join means
    // someone reintroduced a label-table shuffle over the scored pairs
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "label join reappeared over the scored pairs:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t_shard_shuffle: one hash partition + in-partition sort, no global sort") {
    val p = plan("t_shard_shuffle")
    // Window(partitionBy shard, orderBy key) = hashpartitioning
    // exchange + per-partition sort; a RangePartitioning exchange here
    // would mean a global sort crept in
    assert(p.contains("hashpartitioning"), p)
    assert(!p.contains("rangepartitioning"), "global sort in epoch shuffle:\n" + p)
    assert(!p.contains("Join"), p)
  }

  test("t_cms_heavy: heap top-k, no nested-loop join, probe joins the tiny side") {
    val p = plan("t_cms_heavy")
    assert(p.contains("TakeOrderedAndProject"), "heap top-k missing:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup_incremental: keyed probes only, band table computed once (cached)") {
    val name = "dedup_incremental"
    val df = SparkEntry.queries(name)(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the band frame must be a shared cached scan, not two independent
    // minhash recomputations: exactly one InMemoryTableScan source
    // with the minhash band filter upstream of both probe sides
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      "band cache missing — minhash pass duplicated:\n" + p)
  }

  test("dedup_triangles: equi-joins only on the edge frame, no cartesian wedge") {
    val p = plan("dedup_triangles")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t_oov_rate: K-capped heap vocab, broadcast membership probe") {
    val p = plan("t_oov_rate")
    assert(p.contains("TakeOrderedAndProject"), "heap vocab cap missing:\n" + p)
    assert(p.contains("BroadcastHashJoin"), "vocab probe not broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin"), "corpus-side shuffle join:\n" + p)
  }

  test("q_hll_distinct and q_quantile_sketch: constant-size sketch aggs, " +
      "singleton broadcasts only") {
    for (q <- Seq("q_hll_distinct", "q_quantile_sketch")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q grew a shuffle join:\n$p")
    }
  }

  test("t_clf_score: literal-weight scoring, no join anywhere in the plan") {
    // the model returns as LITERALS (driver-held between epochs), so
    // the scoring pass must be scan -> project -> one aggregation; any
    // join means the weights started traveling with the data
    val p = plan("t_clf_score")
    assert(!p.contains("Join"), s"classifier scoring grew a join:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("sim_knn_classify: cell-keyed candidates, no cartesian") {
    // the only nested-loop join allowed is the vector x
    // broadcast-centroid scoring inherited from the IVF assignment
    // stage (same dispensation as dedup_semdedup); the candidate x
    // query stage itself must stay an equi-join on the cell
    val p = plan("sim_knn_classify")
    assert(!p.contains("CartesianProduct"), s"CartesianProduct in:\n$p")
    assert(p.contains("BroadcastExchange"), p)
  }

  test("dedup_pipeline_funnel: id/cell-keyed stages only, no quadratic join") {
    val p = plan("dedup_pipeline_funnel")
    assert(!p.contains("CartesianProduct"), s"CartesianProduct in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"BroadcastNestedLoopJoin in:\n$p")
  }

  test("dedup_delta_election: id/band-keyed stages only, no quadratic join") {
    // two CC fixpoints + keeper joins over one verified pair graph —
    // everything after the banded candidates must stay id-keyed
    val p = plan("dedup_delta_election")
    assert(!p.contains("CartesianProduct"), s"CartesianProduct in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"BroadcastNestedLoopJoin in:\n$p")
  }

  test("s_drift_kl: reference distribution broadcast, no cartesian") {
    val p = plan("s_drift_kl")
    assert(p.contains("BroadcastExchange"), s"reference should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"CartesianProduct in:\n$p")
  }

  test("sim_source_map: pair matrix joins a broadcast tiny side, never cartesian") {
    val p = plan("sim_source_map")
    assert(!p.contains("CartesianProduct"), s"CartesianProduct in:\n$p")
    assert(p.contains("BroadcastExchange"), p)
  }

  test("sim_merge_rehome: centroid/survivor scoring broadcasts, members stay id-keyed") {
    // two argmin legs (corpus x centroids, flagged members x survivors)
    // are the only nested loops allowed, and both nest over a BROADCAST
    // nlist-sized side — never a cartesian over corpus-sized frames
    val p = plan("sim_merge_rehome")
    assert(!p.contains("CartesianProduct"), s"CartesianProduct in:\n$p")
    assert(p.contains("BroadcastExchange"), p)
  }

  test("dedup_lsh_recall_sampled: the quadratic baseline runs on the SAMPLED shingles only") {
    // the whole point of the sampled twin: the all-pairs self-join's
    // both inputs must carry the sample predicate below the join (the
    // LSH side stays the production pipeline — band-keyed, never
    // quadratic)
    val p = plan("dedup_lsh_recall_sampled")
    assert(!p.contains("CartesianProduct"), s"CartesianProduct in:\n$p")
    assert(p.contains("2654435761"),
      s"the sample predicate must appear in the plan:\n${p.take(2000)}")
  }
}
