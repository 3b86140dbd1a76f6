package graft.queries

import graft.streaming.StreamingAnalytics
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle coverage for the StreamingAnalytics operators: every operator
  * accepts batch frames (the watermark node is eliminated on a
  * non-streaming plan), so the SAME code path the streaming queries run
  * is executed here over the events fixture and hash-compared against a
  * DuckDB oracle — the one component that was previously spec-only.
  *
  * Timestamp discipline: operators get a µs-precision real timestamp
  * via the `Tables.tsTimestamp` schema adapter (ns-BIGINT and µs
  * TIMESTAMP_NTZ fixture generations both normalize to the same UTC
  * instant); outputs convert back to epoch-µs BIGINT so both engines
  * hash identical integers (DuckDB's `epoch_us(ts)` applies the same
  * truncation).
  *
  * `value` sums are pre-quantized to integer cents, so the windowed
  * SUM is exact in both engines (the QueryDef double-sum contract). */
object StreamingBatchQueries {
  import Tables.t

  private val GapUs = 1800L * 1000000L // 30 min, the session/join gap

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "s_windowed_counts",
      (s, dir) => {
        val raw = t(s, dir, "events")
        val ev = raw.select(
          Tables.tsTimestamp(raw).as("ts"),
          col("event_type"),
          // integer cents: the windowed SUM stays associative + exact
          round(col("value") * 100).cast("long").as("value"))
        StreamingAnalytics.windowedCounts(ev, "5 minutes", "5 minutes")
          .select(
            unix_micros(col("window_start")).as("window_start_us"),
            unix_micros(col("window_end")).as("window_end_us"),
            col("event_type"), col("n"), col("total"))
      },
      Some(
        """SELECT (epoch_us(ts) // 300000000) * 300000000 AS window_start_us,
          |(epoch_us(ts) // 300000000) * 300000000 + 300000000 AS window_end_us,
          |event_type, COUNT(*) AS n,
          |CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total
          |FROM events GROUP BY 1, 2, 3""".stripMargin),
      "Watermarked tumbling-window counts/sums run in batch mode (same operator as the stream)."),

    QueryDef(
      "s_sessions",
      (s, dir) => {
        val raw = t(s, dir, "events")
        val ev = raw.select(
          Tables.tsTimestamp(raw).as("ts"), col("user_id"))
        StreamingAnalytics.sessionCounts(ev, "30 minutes")
          .select(col("user_id"),
            unix_micros(col("session_start")).as("session_start_us"),
            unix_micros(col("session_end")).as("session_end_us"),
            col("n_events"))
      },
      Some(
        // session_window semantics: a session spans [first_ts,
        // last_ts + gap); an event at EXACTLY prev + gap starts a new
        // session (end-exclusive), hence the >= break condition
        s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
           |m AS (SELECT user_id, us,
           |  CASE WHEN LAG(us) OVER w IS NULL
           |       OR us - LAG(us) OVER w >= $GapUs THEN 1 ELSE 0 END AS brk
           |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
           |g AS (SELECT user_id, us,
           |  SUM(brk) OVER (PARTITION BY user_id ORDER BY us
           |    ROWS UNBOUNDED PRECEDING) AS sid FROM m)
           |SELECT user_id, MIN(us) AS session_start_us,
           |  MAX(us) + $GapUs AS session_end_us, COUNT(*) AS n_events
           |FROM g GROUP BY user_id, sid""".stripMargin),
      "Native session_window sessionization run in batch mode (same operator as the stream)."),

    QueryDef(
      "s_interval_join",
      (s, dir) => {
        val raw = t(s, dir, "events")
        val ev = raw.select(col("user_id"), col("event_id"),
          Tables.tsTimestamp(raw).as("ts"), col("event_type"))
        StreamingAnalytics.intervalJoin(
            ev.where(col("event_type") === "click"),
            ev.where(col("event_type") === "purchase"), maxGapSec = 1800)
          .select(col("user_id"),
            col("l_id").as("click_id"), col("r_id").as("purchase_id"),
            unix_micros(col("l_ts")).as("click_us"),
            unix_micros(col("r_ts")).as("purchase_us"))
      },
      Some(
        s"""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           |  epoch_us(c.ts) AS click_us, epoch_us(p.ts) AS purchase_us
           |FROM events c JOIN events p ON c.user_id = p.user_id
           |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
           |  AND epoch_us(c.ts) <= epoch_us(p.ts)
           |  AND epoch_us(c.ts) >= epoch_us(p.ts) - $GapUs""".stripMargin),
      "Stream-stream interval join (click→purchase window) run in batch mode."),
    QueryDef(
    "s_dedup_first",
    (s, dir) => {
      // Cross-batch stateful dedup (flatMapGroupsWithState) under the
      // oracle gate. Batch-mode flatMapGroupsWithState keeps the FIRST
      // row per key in ITERATOR order — nondeterministic in general, so
      // the fixture makes every copy of a jid byte-identical (all
      // envelope fields are functions of the jid): whichever copy wins,
      // the output row is the same, and DuckDB's DISTINCT is an exact
      // oracle. events has ~400 rows per user, so each jid has many
      // replayed copies.
      import s.implicits._
      import graft.model.GraftEvent
      val replayed = Tables.t(s, dir, "events")
        .select(col("user_id"))
        .map { r =>
          val jid = r.getLong(0).toString
          GraftEvent(
            clazz = "DedupWorker", function = "perform",
            queue = "dq", jid = jid, args = s"""["$jid"]""",
            retry_count = 0,
            enqueued_at = new java.sql.Timestamp(1704067200000L))
        }
      graft.streaming.StreamingAnalytics.dedupByJid(replayed)
        .select(col("jid"), col("clazz"), col("queue"), col("args"))
    },
    Some(
      """SELECT DISTINCT CAST(user_id AS VARCHAR) AS jid,
        |'DedupWorker' AS clazz, 'dq' AS queue,
        |'["' || CAST(user_id AS VARCHAR) || '"]' AS args
        |FROM events""".stripMargin),
    "Stateful first-occurrence dedup (flatMapGroupsWithState) run in batch mode."),

    QueryDef(
      "s_lsh_dedup",
      (s, dir) => {
        // Streaming MinHash-LSH near-dedup under the oracle gate: the
        // SAME stateful operator a stream runs (one long of state per
        // LSH bucket, flatMapGroupsWithState) executed over the batch
        // corpus. Signature is the shuffle-free native graft_minhash4
        // (shared with dedup_minhash_*); a doc is a near-dup iff ANY of
        // its 4 band buckets already holds a smaller doc_id. In batch
        // mode each bucket group sees all its docs at once, so the
        // canonical id is the exact bucket min — which is precisely the
        // converged fix-point the streaming run reaches once every doc
        // has flowed through, and what the SQL oracle computes. The
        // per-doc fold after the stateful stage is a map-side-
        // combinable min; at 100 TB state is |buckets| × 8 B sharded
        // across executors, evictable by timeout.
        import s.implicits._
        val sig = DedupQueries.minhashSig(s, dir)
        val bands = sig.select(col("doc_id"), posexplode(
            array(DedupQueries.MinhashBands.map(b => col(b._1)): _*))
            .as(Seq("band", "bkey")))
          .select(col("band"), col("bkey"), col("doc_id"))
          .as[(Int, String, Long)]
        graft.streaming.StreamingAnalytics.lshBucketCanon(bands)
          .groupBy("doc_id")
          .agg(min("bucket_canon").as("canon_id"))
          .select(col("doc_id"), col("canon_id"),
            (col("canon_id") < col("doc_id")).cast("int").as("is_dup"))
      },
      Some(
        s"""WITH sig AS (${DedupQueries.MinhashSigSql}),
           |u AS (
           |  SELECT doc_id, 0 AS band, mh0 AS bkey FROM sig UNION ALL
           |  SELECT doc_id, 1, mh1 FROM sig UNION ALL
           |  SELECT doc_id, 2, mh2 FROM sig UNION ALL
           |  SELECT doc_id, 3, mh3 FROM sig),
           |m AS (SELECT band, bkey, MIN(doc_id) AS bmin
           |  FROM u GROUP BY band, bkey)
           |SELECT u.doc_id, MIN(m.bmin) AS canon_id,
           |  CAST(MIN(m.bmin) < u.doc_id AS INT) AS is_dup
           |FROM u JOIN m ON u.band = m.band AND u.bkey = m.bkey
           |GROUP BY u.doc_id""".stripMargin),
      "Streaming LSH near-dedup (stateful band buckets) run in batch mode."),

    QueryDef(
      "s_enrich",
      (s, dir) => {
        // Stream-static enrichment: events stream joined against the
        // customer dimension (user_id+1 = c_custkey is the fixture's
        // id bridge), counted per (hour window, market segment). The
        // join is stateless and broadcast — the 100 TB fact stream
        // never shuffles; only the windowed count keeps (bounded)
        // state. Batch mode runs the identical operator.
        val raw = t(s, dir, "events")
        val ev = raw.select(
          Tables.tsTimestamp(raw).as("ts"),
          (col("user_id") + 1).as("c_custkey"))
        val dim = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        StreamingAnalytics.enrichedWindowedCounts(
            ev, dim, "c_custkey", "c_mktsegment", "1 hour")
          .select(
            unix_micros(col("window_start")).as("window_start_us"),
            unix_micros(col("window_end")).as("window_end_us"),
            col("c_mktsegment"), col("n"))
      },
      Some(
        """SELECT (epoch_us(e.ts) // 3600000000) * 3600000000 AS window_start_us,
          |(epoch_us(e.ts) // 3600000000) * 3600000000 + 3600000000 AS window_end_us,
          |c.c_mktsegment, COUNT(*) AS n
          |FROM events e JOIN customer c ON e.user_id + 1 = c.c_custkey
          |GROUP BY 1, 2, 3""".stripMargin),
      "Stream-static broadcast enrichment join + windowed counts, run in batch mode."),

    QueryDef(
      "s_sliding_counts",
      (s, dir) => {
        // SLIDING windows (1 h wide, 15 min slide — each event lands in
        // 4 overlapping windows), exercising the overlap path of the
        // same windowedCounts operator s_windowed_counts runs tumbling.
        // Spark expands each row into width/slide window copies BEFORE
        // the aggregation — state and shuffle scale by the overlap
        // factor, which is why production slides are a small multiple
        // of the width; the oracle replays the identical 4-way
        // expansion with a LATERAL range join.
        val raw = t(s, dir, "events")
        val ev = raw.select(
          Tables.tsTimestamp(raw).as("ts"),
          col("event_type"),
          round(col("value") * 100).cast("long").as("value"))
        StreamingAnalytics.windowedCounts(ev, "1 hour", "15 minutes")
          .select(
            unix_micros(col("window_start")).as("window_start_us"),
            unix_micros(col("window_end")).as("window_end_us"),
            col("event_type"), col("n"), col("total"))
      },
      Some(
        """SELECT ws AS window_start_us, ws + 3600000000 AS window_end_us, event_type,
          |  COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS total
          |FROM (SELECT epoch_us(ts) AS e, event_type,
          |      CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events),
          | LATERAL (SELECT (e // 900000000 - j) * 900000000 AS ws
          |          FROM (SELECT unnest(range(0, 4)) AS j) tt) t
          |WHERE e < ws + 3600000000
          |GROUP BY 1, 2, 3""".stripMargin),
      "Sliding-window counts/sums (1h window, 15min slide) run in batch mode."),

    QueryDef(
      "s_cms_topk",
      (s, dir) => {
        // Streaming heavy hitters via the windowed count-min sketch:
        // cmsCells keeps a CONSTANT 4×256 cells of state per window
        // (vs per-user windowed counts whose state grows with key
        // cardinality — the killer for open key domains on long-running
        // queries); the probe re-hashes the keys of interest and takes
        // min over their 4 cells. Run here in batch mode over the same
        // operator the stream runs (the s_* convention); the eval joins
        // each window's exact top-5 users against their sketch estimate
        // so the one-sided CMS error is measurable per window.
        val raw = t(s, dir, "events")
        val ev = raw.select(Tables.tsTimestamp(raw).as("ts"), col("user_id"))
        val cells = graft.streaming.StreamingAnalytics.cmsCells(ev, "1 hour", 256)
          .select(unix_micros(col("window_start")).as("ws"),
            col("r"), col("bucket"), col("cell"))
        val exact = ev
          .groupBy(window(col("ts"), "1 hour"), col("user_id"))
          .agg(count("*").as("c"))
          .select(unix_micros(col("window.start")).as("ws"),
            col("user_id"), col("c"))
        val top = graft.plans.GraftOps.topKPerKey(exact, Seq("ws"), 5, "-c", "+user_id")
        top
          .select(col("ws"), col("user_id"), col("c"),
            posexplode(array(Seq(1, 9, 17, 25).map(o =>
              conv(substring(md5(col("user_id").cast("string").cast("binary")), o, 8),
                16, 10).cast("long") % 256): _*)).as(Seq("r", "bucket")))
          .join(cells, Seq("ws", "r", "bucket"))
          .groupBy("ws", "user_id", "c").agg(min("cell").as("est"))
          .select(col("ws").as("window_start_us"), col("user_id"),
            col("c").as("c_exact"), col("est").as("cms_est"))
      },
      Some(
        """WITH ev AS (SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ws,
          |    user_id FROM events),
          |h AS (SELECT ws, user_id, r,
          |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
          |      CASE r WHEN 0 THEN 1 WHEN 1 THEN 9 WHEN 2 THEN 17 ELSE 25 END, 8))
          |      AS BIGINT) % 256 AS bucket
          |  FROM ev, unnest([0, 1, 2, 3]) AS tr(r)),
          |cells AS (SELECT ws, r, bucket, COUNT(*) AS cell FROM h GROUP BY 1, 2, 3),
          |ex AS (SELECT ws, user_id, COUNT(*) AS c FROM ev GROUP BY 1, 2),
          |top AS (SELECT ws, user_id, c FROM (
          |  SELECT *, ROW_NUMBER() OVER (PARTITION BY ws ORDER BY c DESC, user_id)
          |    AS rk FROM ex) WHERE rk <= 5),
          |probe AS (SELECT t.ws, t.user_id, t.c, tr.r,
          |    CAST(concat('0x', substr(md5(CAST(t.user_id AS VARCHAR)),
          |      CASE tr.r WHEN 0 THEN 1 WHEN 1 THEN 9 WHEN 2 THEN 17 ELSE 25 END, 8))
          |      AS BIGINT) % 256 AS bucket
          |  FROM top t, unnest([0, 1, 2, 3]) AS tr(r))
          |SELECT probe.ws AS window_start_us, probe.user_id,
          |  CAST(probe.c AS BIGINT) AS c_exact, CAST(MIN(cell) AS BIGINT) AS cms_est
          |FROM probe JOIN cells ON probe.ws = cells.ws AND probe.r = cells.r
          |  AND probe.bucket = cells.bucket
          |GROUP BY 1, 2, 3""".stripMargin),
      "Streaming CMS heavy hitters: constant-state windowed sketch, top-5 probe per window."),

    QueryDef(
      "s_hll_users",
      (s, dir) => {
        // Streaming distinct-users per window via HLL registers — the
        // constant-state answer to the question windowed countDistinct
        // buffers every key for. Registers come from the SAME operator
        // the stream runs (hllRegisters: 64 rows/window of state, max
        // merge — idempotent under replay); the eval grid re-derives
        // the estimate and joins the exact distinct count per window.
        val raw = t(s, dir, "events")
        val ev = raw.select(Tables.tsTimestamp(raw).as("ts"), col("user_id"))
        val reg = graft.streaming.StreamingAnalytics.hllRegisters(ev, "1 hour")
          .select(unix_micros(col("window_start")).as("ws"), col("b"), col("m"))
          .cache()
        reg.count() // populate BEFORE the grid/join legs race it
        val grid = reg.select("ws").distinct()
          .crossJoin(s.range(64).select(col("id").as("b")))
        val est = grid.join(reg, Seq("ws", "b"), "left")
          .select(col("ws"), coalesce(col("m"), lit(0)).as("m"))
          .groupBy("ws")
          .agg(sum(pow(lit(2.0), -col("m"))).as("z"),
            sum((col("m") > 0).cast("int")).as("hit"))
          .select(col("ws"), (lit(0.709) * 4096 / col("z")).as("hll_est"),
            col("hit").cast("int").as("n_buckets_hit"))
        ev.groupBy(window(col("ts"), "1 hour"))
          .agg(countDistinct("user_id").as("n_exact"))
          .select(unix_micros(col("window.start")).as("ws"), col("n_exact"))
          .join(est, "ws")
          .select(col("ws").as("window_start_us"), col("n_exact"),
            col("hll_est"), col("n_buckets_hit"))
      },
      Some(
        """WITH ev AS (SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ws,
          |    user_id, user_id % 1000003 * 2654435761 % 4294967296 AS h FROM events),
          |r AS (SELECT ws, h % 64 AS b,
          |    CASE WHEN h // 64 = 0 THEN 27
          |         ELSE 27 - length(printf('%b', h // 64)) END AS rho FROM ev),
          |reg AS (SELECT ws, b, MAX(rho) AS m FROM r GROUP BY 1, 2),
          |g2 AS (SELECT ws, i AS b
          |  FROM (SELECT DISTINCT ws FROM reg), unnest(range(64)) AS ti(i)),
          |fb AS (SELECT g2.ws, COALESCE(reg.m, 0) AS m FROM g2
          |  LEFT JOIN reg ON g2.ws = reg.ws AND g2.b = reg.b),
          |agg AS (SELECT ws, SUM(power(2.0, -m)) AS z,
          |    SUM(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS hit FROM fb GROUP BY 1),
          |ex AS (SELECT ws, COUNT(DISTINCT user_id) AS n_exact FROM ev GROUP BY 1)
          |SELECT ex.ws AS window_start_us, n_exact,
          |  CAST(0.709 AS DOUBLE) * 4096 / z AS hll_est,
          |  CAST(hit AS INT) AS n_buckets_hit
          |FROM ex JOIN agg USING (ws)""".stripMargin),
      "Streaming HLL distinct users per window: 64 registers of state vs exact."),

    QueryDef(
      "s_log_quantiles",
      (s, dir) => {
        // Streaming value quantiles from the windowed log₂ histogram —
        // the constant-state answer to windowed percentile (which
        // buffers every value per window). Cells come from the SAME
        // operator the stream runs (logHistCells: ≤ ~40 additive
        // counts per window); the eval reads p50/p90/p99 off the
        // cumulative histogram (first bucket whose running count
        // reaches p·n; answer = the bucket's upper edge in value
        // units, a ≤2× relative envelope by log-bin construction) and
        // joins the exact per-window percentile as the yardstick.
        // Per-window cumulative sums are a window function over ≤ ~40
        // rows per key — id-sized at any corpus scale.
        val raw = t(s, dir, "events")
        val ev = raw.select(Tables.tsTimestamp(raw).as("ts"), col("value"))
        val cells = StreamingAnalytics.logHistCells(ev, "1 hour")
          .select(unix_micros(col("window_start")).as("ws"), col("bucket"), col("c"))
        val wn = Window.partitionBy("ws")
        val cum = cells
          .withColumn("cum", sum("c").over(wn.orderBy("bucket")))
          .withColumn("n", sum("c").over(wn))
        val ps = Seq(0.5, 0.9, 0.99)
        val qb = cum
          .select(col("ws"), col("bucket"), col("cum"), col("n"),
            explode(array(ps.map(lit): _*)).as("p"))
          .where(col("cum") >= col("p") * col("n"))
          .groupBy("ws", "p").agg(min("bucket").as("qbucket"))
        // upper edge of bucket b in value units: cents+1 < 2^b, so
        // cents <= 2^b - 2 → value edge (2^b - 2)/100; identical FP op
        // order in DuckDB (power → subtract → divide)
        val approx = qb.select(col("ws"), col("p"),
          ((pow(lit(2.0), col("qbucket")) - 2) / 100).as("approx_q"))
        val exact = ev.groupBy(window(col("ts"), "1 hour"))
          .agg(
            expr("percentile(value, 0.5)").as("e50"),
            expr("percentile(value, 0.9)").as("e90"),
            expr("percentile(value, 0.99)").as("e99"))
          .select(unix_micros(col("window.start")).as("ws"), explode(map(
            lit(0.5), col("e50"), lit(0.9), col("e90"),
            lit(0.99), col("e99"))).as(Seq("p", "exact_q")))
        approx.join(exact, Seq("ws", "p"))
          .select(col("ws").as("window_start_us"), col("p"),
            col("approx_q"), col("exact_q"))
      },
      Some(
        """WITH ev AS (SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ws,
          |    value, GREATEST(CAST(ROUND(value * 100) AS BIGINT), 0) + 1 AS v
          |  FROM events),
          |cells AS (SELECT ws, length(printf('%b', v)) AS bucket, COUNT(*) AS c
          |  FROM ev GROUP BY 1, 2),
          |cum AS (SELECT ws, bucket,
          |    SUM(c) OVER (PARTITION BY ws ORDER BY bucket) AS cum,
          |    SUM(c) OVER (PARTITION BY ws) AS n FROM cells),
          |ps AS (SELECT unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS p),
          |qb AS (SELECT ws, p, MIN(bucket) AS qbucket
          |  FROM cum, ps WHERE cum >= p * n GROUP BY 1, 2),
          |ex AS (SELECT ws, p,
          |    CASE p WHEN 0.5 THEN q50 WHEN 0.9 THEN q90 ELSE q99 END AS exact_q
          |  FROM (SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ws,
          |          quantile_cont(value, 0.5) AS q50,
          |          quantile_cont(value, 0.9) AS q90,
          |          quantile_cont(value, 0.99) AS q99 FROM events GROUP BY 1), ps)
          |SELECT qb.ws AS window_start_us, qb.p,
          |  (power(2.0, qbucket) - 2) / 100 AS approx_q, exact_q
          |FROM qb JOIN ex ON qb.ws = ex.ws AND qb.p = ex.p""".stripMargin),
      "Streaming log-histogram quantiles per window: ~40 counts of state vs exact percentile."),

    QueryDef(
      "s_drift_kl",
      (s, dir) => {
        // Distribution-drift monitor — the alarm a live ingest needs:
        // per 15-minute window, KL(window ‖ reference) of the
        // event-type mix against a baseline distribution. Two-tier
        // design (the production shape): tier 1 is the already-
        // streaming-native windowedCounts cells (constant per-window
        // state: |types| counters); tier 2 — everything below the
        // cells — is a cheap batch pass over the EMITTED table joined
        // to a broadcast reference. Here the reference is the full
        // fixture's own mix (a live deployment feeds last week's
        // instead); at 100 TB the reference is |types| rows broadcast
        // and the KL assembly never touches raw events again.
        // Determinism: each KL term quantizes ONCE to a 1e-6 integer —
        // p and the log ratio are computed from exact integer-count
        // quotients, so both engines feed ln the identical double —
        // and the per-window sum is integer, order-free. The grid is
        // deliberately COARSE (1e-6, not the 1e-9 model convention):
        // ln is transcendental, so a 1-ulp Math.log-vs-libm
        // disagreement landing within an ulp of a .5 grid boundary
        // would flip the integer; the flip probability scales with the
        // grid density (≈|x|·2.2e-16·grid per value), and 1e6 puts a
        // whole registry run at ~1e-6 — μ-nat precision is far beyond
        // what a drift alarm needs anyway. (t_pmi_colloc eliminated
        // its ln outright via the monotone-ratio form; KL has no such
        // form — the log IS the metric.)
        val raw = t(s, dir, "events")
        val ev = raw.select(Tables.tsTimestamp(raw).as("ts"),
          col("event_type"), lit(0L).as("value"))
        val cells = StreamingAnalytics
          .windowedCounts(ev, "15 minutes", "15 minutes")
          .select(unix_micros(col("window_start")).as("ws"),
            unix_micros(col("window_end")).as("we"),
            col("event_type"), col("n"))
        val ref = raw.groupBy("event_type").agg(count(lit(1)).as("n_t"))
        val tot = raw.agg(count(lit(1)).as("n_tot"))
        val wtot = cells.groupBy("ws").agg(sum("n").as("n_w"))
        cells.join(wtot, "ws")
          .join(broadcast(ref), "event_type").crossJoin(broadcast(tot))
          .select(col("ws"), col("we"), col("n_w"),
            round((col("n").cast("double") / col("n_w")) *
              log((col("n") * col("n_tot")).cast("double") /
                (col("n_w") * col("n_t")).cast("double")) * 1000000L)
              .cast("long").as("term_q"))
          .groupBy("ws", "we", "n_w")
          .agg(sum("term_q").as("kl_q"))
          .select(col("ws").as("window_start_us"),
            col("we").as("window_end_us"),
            col("n_w").as("n_events"),
            (col("kl_q").cast("double") / 1000000L).as("kl"))
      },
      Some(
        """WITH cells AS (SELECT (epoch_us(ts) // 900000000) * 900000000 AS ws,
          |    event_type, COUNT(*) AS n FROM events GROUP BY 1, 2),
          |wtot AS (SELECT ws, CAST(SUM(n) AS BIGINT) AS n_w FROM cells GROUP BY ws),
          |ref AS (SELECT event_type, COUNT(*) AS n_t FROM events GROUP BY 1),
          |tot AS (SELECT COUNT(*) AS n_tot FROM events),
          |terms AS (SELECT c.ws, w.n_w,
          |    CAST(ROUND((CAST(c.n AS DOUBLE) / w.n_w) *
          |      ln(CAST(c.n * t.n_tot AS DOUBLE) / CAST(w.n_w * r.n_t AS DOUBLE))
          |      * 1000000) AS BIGINT) AS term_q
          |  FROM cells c JOIN wtot w ON c.ws = w.ws
          |  JOIN ref r ON c.event_type = r.event_type, tot t)
          |SELECT ws AS window_start_us, ws + 900000000 AS window_end_us,
          |  n_w AS n_events,
          |  CAST(SUM(term_q) AS BIGINT) / 1000000.0 AS kl
          |FROM terms GROUP BY 1, 2, 3""".stripMargin),
      "Streaming drift monitor: per-window KL divergence of the event mix " +
        "vs a broadcast reference distribution."))
}
