package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General analytics breadth over the TPC-H-ish fixture tables: hash
  * aggregation, broadcast joins, window functions, semi/anti joins and
  * sessionization. The reference engine has none of these (SURVEY.md
  * §2F) — they exist so a reference user gets a full analytics surface
  * when switching to the Spark engine.
  *
  * Scale notes (100 TB design):
  *   - dimension joins (region/nation/supplier/part/customer) are
  *     explicitly `broadcast()` — no shuffle of the fact table;
  *   - double sums are quantized to integers and folded through
  *     [[ExactAgg.chunkedSums]] (long-speed chunk partials, decimal
  *     final fold) so partial aggregation is exact, associative and
  *     overflow-safe at 100 TB while staying on the codegen fast path;
  *   - window queries partition by their natural key and would rely on
  *     range-partitioned shuffle; skewed users would need salting.
  */
object AnalyticsQueries {
  import Tables.t

  /** Quantize a double at 10^s via ROUND: both engines perform the
    * identical IEEE multiply and round-half-away-from-zero on the same
    * double, so the resulting integer agrees bit-for-bit — unlike a
    * direct double→DECIMAL cast, where DuckDB's multiply-based cast and
    * Spark's exact BigDecimal conversion can land one ulp apart on
    * rounding boundaries (observed ~1 in 10^5 values at sf0.1). The
    * exact integers then sum associatively (decimal in Spark, hugeint
    * in DuckDB). */
  private def quant(c: org.apache.spark.sql.Column, scale: Double) =
    round(c * scale)

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q1_pricing_summary",
      (s, dir) => {
        // per-row magnitudes: qty*1e4 <= 5e5, ext*1e4 <= 1.1e9,
        // disc*1e4 <= 1e4, ext*1e4*(1-disc)*1e4 <= 1.1e13 — all under
        // ExactAgg's 2^44 chunk-safety bound
        val pre = t(s, dir, "lineitem").select(
          col("l_returnflag"), col("l_linestatus"),
          quant(col("l_quantity"), 10000).cast("long").as("q_qty"),
          quant(col("l_extendedprice"), 10000).cast("long").as("q_ext"),
          quant(col("l_discount"), 10000).cast("long").as("q_disc"),
          (quant(col("l_extendedprice"), 10000) *
            quant(lit(1) - col("l_discount"), 10000)).cast("long").as("q_dp"))
        ExactAgg
          .chunkedSums(pre, Seq("l_returnflag", "l_linestatus"),
            Seq("q_qty", "q_ext", "q_disc", "q_dp"))
          .select(
            col("l_returnflag"), col("l_linestatus"),
            (col("q_qty").cast("double") / 10000).as("sum_qty"),
            (col("q_ext").cast("double") / 10000).as("sum_base_price"),
            (col("q_dp").cast("double") / 100000000).as("sum_disc_price"),
            (col("q_qty").cast("double") / 10000 / col("_cnt")).as("avg_qty"),
            (col("q_disc").cast("double") / 10000 / col("_cnt")).as("avg_disc"),
            col("_cnt").as("count_order"))
      },
      Some(
        """SELECT l_returnflag, l_linestatus,
          |CAST(SUM(CAST(ROUND(l_quantity * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS sum_qty,
          |CAST(SUM(CAST(ROUND(l_extendedprice * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS sum_base_price,
          |CAST(SUM(CAST(ROUND(l_extendedprice * 10000) * ROUND((1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 100000000 AS sum_disc_price,
          |CAST(SUM(CAST(ROUND(l_quantity * 10000) AS BIGINT)) AS DOUBLE) / 10000 / COUNT(*) AS avg_qty,
          |CAST(SUM(CAST(ROUND(l_discount * 10000) AS BIGINT)) AS DOUBLE) / 10000 / COUNT(*) AS avg_disc,
          |COUNT(*) AS count_order
          |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin),
      "TPC-H Q1-style pricing summary (quantized exact aggregation)."),

    QueryDef(
      "q_revenue_by_nation",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val customer = t(s, dir, "customer")
        val nation = t(s, dir, "nation")
        val pre = orders
          .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name").as("nation"),
            quant(col("o_totalprice"), 10000).cast("long").as("q_tp"))
        ExactAgg.chunkedSums(pre, Seq("nation"), Seq("q_tp"))
          .select(col("nation"),
            (col("q_tp").cast("double") / 10000).as("revenue"),
            col("_cnt").as("n_orders"))
      },
      Some(
        """SELECT n_name AS nation,
          |CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS revenue,
          |COUNT(*) AS n_orders
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name""".stripMargin),
      "Broadcast dimension joins: fact table never shuffles."),

    QueryDef(
      "q_brand_volume",
      (s, dir) => {
        val pre = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part").where(col("p_size") > 25)),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("brand"),
            quant(col("l_quantity"), 10000).cast("long").as("q_qty"))
        ExactAgg.chunkedSums(pre, Seq("brand"), Seq("q_qty"))
          .select(col("brand"),
            (col("q_qty").cast("double") / 10000).as("sum_qty"),
            col("_cnt").as("n_lines"))
      },
      Some(
        """SELECT p_brand AS brand,
          |CAST(SUM(CAST(ROUND(l_quantity * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS sum_qty,
          |COUNT(*) AS n_lines
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE p_size > 25 GROUP BY p_brand""".stripMargin),
      "Filter pushed below a broadcast join, then hash aggregation."),

    QueryDef(
      "q_top_orders_per_customer",
      (s, dir) => {
        val w = Window
          .partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
      },
      Some(
        """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INT) AS rk FROM (
          |SELECT o_custkey, o_orderkey, o_totalprice,
          |ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
          |FROM orders) WHERE rk <= 3""".stripMargin),
      "Window top-N with deterministic tie-break on the key."),

    QueryDef(
      "q_order_priority",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("priority"))
          .agg(count("*").as("n")),
      Some(
        "SELECT o_orderpriority AS priority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority"),
      "Plain hash aggregation on a low-cardinality key."),

    QueryDef(
      "q_orders_with_lineitems",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select("l_orderkey")
        t(s, dir, "orders")
          .join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderstatus").as("status"))
          .agg(count("*").as("n"))
      },
      Some(
        """SELECT o_orderstatus AS status, COUNT(*) AS n FROM orders o
          |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
          |GROUP BY o_orderstatus""".stripMargin),
      "Left-semi join (EXISTS)."),

    QueryDef(
      "q_orders_without_lineitems",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select("l_orderkey")
        t(s, dir, "orders")
          .join(li, col("o_orderkey") === col("l_orderkey"), "left_anti")
          .select("o_orderkey", "o_orderstatus")
      },
      Some(
        """SELECT o_orderkey, o_orderstatus FROM orders o
          |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)""".stripMargin),
      "Left-anti join (NOT EXISTS)."),

    QueryDef(
      "q_value_quantiles",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type").as("queue"))
          .agg(
            expr("percentile(value, 0.5)").as("p50"),
            expr("percentile(value, 0.95)").as("p95"),
            expr("percentile(value, 0.99)").as("p99"),
            min("value").as("v_min"),
            max("value").as("v_max")),
      Some(
        """SELECT event_type AS queue,
          |quantile_cont(value, 0.5) AS p50, quantile_cont(value, 0.95) AS p95,
          |quantile_cont(value, 0.99) AS p99,
          |MIN(value) AS v_min, MAX(value) AS v_max
          |FROM events GROUP BY event_type""".stripMargin),
      "Exact quantiles (identical linear interpolation in both engines)."),

    QueryDef(
      "q_distinct_users",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type").as("queue"))
          .agg(
            countDistinct(col("user_id")).as("n_users"),
            count("*").as("n_events")),
      Some(
        """SELECT event_type AS queue, COUNT(DISTINCT user_id) AS n_users,
          |COUNT(*) AS n_events FROM events GROUP BY event_type""".stripMargin),
      "Distinct aggregation (expand + two-phase hash agg in Spark)."),

    QueryDef(
      "t_word_counts_salted",
      (s, dir) => {
        // two-phase salted aggregation: hot keys (stopwords) are spread
        // over 16 salt buckets for the first combine, then merged —
        // identical result to a plain groupBy, skew-proof at 100 TB
        val words = t(s, dir, "documents")
          .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
          .withColumn("salt", (crc32(col("word")) + spark_partition_id()) % 16)
        words
          .groupBy("word", "salt").agg(count("*").as("c"))
          .groupBy("word").agg(sum("c").as("n"))
          .where(col("n") >= 10)
      },
      Some(
        """SELECT word, COUNT(*) AS n FROM (
          |SELECT unnest(string_split(text, ' ')) AS word FROM documents)
          |GROUP BY word HAVING COUNT(*) >= 10""".stripMargin),
      "Salted two-phase word count — skew-resistant aggregation pattern."),

    QueryDef(
      "q_user_sessions",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        val ev = t(s, dir, "events")
        ev.select(col("user_id"), col("event_id"), Tables.tsUs(ev).as("ts_us"))
          .withColumn("prev_us", lag("ts_us", 1).over(w))
          .groupBy("user_id")
          .agg(
            count("*").as("n_events"),
            count(when(col("prev_us").isNull ||
              col("ts_us") - col("prev_us") > 1800L * 1000000L, 1)).as("n_sessions"))
      },
      Some(
        """SELECT user_id, COUNT(*) AS n_events,
          |COUNT(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 END) AS n_sessions
          |FROM (SELECT user_id, epoch_us(ts) AS ts_us,
          |LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
          |FROM events) GROUP BY user_id""".stripMargin),
      "Sessionization via lag window: 30-minute inactivity gap."),

    QueryDef(
      "q_asof_purchase_click",
      (s, dir) => {
        // AS-OF JOIN, the operator Spark lacks natively: for every
        // purchase, the user's most recent click at-or-before it. The
        // scalable formulation is union + ONE window pass (running
        // last non-null click per user) — a single shuffle keyed on
        // user, linear in events; the naive range join is quadratic
        // per user and explodes at 100 TB. Ties at identical ts count
        // the click first ('click' < 'purchase' in the sort).
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us"), col("event_type"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ev = t(s, dir, "events")
        ev.where(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), col("event_id"), col("event_type"),
            Tables.tsUs(ev).as("ts_us"))
          .withColumn("last_click_us",
            last(when(col("event_type") === "click", col("ts_us")),
              ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts_us").as("purchase_us"), col("last_click_us"),
            (col("ts_us") - col("last_click_us")).as("gap_us"))
      },
      Some(
        """SELECT user_id, purchase_id, purchase_us, last_click_us,
          |  purchase_us - last_click_us AS gap_us
          |FROM (
          |  SELECT user_id, event_id AS purchase_id, event_type,
          |    epoch_us(ts) AS purchase_us,
          |    LAST_VALUE(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
          |      OVER (PARTITION BY user_id
          |            ORDER BY epoch_us(ts), event_type, event_id
          |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
          |  FROM events WHERE event_type IN ('click', 'purchase'))
          |WHERE event_type = 'purchase'""".stripMargin),
      "As-of join: latest click at-or-before each purchase (union + one window pass)."),

    QueryDef(
      "q5_region_revenue",
      (s, dir) => {
        // TPC-H Q5 shape over the full star: lineitem⋈orders shuffles
        // on the order key; customer/supplier/nation/region are all
        // broadcast dimensions, with the Q5 local-supplier condition
        // (c_nationkey = s_nationkey) folded into the supplier join.
        val qRev = (quant(col("l_extendedprice"), 10000) *
          quant(lit(1) - col("l_discount"), 10000)).cast("long")
        val pre = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "supplier")),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .select(col("r_name").as("region"), qRev.as("q_rev"))
        ExactAgg.chunkedSums(pre, Seq("region"), Seq("q_rev"))
          .select(col("region"),
            (col("q_rev").cast("double") / 100000000).as("revenue"),
            col("_cnt").as("n_items"))
      },
      Some(
        """SELECT r_name AS region,
          |CAST(SUM(CAST(ROUND(l_extendedprice * 10000) * ROUND((1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 100000000 AS revenue,
          |COUNT(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name""".stripMargin),
      "TPC-H Q5-shaped revenue by region (local-supplier star join)."),

    QueryDef(
      "q_event_pivot",
      (s, dir) =>
        // Pivot (wide one-hot aggregation): one row per user, one count
        // column per event type. The type list is PINNED — Spark's
        // two-pass "discover the values first" pivot would add a full
        // extra scan plus a driver collect of the distinct values; with
        // explicit values this is ONE map-side-combinable hash agg at
        // any scale.
        t(s, dir, "events")
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
          .count()
          .na.fill(0L)
          .select(col("user_id"), col("click").as("n_click"),
            col("view").as("n_view"), col("purchase").as("n_purchase"),
            col("signup").as("n_signup"), col("error").as("n_error")),
      Some(
        """SELECT user_id,
          |COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
          |COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
          |COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
          |COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
          |COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
          |FROM events GROUP BY user_id""".stripMargin),
      "Pivot with pinned values: per-user event-type count matrix, one hash agg."),

    QueryDef(
      "q_rollup_revenue",
      (s, dir) => {
        // ROLLUP grouping sets: revenue at (region, nation), per-region
        // subtotal, and grand total. Two-level shape: the fact table is
        // FIRST reduced to one row per (region, nation) — Spark's
        // grouping-set Expand otherwise replicates every fact row once
        // per rollup level before the shuffle, tripling 100 TB of scan
        // output — and the rollup then runs on the nation-cardinality
        // aggregate. Exact: the quantized integer partials re-sum
        // associatively across levels.
        val qRev = (quant(col("l_extendedprice"), 10000) *
          quant(lit(1) - col("l_discount"), 10000)).cast("long")
        val pre = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .select(col("r_name").as("region"), col("n_name").as("nation"),
            qRev.as("rev_q"))
        val base = ExactAgg.chunkedSums(pre, Seq("region", "nation"), Seq("rev_q"), "n")
        base
          .rollup(col("region"), col("nation"))
          .agg(
            grouping_id().cast("int").as("lvl"),
            (sum(col("rev_q")).cast("double") / 100000000).as("revenue"),
            sum(col("n")).as("n_items"))
      },
      Some(
        """SELECT r_name AS region, n_name AS nation,
          |CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS lvl,
          |CAST(SUM(CAST(ROUND(l_extendedprice * 10000) * ROUND((1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 100000000 AS revenue,
          |COUNT(*) AS n_items
          |FROM lineitem
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP (r_name, n_name)""".stripMargin),
      "ROLLUP grouping sets: (region, nation) revenue + subtotals + grand total in one agg."),

    QueryDef(
      "q_topk_operator",
      (s, dir) =>
        // The custom TopKPerKey Catalyst operator (graft.plans): exact
        // top-3 orders per customer WITHOUT a window sort — partial
        // bounded heaps prune each scan partition to ≤3 rows per
        // customer BEFORE the shuffle, the exchange carries survivors
        // only, and the final heap pass is exact. Same rows as
        // q_top_orders_per_customer's window form (minus the rank
        // column, which a heap does not materialize); the plan is the
        // difference — no per-partition full sort at any scale.
        graft.plans.GraftOps.topKPerKey(
          t(s, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
          Seq("o_custkey"), 3, "-o_totalprice", "+o_orderkey"),
      Some(
        """SELECT o_custkey, o_orderkey, o_totalprice FROM (
          |SELECT o_custkey, o_orderkey, o_totalprice,
          |ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
          |FROM orders) WHERE rk <= 3""".stripMargin),
      "Custom TopKPerKey physical operator: heap-pruned exact top-3 per customer, no sort."),

    QueryDef(
      "q_kmv_distinct",
      (s, dir) => {
        // KMV (k-minimum-values / bottom-k) distinct sketch — the
        // deterministic alternative to HLL: the k-th smallest of the
        // distinct value hashes estimates cardinality as
        // (k-1) / (kth / 2^52). Unlike HLL registers, the sketch is
        // identical in any engine that shares the hash (md5 here), so
        // the oracle verifies it bit-for-bit. Scale shape: the distinct
        // is a map-side-combinable shuffle, then the custom TopKPerKey
        // operator prunes every partition to its k smallest hashes
        // BEFORE the per-group shuffle — the classic sketch-merge
        // pattern (union bottom-k sets, keep bottom k). k=8 so the
        // sketch exists at every fixture SF (sf0.001 has only 15
        // distinct users per type); production would use k≈1024.
        val k = 8
        val h = t(s, dir, "events")
          .select(col("event_type"), col("user_id")).distinct()
          .select(col("event_type"),
            conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 13),
              16, 10).cast("long").as("h"))
        val bottomK = graft.plans.GraftOps.topKPerKey(h, Seq("event_type"), k, "+h")
        // groups with < k distinct values have no k-th hash: the sketch
        // is exact there, and the oracle's rk = k row doesn't exist —
        // require a full sketch before estimating
        val kth = bottomK.groupBy("event_type")
          .agg(max("h").as("kth_hash"), count(lit(1)).as("n_sk"))
          .where(col("n_sk") === k).drop("n_sk")
        val exact = t(s, dir, "events")
          .groupBy("event_type").agg(countDistinct("user_id").as("n_exact"))
        exact.join(kth, "event_type")
          .select(col("event_type"), col("n_exact"), col("kth_hash"),
            (lit((k - 1).toDouble) * lit(4503599627370496L) / col("kth_hash"))
              .as("est_distinct"))
      },
      Some(
        """WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
          |h AS (SELECT event_type,
          |  CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT) AS h
          |  FROM d),
          |r AS (SELECT event_type, h,
          |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk FROM h),
          |kth AS (SELECT event_type, h AS kth_hash FROM r WHERE rk = 8),
          |ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1)
          |SELECT ex.event_type, n_exact, kth_hash,
          |  7.0 * 4503599627370496 / kth_hash AS est_distinct
          |FROM ex JOIN kth ON ex.event_type = kth.event_type""".stripMargin),
      "KMV bottom-k distinct sketch (deterministic, oracle-exact) built on TopKPerKey."),

    QueryDef(
      "q_rolling_avg",
      (s, dir) => {
        // Trailing 7-day window over a daily pre-aggregate — the
        // standard time-series rolling metric. Scale shape: the raw
        // events collapse to one row per (event_type, day) in a
        // map-side-combinable hash agg FIRST, so the RANGE window runs
        // over day-cardinality data (thousands of rows per key at
        // 100 TB, not billions); revenue is quantized to integer cents
        // before any sum so the window total is order-independent.
        val evF = t(s, dir, "events")
        val daily = evF
          .select(col("event_type"), Tables.tsUs(evF).as("ts_us"),
            round(col("value") * 100).cast("long").as("v_c"))
          .select(col("event_type"),
            expr("ts_us div 86400000000").as("day"), col("v_c"))
          .groupBy("event_type", "day")
          .agg(sum("v_c").as("rev_c"), count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rangeBetween(-6, Window.currentRow)
        daily.select(col("event_type"), col("day"),
          (col("rev_c").cast("double") / 100).as("daily_rev"),
          (sum("rev_c").over(w).cast("double") / 100).as("rev_7d"),
          (sum("rev_c").over(w).cast("double") / sum("n").over(w) / 100)
            .as("avg_per_event_7d"))
      },
      Some(
        """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
          |  SUM(CAST(ROUND(value * 100) AS BIGINT)) AS rev_c, COUNT(*) AS n
          |  FROM events GROUP BY 1, 2)
          |SELECT event_type, day,
          |  CAST(rev_c AS DOUBLE) / 100 AS daily_rev,
          |  CAST(SUM(rev_c) OVER w AS DOUBLE) / 100 AS rev_7d,
          |  CAST(SUM(rev_c) OVER w AS DOUBLE) / SUM(n) OVER w / 100 AS avg_per_event_7d
          |FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day
          |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin),
      "Trailing 7-day rolling revenue/average over a daily pre-aggregate (RANGE window)."),

    QueryDef(
      "q_ntile_quartiles",
      (s, dir) => {
        // Spend-quartile assignment per event_type — the NTILE bucket
        // operator. Scale shape: the window partitions by event_type
        // (never a global SinglePartition sort), and it runs over the
        // user-level pre-aggregate, not raw events; quantized totals +
        // a user_id tie-break give NTILE a total order, so bucket
        // boundaries are deterministic in both engines.
        val spend = t(s, dir, "events")
          .groupBy("event_type", "user_id")
          .agg(sum(round(col("value") * 100).cast("long")).as("tc"))
        val w = Window.partitionBy("event_type")
          .orderBy(col("tc").desc, col("user_id"))
        spend.select(col("event_type"), col("user_id"),
          (col("tc").cast("double") / 100).as("total"),
          ntile(4).over(w).as("quartile"))
      },
      Some(
        """WITH s AS (SELECT event_type, user_id,
          |  SUM(CAST(ROUND(value * 100) AS BIGINT)) AS tc
          |  FROM events GROUP BY 1, 2)
          |SELECT event_type, user_id, CAST(tc AS DOUBLE) / 100 AS total,
          |  CAST(NTILE(4) OVER (PARTITION BY event_type ORDER BY tc DESC, user_id)
          |    AS INT) AS quartile
          |FROM s""".stripMargin),
      "NTILE spend quartiles per event_type over a user-level pre-aggregate."),

    QueryDef(
      "q_funnel_3step",
      (s, dir) => {
        // Ordered-funnel analysis with a conversion window (signup →
        // click within 24h → purchase within 24h of that click): the
        // per-user stage depth, then one histogram row per stage.
        // Scale shape: three min-aggregations keyed on user_id
        // (map-side combinable) chained by user-key equi-joins — no
        // window over raw events, no self-join on the event level;
        // each stage's frame is user-sized, not event-sized. Strict >
        // on µs timestamps keeps both engines' stage boundaries
        // identical.
        val W = 86400000000L // 24 h conversion window in µs
        val evRaw = t(s, dir, "events")
        val ev = evRaw
          .select(col("user_id"), col("event_type"),
            Tables.tsUs(evRaw).as("ts_us"))
        val s1 = ev.where(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts_us").as("t1"))
        val s2 = ev.where(col("event_type") === "click")
          .join(s1, "user_id")
          .where(col("ts_us") > col("t1") && col("ts_us") <= col("t1") + W)
          .groupBy("user_id").agg(min("ts_us").as("t2"))
        val s3 = ev.where(col("event_type") === "purchase")
          .join(s2, "user_id")
          .where(col("ts_us") > col("t2") && col("ts_us") <= col("t2") + W)
          .groupBy("user_id").agg(min("ts_us").as("t3"))
        s1.select(col("user_id"), lit(1).as("d"))
          .unionAll(s2.select(col("user_id"), lit(2).as("d")))
          .unionAll(s3.select(col("user_id"), lit(3).as("d")))
          .groupBy("user_id").agg(max("d").as("funnel_stage"))
          .groupBy("funnel_stage").agg(count(lit(1)).as("n_users"))
      },
      Some(
        """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
          |s1 AS (SELECT user_id, MIN(us) AS t1 FROM e
          |  WHERE event_type = 'signup' GROUP BY user_id),
          |s2 AS (SELECT e.user_id, MIN(us) AS t2 FROM e JOIN s1 ON e.user_id = s1.user_id
          |  WHERE event_type = 'click' AND us > t1 AND us <= t1 + 86400000000
          |  GROUP BY e.user_id),
          |s3 AS (SELECT e.user_id, MIN(us) AS t3 FROM e JOIN s2 ON e.user_id = s2.user_id
          |  WHERE event_type = 'purchase' AND us > t2 AND us <= t2 + 86400000000
          |  GROUP BY e.user_id),
          |d AS (SELECT user_id, 1 AS d FROM s1
          |  UNION ALL SELECT user_id, 2 FROM s2
          |  UNION ALL SELECT user_id, 3 FROM s3)
          |SELECT CAST(MAXD AS INT) AS funnel_stage, COUNT(*) AS n_users FROM (
          |  SELECT user_id, MAX(d) AS MAXD FROM d GROUP BY user_id)
          |GROUP BY 1""".stripMargin),
      "Ordered 3-step funnel (signup → click→24h → purchase→24h): per-user stage depth histogram."),

    QueryDef(
      "q_range_join_clicks",
      (s, dir) => {
        // RANGE JOIN (interval join), binned: for each purchase, count
        // the same user's clicks in the preceding 10 minutes. The naive
        // formulation is a theta-join (quadratic per user, a BNLJ plan);
        // binning timestamps into window-sized buckets turns it into an
        // equi-join on (user_id, bin) — each purchase probes exactly two
        // bins (its own and the previous one, which together cover any
        // 10-minute lookback), then the exact range predicate filters
        // the candidates. Each qualifying click pair appears once since
        // a click lives in exactly one bin. Cost is linear in events +
        // matches at any scale.
        //
        // ASSUMES ts >= 0 (the fixture starts at 2024): `div` truncates
        // toward zero, so a pre-epoch timestamp would bin one bucket too
        // HIGH (floor division rounds down, truncation rounds up for
        // negatives) and its clicks could silently miss the probe of a
        // purchase in the true previous bin. Floor semantics would need
        // `floor(ts_us / W)` on doubles or a sign-corrected div.
        val W = 600L * 1000000L // 10-minute window in microseconds
        val evRaw = t(s, dir, "events")
        val ev = evRaw
          .select(col("user_id"), col("event_id"), col("event_type"),
            Tables.tsUs(evRaw).as("ts_us"))
          .withColumn("bin", expr(s"ts_us div $W"))
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("ts_us").as("c_us"), col("bin"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts_us").as("p_us"),
            explode(array(col("bin") - 1, col("bin"))).as("bin"))
        purchases.join(clicks, Seq("user_id", "bin"))
          .where(col("c_us") > col("p_us") - W && col("c_us") <= col("p_us"))
          .groupBy(col("purchase_id"))
          .agg(count(lit(1)).as("n_clicks"), max("c_us").as("last_click_us"))
      },
      Some(
        """SELECT p.event_id AS purchase_id, COUNT(*) AS n_clicks,
          |  MAX(epoch_us(c.ts)) AS last_click_us
          |FROM events p JOIN events c ON c.user_id = p.user_id
          |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
          |  AND epoch_us(c.ts) > epoch_us(p.ts) - 600000000
          |  AND epoch_us(c.ts) <= epoch_us(p.ts)
          |GROUP BY 1""".stripMargin),
      "Binned range join: per-purchase click count over a 10-minute lookback."),

    QueryDef(
      "q_cube_orders",
      (s, dir) =>
        // CUBE grouping sets: revenue at (priority, status), each
        // one-dimension margin, and the grand total — the full 2^2
        // lattice. Two-level shape: the orders table FIRST collapses to
        // one exact partial per (priority, status) — Expand otherwise
        // replicates every fact row 4x before the shuffle — and the
        // cube lattice re-sums the (priority x status)-cardinality
        // partials; quantized integer partials re-sum associatively
        // across levels.
        {
          val pre = t(s, dir, "orders")
            .select(col("o_orderpriority").as("priority"),
              col("o_orderstatus").as("status"),
              quant(col("o_totalprice"), 100).cast("long").as("q_tp"))
          ExactAgg.chunkedSums(pre, Seq("priority", "status"), Seq("q_tp"))
            .cube(col("priority"), col("status"))
            .agg(
              grouping_id().cast("int").as("lvl"),
              (sum(col("q_tp")).cast("double") / 100).as("revenue"),
              sum(col("_cnt")).as("n_orders"))
        },
      Some(
        """SELECT o_orderpriority AS priority, o_orderstatus AS status,
          |CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS INT) AS lvl,
          |CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue,
          |COUNT(*) AS n_orders
          |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin),
      "CUBE aggregate: order revenue over the full (priority, status) lattice."),

    QueryDef(
      "q_nation_share",
      (s, dir) => {
        // Ratio-to-report window: each nation's share of its region's
        // revenue. The fact table collapses to nation cardinality
        // before the window, so the unordered whole-partition SUM runs
        // over ≤25 rows regardless of input scale. Exactness: the share
        // is ONE double division of two exactly-represented integers
        // (quantized cents, < 2^53), so both engines produce the
        // identical IEEE-754 quotient.
        val pre = t(s, dir, "orders")
          .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .select(col("r_name").as("region"), col("n_name").as("nation"),
            quant(col("o_totalprice"), 100).cast("long").as("rev_c"))
        val rev = ExactAgg
          .chunkedSums(pre, Seq("region", "nation"), Seq("rev_c"))
          .drop("_cnt")
        val w = Window.partitionBy("region")
        rev.select(col("region"), col("nation"),
          (col("rev_c").cast("double") / 100).as("revenue"),
          (col("rev_c").cast("double") / sum("rev_c").over(w).cast("double"))
            .as("share"))
      },
      Some(
        """WITH rev AS (SELECT r_name AS region, n_name AS nation,
          |  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
          |  FROM orders
          |  JOIN customer ON o_custkey = c_custkey
          |  JOIN nation ON c_nationkey = n_nationkey
          |  JOIN region ON n_regionkey = r_regionkey
          |  GROUP BY 1, 2)
          |SELECT region, nation, CAST(rev_c AS DOUBLE) / 100 AS revenue,
          |  CAST(rev_c AS DOUBLE) / CAST(SUM(rev_c) OVER (PARTITION BY region) AS DOUBLE) AS share
          |FROM rev""".stripMargin),
      "Ratio-to-report window: nation share of region revenue."),

    QueryDef(
      "q_trending_topk",
      (s, dir) => {
        // Windowed heavy hitters: top-3 event types per hour by count.
        // Two-level shape: the stream is FIRST reduced to one row per
        // (hour, type) — a map-side-combinable count — and the heap
        // operator then prunes THAT frame, so the exchange carries
        // ≤ 3·hours rows however hot a type gets. The all-in-one window
        // rank would instead sort every (hour, type) group per
        // partition; the heap never sorts.
        val evRaw = t(s, dir, "events")
        val pre = evRaw
          .select(Tables.tsUs(evRaw).as("ts_us"), col("event_type"))
          .select(expr("ts_us div 3600000000").as("hour"), col("event_type"))
          .groupBy("hour", "event_type").agg(count("*").as("n"))
        graft.plans.GraftOps.topKPerKey(
          pre, Seq("hour"), 3, "-n", "+event_type")
      },
      Some(
        """SELECT hour, event_type, n FROM (
          |SELECT epoch_us(ts) // 3600000000 AS hour, event_type,
          |  COUNT(*) AS n,
          |  ROW_NUMBER() OVER (PARTITION BY (epoch_us(ts) // 3600000000)
          |    ORDER BY COUNT(*) DESC, event_type) AS rk
          |FROM events GROUP BY 1, 2) WHERE rk <= 3""".stripMargin),
      "Hourly trending top-3 event types: pre-agg + heap operator, no window sort."),

    QueryDef(
      "q_cohort_retention",
      (s, dir) => {
        // Cohort retention matrix — the canonical product-analytics
        // rollup: users grouped by first-seen day (cohort), counted on
        // each later day they return, as (cohort_day, day_offset,
        // n_users). Scale shape: first-seen is a map-side-combinable
        // min per user; the join-back is keyed on user_id (id-sized
        // frames both sides — AQE broadcasts when small); the matrix
        // agg is a distinct-count over (cohort, offset, user) — at
        // 100 TB the pre-distinct bounds the final shuffle to the
        // active-days output, never raw events.
        val evRaw = t(s, dir, "events")
        val ev = evRaw.select(col("user_id"),
          Tables.tsUs(evRaw).as("ts_us"))
          .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
        val first = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
        ev.join(first, "user_id")
          .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"),
            col("user_id"))
          .distinct()
          .groupBy("cohort_day", "day_offset")
          .agg(countDistinct("user_id").as("n_users"))
      },
      Some(
        """WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
          |f AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id)
          |SELECT cohort_day, day - cohort_day AS day_offset,
          |  COUNT(DISTINCT ev.user_id) AS n_users
          |FROM ev JOIN f ON ev.user_id = f.user_id
          |GROUP BY cohort_day, day - cohort_day""".stripMargin),
      "Cohort retention matrix: first-seen-day cohorts x day-offset distinct-user counts."),

    QueryDef(
      "q_value_zscore",
      (s, dir) => {
        // Per-type z-score outlier detection — the standard anomaly
        // gate in metrics pipelines. Exactness: moments are EXACT
        // integer sums over quantized cents (count/sum/sum-of-squares,
        // all map-side combinable), and the z formula is the identical
        // IEEE expression tree in both engines, so the doubles agree
        // bit-for-bit (the jaccard precedent). Scale shape: one
        // map-side-combinable aggregation to |event_type| rows, then an
        // explicit broadcast join back — the fact table never shuffles.
        // sum(cents^2) holds to ~1e18; beyond that the partials would go
        // through ExactAgg's decimal chunked sums.
        val evRaw = t(s, dir, "events")
        val ev = evRaw.select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        val stats = ev.groupBy("event_type").agg(
          count("*").as("n"), sum("cents").as("s"),
          sum(col("cents") * col("cents")).as("sq"))
        val mean = col("s").cast("double") / col("n").cast("double")
        val varS = (col("sq").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n").cast("double")) /
          (col("n").cast("double") - lit(1.0))
        ev.join(broadcast(stats), "event_type")
          .withColumn("z", (col("cents").cast("double") - mean) / sqrt(varS))
          .where(abs(col("z")) > 2.0)
          .select(col("event_id"), col("event_type"), col("cents"), col("z"))
      },
      Some(
        """WITH ev AS (SELECT event_id, event_type,
          |  CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events),
          |st AS (SELECT event_type, COUNT(*) AS n, SUM(cents) AS s,
          |  SUM(cents * cents) AS sq FROM ev GROUP BY event_type)
          |SELECT event_id, ev.event_type, cents,
          |  (CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          |    / sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          |      / (CAST(n AS DOUBLE) - 1.0)) AS z
          |FROM ev JOIN st ON ev.event_type = st.event_type
          |WHERE abs((CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          |    / sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          |      / (CAST(n AS DOUBLE) - 1.0))) > 2.0""".stripMargin),
      "Per-type z-score outliers from exact integer moments (sample stddev)."),

    QueryDef(
      "q_value_mad",
      (s, dir) => {
        // Robust outliers via Median Absolute Deviation — the
        // heavy-tail-safe sibling of q_value_zscore (one fat outlier
        // inflates a stddev and hides its peers; the median pair is
        // insensitive to half the data going bad). Two aggregation
        // passes (median, then median of |x − med|), each joined back
        // as an explicit |event_type|-row broadcast — the fact table
        // never shuffles; Spark's exact `percentile` and DuckDB's
        // quantile_cont share the same linear interpolation, and the
        // 3·1.4826·mad gate is the identical IEEE tree in both.
        val ev = t(s, dir, "events").select(col("event_type"), col("value"))
        val med = ev.groupBy("event_type")
          .agg(expr("percentile(value, 0.5)").as("med"))
        val dev = ev.join(broadcast(med), "event_type")
          .withColumn("adev", abs(col("value") - col("med")))
        val mad = dev.groupBy("event_type")
          .agg(expr("percentile(adev, 0.5)").as("mad"))
        dev.join(broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(first("med").as("med"), first("mad").as("mad"),
            count(lit(1)).as("n"),
            sum(when(col("adev") > lit(3.0) * lit(1.4826) * col("mad"), 1L)
              .otherwise(0L)).as("n_outliers"))
      },
      Some(
        """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
          |    FROM events GROUP BY event_type),
          |d AS (SELECT e.event_type, e.value, med, abs(e.value - med) AS adev
          |    FROM events e JOIN med ON e.event_type = med.event_type),
          |m2 AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM d GROUP BY event_type)
          |SELECT d.event_type, ANY_VALUE(d.med) AS med, ANY_VALUE(m2.mad) AS mad,
          |  COUNT(*) AS n,
          |  CAST(SUM(CASE WHEN d.adev > 3.0 * 1.4826 * m2.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
          |FROM d JOIN m2 ON d.event_type = m2.event_type
          |GROUP BY d.event_type""".stripMargin),
      "Robust MAD outlier gate per event type (median + median-absolute-deviation)."),

    QueryDef(
      "q_value_histogram",
      (s, dir) => {
        // Fixed-width value histogram per event type (50.00-wide bins)
        // — the distribution-shape observability every metrics UI draws.
        // Binning is INTEGER division over quantized cents, so bucket
        // assignment is exact in both engines (no float floor at bin
        // edges); one map-side-combinable aggregation, output is
        // |types|·|buckets| rows.
        t(s, dir, "events")
          .select(col("event_type"),
            expr("CAST(ROUND(value * 100) AS BIGINT) div 5000").as("bucket"))
          .groupBy("event_type", "bucket")
          .agg(count(lit(1)).as("n"))
          .select(col("event_type"), col("bucket"),
            (col("bucket") * 50.0).as("lo"),
            ((col("bucket") + 1L) * 50.0).as("hi"), col("n"))
      },
      Some(
        """SELECT event_type, bucket, bucket * 50.0 AS lo,
          |  (bucket + 1) * 50.0 AS hi, COUNT(*) AS n
          |FROM (SELECT event_type,
          |  CAST(ROUND(value * 100) AS BIGINT) // 5000 AS bucket FROM events)
          |GROUP BY event_type, bucket""".stripMargin),
      "Exact fixed-width value histogram per event type (integer binning)."),

    QueryDef(
      "q_grouping_sets",
      (s, dir) =>
        // Arbitrary GROUPING SETS — the general form CUBE/ROLLUP are
        // sugar for: each one-dimension margin plus the grand total,
        // WITHOUT the (priority, status) cross cell a full cube would
        // also compute. Same two-level shape as q_cube_orders: collapse
        // the fact table to one exact partial per (priority, status)
        // first — Expand otherwise replicates every fact row once per
        // grouping set before the shuffle — then re-sum the tiny
        // partial table across the requested sets; quantized integer
        // partials re-sum associatively across levels.
        {
          val pre = t(s, dir, "orders")
            .select(col("o_orderpriority").as("priority"),
              col("o_orderstatus").as("status"),
              quant(col("o_totalprice"), 100).cast("long").as("q_tp"))
          ExactAgg.chunkedSums(pre, Seq("priority", "status"), Seq("q_tp"))
            .groupingSets(
              Seq(Seq(col("priority")), Seq(col("status")), Seq.empty),
              col("priority"), col("status"))
            .agg(
              grouping_id().cast("int").as("lvl"),
              (sum(col("q_tp")).cast("double") / 100).as("revenue"),
              sum(col("_cnt")).as("n_orders"))
        },
      Some(
        """SELECT o_orderpriority AS priority, o_orderstatus AS status,
          |CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS INT) AS lvl,
          |CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue,
          |COUNT(*) AS n_orders
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""".stripMargin),
      "GROUPING SETS margins: per-priority, per-status, and grand total in one pass."),

    QueryDef(
      "q_hll_distinct",
      (s, dir) => {
        // HyperLogLog distinct-count per event_type — the register-max
        // sketch that complements q_kmv_distinct's bottom-k: m=64
        // registers, register j keeps max(rho) where rho = leading
        // zeros of the hashed value's upper 26 bits + 1, estimate =
        // alpha·m²/Σ2^-M_j (Flajolet et al. 2007, raw estimator).
        // Cross-engine determinism without ANY float log: the hash is
        // the guarded Knuth multiply (pure integers), rho comes from
        // the BINARY STRING LENGTH of v (= floor(log2)+1 exactly, both
        // engines), 2^-M terms are exact powers of two spanning < 53
        // bits so the 64-term sum is EXACT in IEEE double under any
        // order. Scale shape: register table is a map-side-combinable
        // (type, bucket) max-agg → 64 rows per type regardless of
        // corpus size (mergeable across any partitioning — the whole
        // point of HLL at 100 TB); the exact countDistinct alongside is
        // the eval yardstick.
        val ev = Tables.t(s, dir, "events")
          .select(col("event_type"),
            (col("user_id") % 1000003L * 2654435761L % 4294967296L).as("h"))
        val reg = ev
          .select(col("event_type"), (col("h") % 64).as("b"),
            expr("h DIV 64").as("v"))
          .select(col("event_type"), col("b"),
            when(col("v") === 0, 27)
              .otherwise(lit(27) - length(bin(col("v")))).as("rho"))
          .groupBy("event_type", "b").agg(max("rho").as("m"))
          // cached: 64 rows/type; feeds both the type grid and the
          // register join — without it the grid's distinct would
          // re-scan the whole events table just to enumerate types
          .cache()
        reg.count() // populate BEFORE the grid/join legs race it
        val grid = reg.select("event_type").distinct()
          .crossJoin(s.range(64).select(col("id").as("b")))
        val est = grid.join(reg, Seq("event_type", "b"), "left")
          .select(col("event_type"), coalesce(col("m"), lit(0)).as("m"))
          .groupBy("event_type")
          .agg(sum(pow(lit(2.0), -col("m"))).as("z"),
            sum((col("m") > 0).cast("int")).as("hit"))
          .select(col("event_type"),
            (lit(0.709) * 4096 / col("z")).as("hll_est"),
            col("hit").cast("int").as("n_buckets_hit"))
        Tables.t(s, dir, "events")
          .groupBy("event_type").agg(countDistinct("user_id").as("n_exact"))
          .join(est, "event_type")
      },
      Some(
        """WITH ev AS (SELECT event_type,
          |    user_id % 1000003 * 2654435761 % 4294967296 AS h FROM events),
          |r AS (SELECT event_type, h % 64 AS b,
          |    CASE WHEN h // 64 = 0 THEN 27
          |         ELSE 27 - length(printf('%b', h // 64)) END AS rho FROM ev),
          |reg AS (SELECT event_type, b, MAX(rho) AS m FROM r GROUP BY 1, 2),
          |g2 AS (SELECT event_type, i AS b
          |  FROM (SELECT DISTINCT event_type FROM events), unnest(range(64)) AS ti(i)),
          |fb AS (SELECT g2.event_type, COALESCE(reg.m, 0) AS m FROM g2
          |  LEFT JOIN reg ON g2.event_type = reg.event_type AND g2.b = reg.b),
          |agg AS (SELECT event_type, SUM(power(2.0, -m)) AS z,
          |    SUM(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS hit FROM fb GROUP BY 1),
          |ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
          |  FROM events GROUP BY 1)
          |SELECT ex.event_type, n_exact,
          |  CAST(0.709 AS DOUBLE) * 4096 / z AS hll_est,
          |  CAST(hit AS INT) AS n_buckets_hit
          |FROM ex JOIN agg USING (event_type)""".stripMargin),
      "HyperLogLog (m=64) distinct users per event type vs exact, log-free registers."),

    QueryDef(
      "q_quantile_sketch",
      (s, dir) => {
        // Mergeable histogram quantiles — the at-scale replacement for
        // exact sort-based percentiles: a 128-bin fixed-width histogram
        // per event_type (map-side-combinable counts, CONSTANT size per
        // key at any corpus — mergeable across any partitioning, unlike
        // percentile() which buffers values), then each quantile reads
        // the cumulative histogram: first bin whose running count
        // reaches p·n, answer = the bin's upper edge (error <= 1 bin
        // width by construction). The exact percentile alongside is the
        // eval yardstick (Spark percentile == DuckDB quantile_cont,
        // verified parity). Determinism: bin ids are floor() on
        // identically-ordered double arithmetic; cumulative counts are
        // integers; edges re-derive from (bin, vmax) with the same op
        // order in both engines.
        val ev = t(s, dir, "events").select(col("event_type"), col("value"))
        val vmax = ev.agg(max("value").as("vmax"))
        val hist = ev.crossJoin(broadcast(vmax))
          .select(col("event_type"),
            least(floor(col("value") / col("vmax") * 128), lit(127))
              .cast("int").as("bin"))
          .groupBy("event_type", "bin").agg(count("*").as("c"))
        val cum = hist
          .withColumn("cum", sum("c").over(
            Window.partitionBy("event_type").orderBy("bin")))
          .withColumn("n", sum("c").over(Window.partitionBy("event_type")))
        val ps = Seq(0.5, 0.9, 0.99)
        val qb = cum
          .select(col("event_type"), col("bin"), col("cum"), col("n"),
            explode(array(ps.map(lit): _*)).as("p"))
          .where(col("cum") >= col("p") * col("n"))
          .groupBy("event_type", "p").agg(min("bin").as("qbin"))
        val approx = qb.crossJoin(broadcast(vmax))
          .select(col("event_type"), col("p"),
            ((col("qbin") + 1).cast("double") * col("vmax") / 128).as("approx_q"))
        val exact = ev.groupBy("event_type")
          .agg(
            expr("percentile(value, 0.5)").as("e50"),
            expr("percentile(value, 0.9)").as("e90"),
            expr("percentile(value, 0.99)").as("e99"))
          .select(col("event_type"), explode(map(
            lit(0.5), col("e50"), lit(0.9), col("e90"),
            lit(0.99), col("e99"))).as(Seq("p", "exact_q")))
        approx.join(exact, Seq("event_type", "p"))
      },
      Some(
        """WITH vm AS (SELECT MAX(value) AS vmax FROM events),
          |hist AS (SELECT event_type,
          |    LEAST(CAST(FLOOR(value / vmax * 128) AS INT), 127) AS bin,
          |    COUNT(*) AS c FROM events, vm GROUP BY 1, 2),
          |cum AS (SELECT event_type, bin,
          |    SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
          |    SUM(c) OVER (PARTITION BY event_type) AS n FROM hist),
          |ps AS (SELECT unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS p),
          |qb AS (SELECT event_type, p, MIN(bin) AS qbin
          |    FROM cum, ps WHERE cum >= p * n GROUP BY 1, 2),
          |ex AS (SELECT event_type, p,
          |    CASE p WHEN 0.5 THEN q50 WHEN 0.9 THEN q90 ELSE q99 END AS exact_q
          |  FROM (SELECT event_type, quantile_cont(value, 0.5) AS q50,
          |          quantile_cont(value, 0.9) AS q90,
          |          quantile_cont(value, 0.99) AS q99
          |        FROM events GROUP BY 1), ps)
          |SELECT qb.event_type, qb.p,
          |  CAST(qbin + 1 AS DOUBLE) * vmax / 128 AS approx_q, exact_q
          |FROM qb JOIN ex ON qb.event_type = ex.event_type AND qb.p = ex.p, vm""".stripMargin),
      "Mergeable 128-bin histogram quantiles (p50/p90/p99) vs exact percentile."),

    QueryDef(
      "q_kmv_union",
      (s, dir) => {
        // KMV sketch UNION — the algebra that makes bottom-k sketches
        // work at 100 TB: per-type sketches (8 smallest distinct-user
        // hashes each, built with the TopKPerKey heap operator) merge
        // by unioning the hash sets and re-taking the bottom 8; the
        // merged sketch estimates the DISTINCT-UNION cardinality, which
        // naive per-type summing double-counts (a user appears under
        // many types). One output row: exact union, naive sum, and the
        // sketch estimate from 8 longs per type — the merge itself
        // never touches the raw data again.
        val k = 8
        val d = t(s, dir, "events")
          .select(col("event_type"), col("user_id")).distinct()
        val h = d.select(col("event_type"),
          conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 13),
            16, 10).cast("long").as("h"))
        val perType = graft.plans.GraftOps.topKPerKey(h, Seq("event_type"), k, "+h")
        val kth = perType.select("h").distinct().orderBy("h").limit(k)
          .agg(max("h").as("kth_hash"), count(lit(1)).as("nk"))
          .where(col("nk") === k).drop("nk")
        val exact = t(s, dir, "events")
          .agg(countDistinct("user_id").as("n_exact"))
        val naive = d.groupBy("event_type").agg(count("*").as("c"))
          .agg(sum("c").as("n_naive_sum"))
        exact.crossJoin(naive).crossJoin(kth)
          .select(col("n_exact"), col("n_naive_sum"), col("kth_hash"),
            (lit((k - 1).toDouble) * lit(4503599627370496L) / col("kth_hash"))
              .as("est_union"))
      },
      Some(
        """WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
          |h AS (SELECT event_type,
          |  CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT) AS h
          |  FROM d),
          |r AS (SELECT event_type, h,
          |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk FROM h),
          |sk AS (SELECT DISTINCT h FROM r WHERE rk <= 8),
          |m AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk FROM sk),
          |kth AS (SELECT h AS kth_hash FROM m WHERE rk = 8),
          |ex AS (SELECT COUNT(DISTINCT user_id) AS n_exact FROM events),
          |nv AS (SELECT CAST(SUM(c) AS BIGINT) AS n_naive_sum FROM
          |  (SELECT COUNT(DISTINCT user_id) AS c FROM events GROUP BY event_type))
          |SELECT n_exact, n_naive_sum, kth_hash,
          |  7.0 * 4503599627370496 / kth_hash AS est_union
          |FROM ex, nv, kth""".stripMargin),
      "KMV sketch union: merged bottom-k estimates distinct-union vs naive sum."),

    QueryDef(
      "q_kmv_jaccard",
      (s, dir) => {
        // KMV sketch INTERSECTION — the other half of the bottom-k
        // algebra: estimate the audience overlap of two event types
        // from two k-hash sketches alone. rho = how many of the MERGED
        // sketch's k smallest hashes appear in BOTH per-type sketches;
        // rho/k estimates Jaccard, and x the merged union estimate it
        // estimates |A ∩ B| — all from 2k longs, never re-touching the
        // raw data. At 100 TB the per-type sketches are TopKPerKey
        // heap reductions (k rows cross the network per type); every
        // join below is between k-row frames. Exact counts ride along
        // as the evaluation columns.
        val k = 8
        val ab = Seq("click", "purchase")
        val d = t(s, dir, "events")
          .where(col("event_type").isin(ab: _*))
          .select(col("event_type"), col("user_id")).distinct()
        val h = d.select(col("event_type"),
          conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 13),
            16, 10).cast("long").as("h"))
        val sk = graft.plans.GraftOps.topKPerKey(h, Seq("event_type"), k, "+h")
        val merged = sk.select("h").distinct().orderBy("h").limit(k).cache()
        merged.count() // populate BEFORE the kth/rho legs race its sketch pass
        val kth = merged.agg(max("h").as("kth_hash"), count(lit(1)).as("nk"))
          .where(col("nk") === k).drop("nk")
        val rho = merged
          .join(sk.where(col("event_type") === ab(0)).select("h"), Seq("h"), "leftsemi")
          .join(sk.where(col("event_type") === ab(1)).select("h"), Seq("h"), "leftsemi")
          .agg(count(lit(1)).as("rho"))
        val ex = d.groupBy("user_id").agg(count(lit(1)).as("nt"))
          .agg(count(lit(1)).as("n_union_exact"),
            sum((col("nt") === 2).cast("long")).as("n_inter_exact"))
        ex.crossJoin(rho).crossJoin(kth)
          .select(col("n_inter_exact"), col("n_union_exact"), col("rho"),
            (col("rho") / lit(8.0)).as("est_jaccard"),
            ((col("rho") / lit(8.0)) *
              (lit(7.0) * lit(4503599627370496L) / col("kth_hash")))
              .as("est_intersection"))
      },
      Some(
        """WITH d AS (SELECT DISTINCT event_type, user_id FROM events
          |  WHERE event_type IN ('click', 'purchase')),
          |h AS (SELECT event_type,
          |  CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT) AS h
          |  FROM d),
          |r AS (SELECT event_type, h,
          |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk FROM h),
          |sk AS (SELECT DISTINCT event_type, h FROM r WHERE rk <= 8),
          |m AS (SELECT h FROM (SELECT DISTINCT h FROM sk) ORDER BY h LIMIT 8),
          |kth AS (SELECT MAX(h) AS kth_hash FROM m),
          |rho AS (SELECT COUNT(*) AS rho FROM m
          |  WHERE h IN (SELECT h FROM sk WHERE event_type = 'click')
          |    AND h IN (SELECT h FROM sk WHERE event_type = 'purchase')),
          |ex AS (SELECT COUNT(*) AS n_union_exact,
          |    CAST(SUM(CASE WHEN nt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_inter_exact
          |  FROM (SELECT user_id, COUNT(*) AS nt FROM d GROUP BY user_id))
          |SELECT n_inter_exact, n_union_exact, CAST(rho AS BIGINT) AS rho,
          |  rho / 8.0 AS est_jaccard,
          |  (rho / 8.0) * (7.0 * 4503599627370496 / kth_hash) AS est_intersection
          |FROM ex, rho, kth""".stripMargin),
      "KMV sketch intersection: Jaccard and overlap of two audiences " +
        "from two bottom-k sketches."),

    QueryDef(
      "q_skew_profile",
      (s, dir) => {
        // Pre-flight SKEW detector — the number an operator owner reads
        // before keying a 100 TB shuffle on a column: for each
        // candidate shuffle key, the per-key count distribution
        // collapsed to (n_keys, max, total) and the skew ratio
        // max·n_keys/total (1000 = perfectly uniform, in per-mille so
        // the threshold never crosses engines as a double). A ratio of
        // 50 000 means the hottest key holds 50x its fair share — that
        // join wants salting or AQE skew handling BEFORE it runs, not
        // after the straggler task spills for an hour. Each profile is
        // two combinable aggregations (per-key count, then a 3-column
        // fold); the report is |keys-profiled| rows.
        def profile(df: org.apache.spark.sql.DataFrame, key: String,
            name: String): org.apache.spark.sql.DataFrame =
          df.groupBy(col(key)).agg(count(lit(1)).as("c"))
            .agg(count(lit(1)).as("n_keys"), max("c").as("max_cnt"),
              sum("c").as("total"))
            .select(lit(name).as("key_col"), col("n_keys"),
              col("max_cnt").cast("long").as("max_cnt"),
              col("total").cast("long").as("total"),
              expr("max_cnt * 1000 * n_keys div total").as("skew_permille"))
        val ev = t(s, dir, "events")
        profile(ev, "user_id", "events.user_id")
          .unionAll(profile(ev, "event_type", "events.event_type"))
          .unionAll(profile(t(s, dir, "documents"), "source", "documents.source"))
          .unionAll(profile(t(s, dir, "lineitem"), "l_orderkey", "lineitem.l_orderkey"))
      },
      Some(
        """SELECT * FROM (
          |SELECT 'events.user_id' AS key_col, COUNT(*) AS n_keys,
          |  CAST(MAX(c) AS BIGINT) AS max_cnt, CAST(SUM(c) AS BIGINT) AS total,
          |  CAST(MAX(c) * 1000 * COUNT(*) // SUM(c) AS BIGINT) AS skew_permille
          |FROM (SELECT COUNT(*) AS c FROM events GROUP BY user_id)
          |UNION ALL
          |SELECT 'events.event_type', COUNT(*),
          |  CAST(MAX(c) AS BIGINT), CAST(SUM(c) AS BIGINT),
          |  CAST(MAX(c) * 1000 * COUNT(*) // SUM(c) AS BIGINT)
          |FROM (SELECT COUNT(*) AS c FROM events GROUP BY event_type)
          |UNION ALL
          |SELECT 'documents.source', COUNT(*),
          |  CAST(MAX(c) AS BIGINT), CAST(SUM(c) AS BIGINT),
          |  CAST(MAX(c) * 1000 * COUNT(*) // SUM(c) AS BIGINT)
          |FROM (SELECT COUNT(*) AS c FROM documents GROUP BY source)
          |UNION ALL
          |SELECT 'lineitem.l_orderkey', COUNT(*),
          |  CAST(MAX(c) AS BIGINT), CAST(SUM(c) AS BIGINT),
          |  CAST(MAX(c) * 1000 * COUNT(*) // SUM(c) AS BIGINT)
          |FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey))""".stripMargin),
      "Shuffle-key skew profiles: per-key count spread collapsed to an " +
        "integer per-mille ratio — the pre-flight salting decision."),

    QueryDef(
      "q_write_plan",
      (s, dir) => {
        // Small-files governor — write PLANNING before a partitioned
        // sink runs: per source, the shard count that lands output
        // files at the 256 KiB target (ceil-div in integers), and the
        // resulting average shard size. At 100 TB the failure mode
        // this prevents is real in both directions: one file per
        // (partition, task) explodes into millions of kilobyte files
        // that crush the namenode and every subsequent listing, while
        // naive global coalesce produces multi-GB unsplittable files.
        // The plan is one combinable aggregation over (source); a
        // writer consumes it as repartitionByRange(n_shards) per
        // source.
        val target = 262144L
        t(s, dir, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
          .select(col("source"), col("n_docs"),
            col("total_chars").cast("long").as("total_chars"),
            expr(s"(total_chars + ${target - 1}) div $target").as("n_shards"))
          .withColumn("avg_shard_chars", expr("total_chars div n_shards"))
      },
      Some(
        """SELECT source, COUNT(*) AS n_docs,
          |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
          |  CAST((SUM(n_chars) + 262143) // 262144 AS BIGINT) AS n_shards,
          |  CAST(SUM(n_chars) // ((SUM(n_chars) + 262143) // 262144)
          |    AS BIGINT) AS avg_shard_chars
          |FROM documents GROUP BY source""".stripMargin),
      "Write planning: per-source shard counts for a 256 KiB file-size " +
        "target — the small-files governor."))
}
