package graft.streaming

import graft.model.GraftEvent
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over event streams — the Structured Streaming
  * surface a training-data pipeline needs beyond the queue engine:
  * watermarked windowed aggregation and cross-batch stateful dedup.
  *
  * At 100 TB these are the standard scale paths: windowed aggregation
  * state is bounded by the watermark (late data beyond it is dropped,
  * state evicted), and dedup state is per-key (jid), sharded across
  * executors by the groupByKey shuffle, with a processing-time timeout
  * bounding state growth.
  */
object StreamingAnalytics {

  /** Watermarked sliding-window counts/sums per event_type. Input needs
    * (ts: timestamp, event_type: string, value: double); works on both
    * batch and streaming DataFrames. */
  def windowedCounts(
      events: DataFrame,
      window_ : String = "5 minutes",
      slide: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count("*").as("n"), sum(col("value")).as("total"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total"))

  /** Gap-based session windows via Spark's native session_window —
    * the streaming counterpart of the batch lag-sessionization query
    * (q_user_sessions): sessions close `gap` after the last event, and
    * on streams the watermark bounds session state. Input needs
    * (ts: timestamp, user_id). Works on batch and streaming frames. */
  def sessionCounts(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count("*").as("n_events"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Stream-stream interval join: pair each right-stream event with
    * left-stream events of the same user that happened within
    * [0, maxGapSec] BEFORE it (click→purchase attribution shape).
    * Both sides are watermarked, and the time-range predicate is what
    * lets Spark evict join state — an unconstrained stream-stream join
    * would buffer both streams forever. Inputs need
    * (user_id, event_id, ts, event_type). */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      maxGapSec: Long = 1800,
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id").as("l_user"), col("event_id").as("l_id"),
        col("ts").as("l_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("event_id").as("r_id"),
        col("ts").as("r_ts"))
    l.join(r,
      col("l_user") === col("r_user") &&
        col("l_ts") <= col("r_ts") &&
        col("l_ts") >= col("r_ts") - expr(s"INTERVAL $maxGapSec SECONDS"))
      .select(col("l_user").as("user_id"), col("l_id"), col("r_id"),
        col("l_ts"), col("r_ts"))
  }

  /** Stream-static enrichment join + windowed counts: join each stream
    * event against a static dimension table on `key`, then count per
    * (tumbling window, dim attribute). The stream-static join is
    * STATELESS — Spark re-plans the static side per micro-batch and the
    * explicit broadcast ships the dimension to every task, so no join
    * state accumulates and the fact stream never shuffles for the join;
    * the only stateful operator is the watermarked window aggregation,
    * whose state the watermark bounds. This is the standard "enrich a
    * 100 TB/day event stream with a small dimension" shape. Input needs
    * (ts: timestamp, `key`); works on batch and streaming frames (the
    * watermark node is a no-op in batch). */
  def enrichedWindowedCounts(
      events: DataFrame,
      dim: DataFrame,
      key: String,
      attr: String,
      window_ : String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(dim), Seq(key))
      .groupBy(window(col("ts"), window_), col(attr))
      .agg(count("*").as("n"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(attr), col("n"))

  /** Windowed count-min-sketch cells: each event adds 1 to one bucket
    * per hash row (4 rows carved from one md5 at hex offsets 1/9/17/25,
    * the t_cms_heavy convention), aggregated per tumbling window. The
    * streaming-native heavy-hitter substrate: state per window is a
    * CONSTANT 4·width cells no matter how many distinct keys flow
    * through — a per-key windowed count would grow state with key
    * cardinality, which on an open key domain (users, IPs, urls) is
    * exactly what kills a long-running query. Probe any key later with
    * min over its 4 cells (one-sided overestimate). Input needs
    * (ts: timestamp, user_id); batch and streaming. */
  def cmsCells(
      events: DataFrame,
      window_ : String = "1 hour",
      width: Int = 256,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), posexplode(array(Seq(1, 9, 17, 25).map(o =>
        conv(substring(md5(col("user_id").cast("string").cast("binary")), o, 8),
          16, 10).cast("long") % width): _*)).as(Seq("r", "bucket")))
      .groupBy(window(col("ts"), window_), col("r"), col("bucket"))
      .agg(count("*").as("cell"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("r"), col("bucket"), col("cell"))

  /** Windowed HyperLogLog registers: max(rho) per (window, bucket) —
    * streaming DISTINCT counting with CONSTANT state (m registers per
    * window) where windowed countDistinct would buffer every key. The
    * register update is an idempotent, mergeable MAX, so replays and
    * cross-micro-batch arrivals of the same key leave the registers
    * unchanged — estimate with alpha·m²/Σ2^-M over the emitted rows.
    * Hash/rho per the q_hll_distinct convention (guarded Knuth multiply,
    * rho from binary-string length — no float log anywhere). Input
    * needs (ts: timestamp, user_id); batch and streaming. */
  def hllRegisters(
      events: DataFrame,
      window_ : String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("ts"),
        (col("user_id") % 1000003L * 2654435761L % 4294967296L).as("h"))
      .select(col("ts"), (col("h") % 64).as("b"), expr("h DIV 64").as("v"))
      .select(col("ts"), col("b"),
        when(col("v") === 0, 27)
          .otherwise(lit(27) - length(bin(col("v")))).as("rho"))
      .groupBy(window(col("ts"), window_), col("b"))
      .agg(max("rho").as("m"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("b"), col("m"))

  /** Windowed log₂ value histogram: count per (window, bucket) where
    * bucket = bit-length of the value in integer cents (+1 so zero has
    * a bucket) — streaming QUANTILE sketching with CONSTANT state: at
    * most ~40 buckets per window no matter how many events or how wide
    * the value range, where a windowed `percentile` would buffer every
    * value. Counts are additive (map-side-combinable, mergeable across
    * micro-batches and shards); any quantile reads the cumulative
    * histogram afterwards with a ≤2× relative error by construction
    * (log-spaced bin edges). No float log anywhere: the bucket is the
    * bit length of an integer (Spark `length(bin(v))` == DuckDB
    * `length(printf('%b', v))`), so both engines bin identically.
    * Negative values clamp to the zero bucket. Input needs
    * (ts: timestamp, value: double); batch and streaming. */
  def logHistCells(
      events: DataFrame,
      window_ : String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("ts"),
        length(bin(greatest(round(col("value") * 100).cast("long"), lit(0L)) + 1))
          .as("bucket"))
      .groupBy(window(col("ts"), window_), col("bucket"))
      .agg(count("*").as("c"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("bucket"), col("c"))

  /** Cross-micro-batch exact dedup by jid: keeps the first occurrence
    * ever seen, drops replays (at-least-once delivery → effectively-once
    * processing). State is one boolean per jid; pass a processing-time
    * timeout to bound state growth on unbounded streams (a timeout
    * keeps the query ticking between data batches, so leave it None
    * for drain-and-stop usage). */
  def dedupByJid(
      events: Dataset[GraftEvent],
      stateTimeout: Option[String] = None): Dataset[GraftEvent] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (stateTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.jid)
      .flatMapGroupsWithState[Boolean, GraftEvent](OutputMode.Append(), timeoutConf) {
        (_: String, it: Iterator[GraftEvent], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) Iterator.empty // replay — drop
          else {
            state.update(true)
            stateTimeout.foreach(state.setTimeoutDuration)
            it.take(1) // first occurrence wins; duplicates within the batch drop too
          }
      }
  }

  /** Watermark-bounded dedup via Spark's native
    * dropDuplicatesWithinWatermark: replays of a key arriving within
    * the watermark horizon are dropped, and — unlike plain
    * dropDuplicates, whose state grows forever on a stream — key state
    * is EVICTED once the watermark passes it, so a replay far in the
    * future is re-admitted. That trade (bounded state for a bounded
    * dedup horizon) is the production default for at-least-once
    * sources whose replays cluster near the original; the engine's
    * dedupByJid keeps the exact-forever alternative with explicit
    * timeout eviction. Input needs (ts: timestamp, `keys`...). */
  def dedupWithinWatermark(
      events: DataFrame,
      keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming MinHash-LSH near-dedup: cross-batch stateful banding.
    * Input is the exploded band view of each doc's signature — one row
    * per (band, bkey, doc_id). State per LSH bucket is ONE long (the
    * smallest doc_id ever seen in it), sharded across executors by the
    * groupByKey shuffle — at 100 TB that is |buckets| × 8 bytes, never
    * the corpus, and a processing-time timeout can evict cold buckets
    * the same way dedupByJid bounds its state. Each input doc emits
    * (doc_id, the bucket's canonical id); the caller folds the 4 band
    * verdicts per doc with `min` (a doc is a near-dup iff ANY of its
    * buckets already held a smaller doc). Works on batch frames too:
    * each bucket's group then carries all its docs at once and the
    * canonical id is the global bucket min — the exact-batch semantics
    * the oracle checks. */
  def lshBucketCanon(
      bands: Dataset[(Int, String, Long)],
      stateTimeout: Option[String] = None): DataFrame = {
    import bands.sparkSession.implicits._
    val timeoutConf = if (stateTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    bands
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Long, (Long, Long)](OutputMode.Append(), timeoutConf) {
        (_: (Int, String), it: Iterator[(Int, String, Long)],
            state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ids = it.map(_._3).toVector
            val canon = math.min(ids.min, state.getOption.getOrElse(Long.MaxValue))
            state.update(canon)
            stateTimeout.foreach(state.setTimeoutDuration)
            ids.iterator.map(id => (id, canon))
          }
      }
      .toDF("doc_id", "bucket_canon")
  }
}
