package graft.queries

import org.apache.spark.sql.functions._

/** Engine-level parity queries for the reference's queue operators
  * (SURVEY.md §2F), expressed over the `events` fixture table with the
  * mapping event_type↔queue, event_id↔jid, ts↔enqueued_at, props↔args.
  *
  * Reference semantics being mirrored (scripbox/flume):
  *   - D2 job_counts          lib/flume/queue/manager.ex:69-81
  *   - C1 scheduled promotion lib/flume/queue/manager.ex:207-236
  *   - B2 rate-limit window   lib/flume/redis/bulk_dequeue.ex:196-219
  *   - C2 visibility requeue  lib/flume/queue/processing_scheduler.ex:39-67
  *   - B8 retry-or-dead       lib/flume/queue/manager.ex:121-169
  *   - B9 backoff             lib/flume/queue/backoff.ex:6-16
  *   - B3 batch assembly      lib/flume/pipeline/event/producer_consumer.ex:51-61
  *   - A1 enqueue envelope    lib/flume/event.ex:24-38
  *
  * All scans are single-pass filters/aggregations: at 100 TB these are
  * partition-pruned parquet scans (events would be date-partitioned on
  * ts) followed by a 32-partition-key hash aggregation — no join, no
  * wide shuffle beyond the group-by on a low-cardinality key.
  */
object ParityQueries {
  // Fixed cutoffs (epoch microseconds, UTC) so results are deterministic
  // across runs; the events fixture spans all of Jan 2024 at every SF.
  private val DueUs = 1705276800000000L // 2024-01-15T00:00:00Z
  private val WinEndUs = 1706655600000000L // 2024-01-30T23:00:00Z
  private val WinStartUs = WinEndUs - 3600L * 1000000L // 1h sliding window
  private val VisStartUs = 1706572800000000L // 2024-01-30T00:00:00Z
  private val VisCutUs = 1706658000000000L // 23:40Z = claim horizon - 600s

  import Tables.t

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "p_job_counts",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type").as("queue"))
          .agg(count("*").as("backlog")),
      Some(
        "SELECT event_type AS queue, COUNT(*) AS backlog FROM events GROUP BY event_type"),
      "D2 job_counts: backlog per queue (LLEN analog)."),

    QueryDef(
      "p_oldest_job",
      (s, dir) => {
        val ev = t(s, dir, "events")
        ev.groupBy(col("event_type").as("queue"))
          .agg(
            min(Tables.tsUs(ev)).as("oldest_us"),
            max(Tables.tsUs(ev)).as("newest_us"))
      },
      Some(
        """SELECT event_type AS queue, MIN(epoch_us(ts)) AS oldest_us,
          |MAX(epoch_us(ts)) AS newest_us FROM events GROUP BY event_type""".stripMargin),
      "Oldest/newest job age per queue (head-of-line latency gauge)."),

    QueryDef(
      "p_due_scan",
      (s, dir) => {
        val ev = t(s, dir, "events")
        ev.where(Tables.tsAtMostUs(ev, DueUs)) // pushable: native-type predicate
          .select(
            col("event_id").as("jid"),
            col("event_type").as("queue"),
            Tables.tsUs(ev).as("due_us"))
      },
      Some(
        s"""SELECT event_id AS jid, event_type AS queue, epoch_us(ts) AS due_us
           |FROM events WHERE epoch_us(ts) <= $DueUs""".stripMargin),
      "C1 due-set range scan: ZRANGEBYSCORE scheduled 0 now."),

    QueryDef(
      "p_scheduled_promotion",
      (s, dir) => {
        val ev = t(s, dir, "events")
        ev.where(Tables.tsAtMostUs(ev, DueUs)) // pushable: native-type predicate
          .groupBy(col("event_type").as("queue"))
          .agg(count("*").as("promoted"))
      },
      Some(
        s"""SELECT event_type AS queue, COUNT(*) AS promoted FROM events
           |WHERE epoch_us(ts) <= $DueUs GROUP BY event_type""".stripMargin),
      "C1 promotion grouped by destination queue (redis/job.ex:192-198)."),

    QueryDef(
      "p_window_admission",
      (s, dir) => {
        val ev = t(s, dir, "events")
        ev.where(Tables.tsAtLeastUs(ev, WinStartUs + 1) &&
            Tables.tsAtMostUs(ev, WinEndUs)) // pushable: native-type predicates
          .groupBy(col("event_type").as("queue"))
          .agg(
            count("*").as("in_window"),
            least(count("*"), lit(1000L)).as("admitted"))
      },
      Some(
        s"""SELECT event_type AS queue, COUNT(*) AS in_window,
           |LEAST(COUNT(*), 1000) AS admitted FROM events
           |WHERE epoch_us(ts) > $WinStartUs AND epoch_us(ts) <= $WinEndUs
           |GROUP BY event_type""".stripMargin),
      "B2 sliding-window admission: ZCOUNT limit-set in [now-scale, now]."),

    QueryDef(
      "p_rate_key_window",
      (s, dir) => {
        val ev = t(s, dir, "events")
        ev.where(Tables.tsAtLeastUs(ev, WinStartUs + 1) &&
            Tables.tsAtMostUs(ev, WinEndUs)) // pushable: native-type predicates
          .groupBy(col("user_id"))
          .agg(count("*").as("n_in_window"))
      },
      Some(
        s"""SELECT user_id, COUNT(*) AS n_in_window FROM events
           |WHERE epoch_us(ts) > $WinStartUs AND epoch_us(ts) <= $WinEndUs
           |GROUP BY user_id""".stripMargin),
      "B2 keyed rate limit: shared rate_limit_key window counts."),

    QueryDef(
      "p_visibility_requeue",
      (s, dir) => {
        val ev = t(s, dir, "events")
        ev.where(Tables.tsAtLeastUs(ev, VisStartUs) &&
            Tables.tsBeforeUs(ev, VisCutUs)) // pushable: native-type predicates
          .select(
            col("event_id").as("jid"),
            col("event_type").as("queue"),
            Tables.tsUs(ev).as("claimed_us"))
      },
      Some(
        s"""SELECT event_id AS jid, event_type AS queue, epoch_us(ts) AS claimed_us
           |FROM events WHERE epoch_us(ts) >= $VisStartUs AND epoch_us(ts) < $VisCutUs""".stripMargin),
      "C2 visibility-timeout scan: in-flight jobs claimed > 600s ago."),

    QueryDef(
      "p_queue_head",
      (s, dir) => {
        // two-phase partial top-k: per-partition bounded heaps keep the
        // k earliest rows per queue (map-side, no shuffle of the full
        // table), then an exact window ranks only the ≤ k·partitions
        // survivors — the full-table sort+shuffle never happens
        import s.implicits._
        val k = 10
        val ev = t(s, dir, "events")
        val partial = ev
          // ts normalized to epoch-µs BIGINT up front: the heap and the
          // window then rank identical integers on either fixture schema
          .select(col("event_type"), col("event_id"), Tables.tsUs(ev).as("ts"))
          .as[(String, Long, Long)]
          .mapPartitions { it =>
            val ord = Ordering.Tuple2[Long, Long](Ordering.Long, Ordering.Long)
            val heaps = scala.collection.mutable.Map
              .empty[String, scala.collection.mutable.PriorityQueue[(Long, Long)]]
            it.foreach { case (q, id, ts) =>
              val h = heaps.getOrElseUpdate(q,
                scala.collection.mutable.PriorityQueue.empty[(Long, Long)](ord))
              h.enqueue((ts, id)) // max-heap: evicting the largest keeps the k earliest
              if (h.size > k) { h.dequeue(); () }
            }
            heaps.iterator.flatMap { case (q, h) =>
              h.iterator.map { case (ts, id) => (q, id, ts) }
            }
          }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
          .orderBy(col("ts"), col("event_id"))
        partial.toDF("event_type", "event_id", "ts")
          .withColumn("pos", row_number().over(w))
          .where(col("pos") <= k)
          .select(
            col("event_type").as("queue"),
            col("pos").cast("int").as("pos"),
            col("event_id").as("jid"),
            col("ts").as("enqueued_us"))
      },
      Some(
        """SELECT event_type AS queue, CAST(pos AS INT) AS pos, event_id AS jid,
          |epoch_us(ts) AS enqueued_us FROM (
          |SELECT event_type, event_id, ts,
          |ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS pos
          |FROM events) WHERE pos <= 10""".stripMargin),
      "E1 queue peek: LRANGE 0 n-1 — the next jobs each queue will serve."),

    QueryDef(
      "p_retry_histogram",
      (s, dir) =>
        t(s, dir, "events")
          .select((col("event_id") % 7).cast("int").as("retry_count"))
          .groupBy("retry_count")
          .agg(count("*").as("n")),
      Some(
        """SELECT CAST(event_id % 7 AS INT) AS retry_count, COUNT(*) AS n
          |FROM events GROUP BY CAST(event_id % 7 AS INT)""".stripMargin),
      "B8 retry-count histogram (synthetic retry_count = event_id % 7)."),

    QueryDef(
      "p_dead_letter",
      (s, dir) =>
        t(s, dir, "events")
          .where(col("event_id") % 7 >= 5)
          .select(
            col("event_id").as("jid"),
            col("event_type").as("queue"),
            (col("event_id") % 7).cast("int").as("retry_count")),
      Some(
        """SELECT event_id AS jid, event_type AS queue,
          |CAST(event_id % 7 AS INT) AS retry_count
          |FROM events WHERE event_id % 7 >= 5""".stripMargin),
      "B8 dead-letter selection: retry_count >= max_retries (5)."),

    QueryDef(
      "p_backoff",
      (s, dir) =>
        t(s, dir, "events")
          .select((col("event_id") % 7).cast("int").as("retry_count"))
          .distinct()
          .withColumn(
            "backoff_ms",
            least(round(lit(500) * col("retry_count") * 1.5).cast("bigint"),
              lit(10000L))),
      Some(
        """SELECT DISTINCT CAST(event_id % 7 AS INT) AS retry_count,
          |LEAST(CAST(ROUND(500 * (event_id % 7) * 1.5) AS BIGINT), 10000) AS backoff_ms
          |FROM events""".stripMargin),
      "B9 exponential backoff: min(round(500*count*1.5), 10000)."),

    QueryDef(
      "p_batch_assembly",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type").as("class"))
          .agg(
            count("*").as("n_jobs"),
            ceil(count("*") / 10.0).cast("bigint").as("n_batches")),
      Some(
        """SELECT event_type AS class, COUNT(*) AS n_jobs,
          |CAST(CEIL(COUNT(*) / 10.0) AS BIGINT) AS n_batches
          |FROM events GROUP BY event_type""".stripMargin),
      "B3 group-by-class batching: chunk_every(batch_size=10) counts."),

    QueryDef(
      "p_enqueue_envelope",
      (s, dir) => {
        val ev = t(s, dir, "events")
        ev.select(
            col("event_id").cast("string").as("jid"),
            col("event_type").as("queue"),
            lit("GenericWorker").as("class"),
            lit("perform").as("function"),
            col("props").as("args"),
            lit(0).as("retry_count"),
            Tables.tsUs(ev).as("enqueued_us"))
      },
      Some(
        """SELECT CAST(event_id AS VARCHAR) AS jid, event_type AS queue,
          |'GenericWorker' AS class, 'perform' AS function, props AS args,
          |0 AS retry_count, epoch_us(ts) AS enqueued_us FROM events""".stripMargin),
      "A1 enqueue: serialize the 13-field Event envelope (event.ex:24-38)."),

    QueryDef(
      "p_args_extract",
      (s, dir) =>
        t(s, dir, "events")
          .select(
            col("event_id").as("jid"),
            get_json_object(col("props"), "$.k").cast("int").as("k")),
      Some(
        """SELECT event_id AS jid,
          |CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events""".stripMargin),
      "B5 args passthrough: JSON args decoded only at the worker boundary."))
}
