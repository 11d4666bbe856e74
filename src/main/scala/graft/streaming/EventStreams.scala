package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One user event in the typed streaming path. */
case class UserEvent(user_id: Long, ts_ms: Long)

/** A closed session emitted by the stateful sessionizer. */
case class UserSession(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

/** Per-user open-session state carried between micro-batches. */
case class SessionState(start_ms: Long, last_ms: Long, n_events: Long)

/**
 * Event-stream operators, written so the SAME transformation runs in batch
 * (the driver's correctness gate) and in Structured Streaming (readStream →
 * transform → writeStream; see EventStreamsSpec's MemoryStream run with
 * watermark). `window`/`session_window` are streaming-native aggregations:
 * with a watermark they age state out instead of holding it forever — the
 * 100 TB/day shape. Value sums are computed in DECIMAL so they are
 * independent of partition order (bit-identical across engines and runs).
 */
object EventStreams {

  /** Tumbling 1-hour windowed counts + value sums per event type. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")), 4).cast("double").as("val_sum"))
      .select(unix_millis(col("w.start")).as("ws_ms"), col("event_type"),
        col("n_events"), col("val_sum"))

  val windowedAggSql: String =
    """SELECT epoch_ms(date_trunc('hour', ts)) AS ws_ms, event_type,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS val_sum
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /**
   * SLIDING-window aggregate (r14): one-hour windows sliding every 15
   * minutes — each event lands in exactly 4 overlapping windows, the
   * monitoring/alerting shape tumbling windows can't express (a spike
   * straddling an hour boundary vanishes into two half-counts). Spark's
   * `window(ts, len, slide)` replicates each row into its len/slide
   * windows map-side; state in streaming is bounded by active windows ×
   * groups, same watermark story as the tumbling form. The oracle
   * mirrors the epoch-aligned window arithmetic: window starts are
   * `floor(t / slide) * slide − k·slide` for k in [0, len/slide).
   */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")), 4).cast("double").as("val_sum"))
      .select(unix_millis(col("w.start")).as("ws_ms"), col("event_type"),
        col("n_events"), col("val_sum"))

  val slidingAggSql: String = {
    val s = 15L * 60 * 1000
    s"""WITH e AS (
       |  SELECT event_type, value,
       |         (epoch_ns(ts) // 1000000 // $s) * $s - o.k * $s AS ws_ms
       |  FROM events, (SELECT unnest(range(0, 4)) AS k) o
       |)
       |SELECT ws_ms, event_type,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS val_sum
       |FROM e
       |GROUP BY 1, 2""".stripMargin
  }

  /** Session gap shared by the batch and streaming forms. */
  val sessionGap = "30 minutes"
  val sessionGapMs = 30L * 60 * 1000

  /**
   * Sessionization via `session_window`: events of a user belong to one
   * session while each starts within `gap` (inclusive — Spark merges
   * overlapping [ts, ts+gap] windows, so a spacing of exactly 30 min
   * still merges; only diff > gap splits). The oracle reproduces this
   * with a gaps-and-islands cumulative sum on millisecond timestamps
   * (events.ts is ms-truncated on load, see Tables.events).
   */
  def sessionize(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), sessionGap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_millis(col("w.start")).as("start_ms"),
        col("n_events"))

  val sessionizeSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_ns(ts) // 1000000 AS ms FROM events
       |), flagged AS (
       |  SELECT user_id, ms,
       |         CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
       |                   > $sessionGapMs
       |              OR lag(ms) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
       |              THEN 1 ELSE 0 END AS new_session
       |  FROM e
       |), numbered AS (
       |  SELECT user_id, ms,
       |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ms
       |                                ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM flagged
       |)
       |SELECT user_id, min(ms) AS start_ms, CAST(count(*) AS BIGINT) AS n_events
       |FROM numbered
       |GROUP BY user_id, sid""".stripMargin

  /**
   * Stream-STATIC enrichment join: the event stream joins a slowly-
   * changing dimension (user → market segment) broadcast to every task.
   * Stateless in streaming — a static side needs no watermark and no
   * join state at all (Spark re-plans the broadcast per micro-batch, so
   * dimension updates between batches are picked up) — the canonical
   * lookup-enrichment stage of an event pipeline. Windowed per-segment
   * counts + exact decimal sums aggregate on top; in streaming the
   * watermark ages the window state as usual.
   */
  def enrichedSegmentAgg(events: DataFrame, userDim: DataFrame): DataFrame =
    events
      .join(broadcast(userDim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")), 4).cast("double").as("val_sum"))
      .select(unix_millis(col("w.start")).as("ws_ms"),
        col("c_mktsegment").as("segment"), col("n_events"), col("val_sum"))

  val enrichedSegmentAggSql: String =
    """SELECT epoch_ms(date_trunc('hour', e.ts)) AS ws_ms, c.c_mktsegment AS segment,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(ROUND(sum(CAST(e.value AS DECIMAL(18,6))), 4) AS DOUBLE) AS val_sum
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1, 2""".stripMargin

  /** Interval bound for the view->purchase attribution join. */
  val attributionWindow = "30 minutes"
  val attributionWindowMs = 30L * 60 * 1000

  /**
   * Stream-stream interval join: attribute each purchase to the views of
   * the same user in the preceding [[attributionWindow]]. BOTH sides are
   * watermarked and the join condition bounds event-time distance, so in
   * streaming mode Spark can evict join state once the watermark passes
   * (unbounded stream-stream joins would otherwise keep every row
   * forever). The same code runs in batch (`withWatermark` is a no-op
   * there) — the driver's hash gate verifies the batch form, and
   * EventStreamsSpec asserts the MemoryStream run produces the identical
   * result set.
   */
  def viewPurchaseJoin(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val v = events.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("vts"))
      .withWatermark("vts", watermark)
    val p = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
      .withWatermark("pts", watermark)
    v.join(p, col("user_id") === col("p_user") &&
        col("pts") >= col("vts") &&
        col("pts") <= col("vts") + expr(s"INTERVAL $attributionWindow"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        unix_millis(col("vts")).as("vts_ms"), unix_millis(col("pts")).as("pts_ms"))
  }

  /**
   * LEFT OUTER stream-stream interval join (r14): every view emits —
   * attributed views carry their purchase, unattributed views
   * null-extend. In streaming, Spark holds an unmatched view in state
   * until the watermark proves no in-window purchase can still arrive,
   * THEN emits the null-extended row — the spec drives that emission
   * with a watermark-advancing tail event. State stays bounded by the
   * same watermark + interval condition as the inner form. Output adds
   * an `attributed` flag so the unmatched half is first-class.
   */
  def viewPurchaseJoinOuter(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val v = events.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("vts"))
      .withWatermark("vts", watermark)
    val p = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
      .withWatermark("pts", watermark)
    v.join(p, col("user_id") === col("p_user") &&
        col("pts") >= col("vts") &&
        col("pts") <= col("vts") + expr(s"INTERVAL $attributionWindow"), "left_outer")
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        unix_millis(col("vts")).as("vts_ms"), unix_millis(col("pts")).as("pts_ms"),
        col("purchase_id").isNotNull.as("attributed"))
  }

  val viewPurchaseJoinOuterSql: String =
    s"""SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       |       epoch_ns(v.ts) // 1000000 AS vts_ms, epoch_ns(p.ts) // 1000000 AS pts_ms,
       |       p.event_id IS NOT NULL AS attributed
       |FROM (SELECT * FROM events WHERE event_type = 'view') v
       |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
       |  ON v.user_id = p.user_id
       | AND epoch_ns(p.ts) // 1000000 >= epoch_ns(v.ts) // 1000000
       | AND epoch_ns(p.ts) // 1000000 <= epoch_ns(v.ts) // 1000000 + $attributionWindowMs""".stripMargin

  val viewPurchaseJoinSql: String =
    s"""SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       |       epoch_ns(v.ts) // 1000000 AS vts_ms, epoch_ns(p.ts) // 1000000 AS pts_ms
       |FROM events v JOIN events p
       |  ON v.user_id = p.user_id
       | AND v.event_type = 'view' AND p.event_type = 'purchase'
       | AND epoch_ns(p.ts) // 1000000 >= epoch_ns(v.ts) // 1000000
       | AND epoch_ns(p.ts) // 1000000 <= epoch_ns(v.ts) // 1000000 + $attributionWindowMs""".stripMargin

  /**
   * Streaming sessionization with explicit state
   * (`flatMapGroupsWithState`): per user, extend the open session while
   * events arrive within the gap, emit a closed [[UserSession]] when an
   * event starts a new one. State is one small record per active user —
   * bounded by active users, not event volume. Works on both batch and
   * streaming Datasets; in streaming, pair with a watermark so stale
   * state can be dropped (see EventStreamsSpec).
   */
  def sessionizeStateful(events: Dataset[UserEvent]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[UserEvent], state: GroupState[SessionState]) =>
          val closed = scala.collection.mutable.ArrayBuffer[UserSession]()
          var st = state.getOption
          evs.toSeq.sortBy(_.ts_ms).foreach { ev =>
            st match {
              case Some(s) if ev.ts_ms - s.last_ms <= sessionGapMs =>
                st = Some(SessionState(s.start_ms, ev.ts_ms, s.n_events + 1))
              case Some(s) =>
                closed += UserSession(uid, s.start_ms, s.last_ms, s.n_events)
                st = Some(SessionState(ev.ts_ms, ev.ts_ms, 1))
              case None =>
                st = Some(SessionState(ev.ts_ms, ev.ts_ms, 1))
            }
          }
          st.foreach(state.update)
          closed.iterator
      }
  }

  /**
   * Deterministic at-least-once REDELIVERY plant (r14 wave 4): every
   * fifth event re-arrives 90 seconds later with the same event_id and
   * payload — the duplicate shape an at-least-once source (Kafka
   * producer retry, checkpoint replay) actually produces. The corpus
   * itself is exactly-once, so the dedup entry plants its own
   * duplicates; the oracle replays the identical plant.
   */
  def plantRedelivery(events: DataFrame): DataFrame =
    events.unionByName(
      events.where(col("event_id") % 5 === 0)
        .withColumn("ts", col("ts") + expr("INTERVAL 90 SECONDS")))

  /**
   * Exact event dedup, batch form: one row per event_id, FIRST delivery
   * wins — a map-side-combinable `min(struct(ts, payload…))` aggregate
   * (never a window: a hot key folds in partial aggregates; the closed
   * r13 single-reducer class). This is the batch twin the streaming
   * gate ([[dedupEventsStreaming]]) must agree with — EventStreamsSpec
   * pins row-set equality over a MemoryStream run with cross-batch
   * duplicates.
   */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_id"))
      .agg(min(struct(col("ts"), col("user_id"), col("event_type"),
        col("value"))).as("__first"))
      .select(col("event_id"), col("__first.ts").as("ts"),
        col("__first.user_id").as("user_id"),
        col("__first.event_type").as("event_type"),
        col("__first.value").as("value"))

  /**
   * STREAMING exact-dedup gate: `dropDuplicatesWithinWatermark` keeps
   * the first arrival per event_id and — unlike plain
   * `dropDuplicates`, whose key state lives FOREVER — evicts a key's
   * state once the watermark passes its event time, so state is
   * bounded by (event rate × watermark horizon), not stream lifetime.
   * The contract this buys at 100 TB/day: any redelivery within the
   * watermark window is suppressed exactly; a redelivery arriving
   * LATER than the watermark horizon is the source's exactly-once
   * violation to fix, not the gate's. First-arrival == min-ts when the
   * source delivers in event-time order (the spec's arrangement and
   * the usual at-least-once reality — retries trail originals).
   */
  def dedupEventsStreaming(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** The planted-redelivery dedup as ANSI SQL: duplicates differ only
    * in ts, so first-wins reduces to min(ts) per key. */
  val dedupEventsSql: String =
    """WITH planted AS (
      |  SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000000 AS ts_ms, value
      |  FROM events
      |  UNION ALL
      |  SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000000 + 90000, value
      |  FROM events WHERE event_id % 5 = 0
      |)
      |SELECT event_id, user_id, event_type, min(ts_ms) AS ts_ms, value
      |FROM planted
      |GROUP BY event_id, user_id, event_type, value""".stripMargin

  /** Top-k events by value per (hour window, event type) — batch form
    * (the driver's oracle-checked shape): rank inside each group, keep
    * the k best. Ties break on event_id so the result is deterministic. */
  def topkPerWindow(events: DataFrame, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ws_ms"), col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    events
      .select(unix_millis(date_trunc("hour", col("ts"))).as("ws_ms"),
        col("event_type"), col("event_id"), col("value"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("ws_ms"), col("event_type"), col("event_id"), col("value"),
        col("rk").cast("int").as("rk"))
  }

  def topkPerWindowSql(k: Int = 3): String =
    s"""SELECT ws_ms, event_type, event_id, value, CAST(rk AS INTEGER) AS rk FROM (
       |  SELECT epoch_ms(date_trunc('hour', ts)) AS ws_ms, event_type, event_id, value,
       |         row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
       |                            ORDER BY value DESC, event_id ASC) AS rk
       |  FROM events)
       |WHERE rk <= $k""".stripMargin

  /** One event in the typed streaming top-k path. */
  case class KeyedEvent(ws_ms: Long, event_type: String, event_id: Long, value: Double)

  /** Bounded per-group state: the current top-k (at most k entries). */
  case class TopkState(best: Seq[(Double, Long)])

  /**
   * STREAMING top-k per (window, event type) with BOUNDED state: each
   * group's state is its current top-k only — k small records per active
   * (window, type), never the event backlog. Every micro-batch emits the
   * group's refreshed top-k (Update mode semantics, like a live
   * leaderboard); late events below the current k-th value leave state
   * untouched. At 100 TB/day the state size is (active windows x types
   * x k), independent of event volume.
   */
  def topkStateful(events: Dataset[KeyedEvent], k: Int = 3): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.ws_ms, e.event_type))
      .flatMapGroupsWithState[TopkState, (Long, String, Long, Double, Int)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: (Long, String), evs: Iterator[KeyedEvent], state: GroupState[TopkState]) =>
          // merge incoming events into the bounded best-k (value desc,
          // event_id asc for deterministic ties)
          val merged = (state.getOption.map(_.best).getOrElse(Seq.empty) ++
            evs.map(e => (e.value, e.event_id)))
            .sortBy { case (v, id) => (-v, id) }
            .take(k)
          state.update(TopkState(merged))
          merged.iterator.zipWithIndex.map { case ((v, id), i) =>
            (key._1, key._2, id, v, i + 1)
          }
      }
      .toDF("ws_ms", "event_type", "event_id", "value", "rk")
  }
}
