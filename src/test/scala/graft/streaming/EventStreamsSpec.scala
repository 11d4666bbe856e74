package graft.streaming

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** One raw event for the MemoryStream run. */
case class RawEvent(ts: Timestamp, event_type: String, value: Double)

/** An identified event for the stream-stream join run. */
case class IdEvent(event_id: Long, user_id: Long, event_type: String, ts: Timestamp)

/** A full-shape event for the streaming dedup gate run. */
case class FullEvent(event_id: Long, user_id: Long, event_type: String,
  ts: Timestamp, value: Double)

class EventStreamsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)
  private val hour = 3600L * 1000

  test("streaming windowed agg with watermark equals the batch result") {
    implicit val ctx = spark.sqlContext
    val events = Seq(
      RawEvent(ts(10 * hour + 100), "view", 1.5),
      RawEvent(ts(10 * hour + 200), "view", 2.5),
      RawEvent(ts(10 * hour + 300), "purchase", 10.0),
      RawEvent(ts(11 * hour + 100), "view", 4.0),
      RawEvent(ts(12 * hour + 100), "purchase", 7.0))

    val input = MemoryStream[RawEvent]
    val q = EventStreams.windowedAgg(input.toDF().withWatermark("ts", "2 hours"))
      .writeStream.format("memory").queryName("win_out").outputMode("complete").start()
    try {
      input.addData(events.take(3))
      q.processAllAvailable()
      input.addData(events.drop(3))
      q.processAllAvailable()
      val streamed = spark.table("win_out").collect().map(_.toSeq).toSet
      val batch = EventStreams.windowedAgg(events.toDF()).collect().map(_.toSeq).toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("sliding windows: every event lands in exactly 4 windows, stream equals batch") {
    implicit val ctx = spark.sqlContext
    val events = Seq(
      RawEvent(ts(10 * hour + 100), "view", 1.5),
      RawEvent(ts(10 * hour + 200), "view", 2.5),
      RawEvent(ts(10 * hour + 59 * 60 * 1000), "purchase", 10.0), // straddles 10h/11h
      RawEvent(ts(11 * hour + 100), "view", 4.0))
    val batch = EventStreams.slidingAgg(events.toDF()).collect()
    // mass conservation x4: each event contributes to exactly len/slide windows
    assert(batch.map(_.getLong(2)).sum == 4L * events.length)
    // the straddling purchase appears in windows on BOTH sides of 11h —
    // the shape tumbling windows halve
    val pWins = batch.filter(_.getString(1) == "purchase").map(_.getLong(0))
    assert(pWins.exists(_ < 11 * hour) && pWins.exists(_ + 3600000 > 11 * hour))
    val input = MemoryStream[RawEvent]
    val q = EventStreams.slidingAgg(input.toDF().withWatermark("ts", "2 hours"))
      .writeStream.format("memory").queryName("slide_out").outputMode("complete").start()
    try {
      input.addData(events.take(2))
      q.processAllAvailable()
      input.addData(events.drop(2))
      q.processAllAvailable()
      val streamed = spark.table("slide_out").collect().map(_.toSeq).toSet
      assert(streamed == batch.map(_.toSeq).toSet && streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup gate suppresses redeliveries within and across batches") {
    implicit val ctx = spark.sqlContext
    val min = 60L * 1000
    val originals = Seq(
      FullEvent(1L, 7L, "view", ts(10 * hour), 1.5),
      FullEvent(2L, 8L, "view", ts(10 * hour + min), 2.5),
      FullEvent(3L, 7L, "purchase", ts(10 * hour + 2 * min), 10.0))
    // redeliveries trail their originals by 90s — event 1 re-arrives in
    // the SAME batch, event 2 in a LATER batch (state must carry over)
    val dup1 = FullEvent(1L, 7L, "view", ts(10 * hour + 90 * 1000), 1.5)
    val dup2 = FullEvent(2L, 8L, "view", ts(10 * hour + min + 90 * 1000), 2.5)
    val input = MemoryStream[FullEvent]
    val q = EventStreams.dedupEventsStreaming(input.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(Seq(originals(0), dup1, originals(1)))
      q.processAllAvailable()
      input.addData(Seq(dup2, originals(2)))
      q.processAllAvailable()
      val streamed = spark.table("dedup_out")
        .select("event_id", "user_id", "event_type", "ts", "value")
        .collect().map(_.toSeq).toSet
      // every event exactly once, each with its FIRST-delivery payload —
      // and row-for-row what the batch twin computes on the same input
      val batch = EventStreams.dedupEvents(
          (originals ++ Seq(dup1, dup2)).toDF())
        .select("event_id", "user_id", "event_type", "ts", "value")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch && streamed.size == 3)
      assert(streamed == originals.map(e =>
        Seq(e.event_id, e.user_id, e.event_type, e.ts, e.value)).toSet)
    } finally q.stop()
  }

  test("dedup of the planted redelivery stream recovers the original events exactly") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts", "value")
    val roundTrip = EventStreams.dedupEvents(EventStreams.plantRedelivery(ev))
      .select("event_id", "user_id", "event_type", "ts", "value")
    assert(roundTrip.exceptAll(ev).count() == 0 && ev.exceptAll(roundTrip).count() == 0)
    // the dedup aggregate must be the partial min(struct), never a window
    val plan = roundTrip.queryExecution.executedPlan.toString()
    assert(!plan.contains("Window"), plan)
  }

  test("parquet file sink with checkpoint: append stream lands exactly once") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val events = Seq(
      IdEvent(1L, 7L, "view", ts(10 * hour)),
      IdEvent(2L, 8L, "view", ts(10 * hour + 100)),
      IdEvent(3L, 7L, "purchase", ts(11 * hour)))
    val input = MemoryStream[IdEvent]
    // append-mode projection to a parquet sink; the checkpoint carries the
    // committed-offset log that makes re-delivery exactly-once per batch
    val q = input.toDF().select(col("event_id"), col("user_id"), col("event_type"))
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      input.addData(events.take(2)); q.processAllAvailable()
      input.addData(events.drop(2)); q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(s"$dir/out")
      .collect().map(r => r.getAs[Long]("event_id")).sorted.toSeq
    assert(landed == Seq(1L, 2L, 3L)) // every event exactly once
  }

  test("stream-static broadcast enrichment join equals the batch result") {
    implicit val ctx = spark.sqlContext
    val dim = Seq((7L, "BUILDING"), (8L, "MACHINERY"), (9L, "FURNITURE"))
      .toDF("c_custkey", "c_mktsegment")
    val events = Seq(
      IdEvent(1L, 7L, "view", ts(10 * hour)),
      IdEvent(2L, 8L, "view", ts(10 * hour + 100)),
      IdEvent(3L, 7L, "purchase", ts(11 * hour)),
      IdEvent(4L, 9L, "view", ts(12 * hour)))
    def withValue(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("value",
        org.apache.spark.sql.functions.col("event_id") * 1.5)
    val input = MemoryStream[IdEvent]
    val q = EventStreams.enrichedSegmentAgg(
        withValue(input.toDF().withWatermark("ts", "2 hours")), dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete").start()
    try {
      input.addData(events.take(2))
      q.processAllAvailable()
      input.addData(events.drop(2))
      q.processAllAvailable()
      val streamed = spark.table("enrich_out").collect().map(_.toSeq).toSet
      val batch = EventStreams.enrichedSegmentAgg(withValue(events.toDF()), dim)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch result") {
    implicit val ctx = spark.sqlContext
    val min = 60L * 1000
    val events = Seq(
      IdEvent(1L, 7L, "view", ts(10 * hour)),
      IdEvent(2L, 7L, "purchase", ts(10 * hour + 10 * min)), // within 30 min of view 1
      IdEvent(3L, 7L, "purchase", ts(11 * hour)),            // outside the window
      IdEvent(4L, 8L, "view", ts(10 * hour)),                // other user: no pair
      IdEvent(5L, 7L, "view", ts(10 * hour + 50 * min)),     // pairs with purchase 3
      IdEvent(6L, 9L, "click", ts(10 * hour)))               // irrelevant type
    val input = MemoryStream[IdEvent]
    val q = EventStreams.viewPurchaseJoin(input.toDF())
      .writeStream.format("memory").queryName("join_out").outputMode("append").start()
    try {
      input.addData(events.take(3))
      q.processAllAvailable()
      input.addData(events.drop(3))
      q.processAllAvailable()
      val streamed = spark.table("join_out").collect().map(_.toSeq).toSet
      val batch = EventStreams.viewPurchaseJoin(events.toDF()).collect().map(_.toSeq).toSet
      assert(streamed == batch && batch ==
        Set(Seq(7L, 1L, 2L, 10 * hour, 10 * hour + 10 * min),
            Seq(7L, 5L, 3L, 10 * hour + 50 * min, 11 * hour)))
    } finally q.stop()
  }

  test("LEFT OUTER interval join: unattributed views null-extend once the watermark passes") {
    implicit val ctx = spark.sqlContext
    val min = 60L * 1000
    val events = Seq(
      IdEvent(1L, 7L, "view", ts(10 * hour)),
      IdEvent(2L, 7L, "purchase", ts(10 * hour + 10 * min)), // attributes view 1
      IdEvent(4L, 8L, "view", ts(10 * hour)))                // never attributed
    val input = MemoryStream[IdEvent]
    val q = EventStreams.viewPurchaseJoinOuter(input.toDF())
      .writeStream.format("memory").queryName("join_outer_out")
      .outputMode("append").start()
    try {
      input.addData(events)
      q.processAllAvailable()
      // the matched row may emit, but view 4's null-extension CANNOT
      // yet: the watermark hasn't proven its window empty
      val early = spark.table("join_outer_out").collect().map(_.toSeq).toSet
      assert(!early.exists(r => r(1) == 4L && r(2) == null),
        "outer row emitted before the watermark closed its window")
      // advance the watermark far past view 4's attribution window — on
      // BOTH sides: the outer-emission watermark is the min across the
      // two streams, so a view-only advance leaves the purchase side's
      // watermark (and therefore view 4's state) frozen
      input.addData(IdEvent(9L, 9L, "view", ts(14 * hour)),
        IdEvent(11L, 9L, "purchase", ts(14 * hour)))
      q.processAllAvailable()
      input.addData(IdEvent(12L, 9L, "view", ts(15 * hour)),
        IdEvent(13L, 9L, "purchase", ts(15 * hour)))
      q.processAllAvailable()
      val streamed = spark.table("join_outer_out").collect().map(_.toSeq).toSet
      val attributed = streamed.filter(_(5) == true)
      val outer = streamed.filter(_(5) == false)
      assert(attributed.exists(r => r(1) == 1L && r(2) == 2L))
      assert(outer.exists(r => r(1) == 4L && r(2) == null && r(4) == null),
        s"missing null-extended view 4 in $streamed")
      // batch parity on the same frame (modulo emission timing)
      val batch = EventStreams.viewPurchaseJoinOuter(
          (events ++ Seq(IdEvent(9L, 9L, "view", ts(14 * hour)),
            IdEvent(11L, 9L, "purchase", ts(14 * hour)),
            IdEvent(12L, 9L, "view", ts(15 * hour)),
            IdEvent(13L, 9L, "purchase", ts(15 * hour)))).toDF())
        .collect().map(_.toSeq).toSet
      assert(streamed == batch, s"stream $streamed\nbatch $batch")
    } finally q.stop()
  }

  test("stateful sessionizer closes a session when the gap is exceeded") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = EventStreams.sessionizeStateful(input.toDS())
      .writeStream.format("memory").queryName("sess_out").outputMode("update").start()
    try {
      input.addData(UserEvent(7L, 1000L), UserEvent(7L, 61000L))
      q.processAllAvailable()
      assert(spark.table("sess_out").isEmpty) // session still open
      input.addData(UserEvent(7L, 61000L + EventStreams.sessionGapMs + 1))
      q.processAllAvailable()
      val closed = spark.table("sess_out").as[UserSession].collect().toSeq
      assert(closed == Seq(UserSession(7L, 1000L, 61000L, 2L)))
    } finally q.stop()
  }

  test("batch session_window merges at exactly the gap, splits beyond it") {
    val df = Seq(
      (1L, ts(0L)), (1L, ts(EventStreams.sessionGapMs)),     // exact gap: merges
      (2L, ts(0L)), (2L, ts(EventStreams.sessionGapMs + 1))) // beyond gap: splits
      .toDF("user_id", "ts")
    val out = EventStreams.sessionize(df).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_ms"), r.getAs[Long]("n_events")))
      .toSet
    assert(out == Set((1L, 0L, 2L), (2L, 0L, 1L), (2L, EventStreams.sessionGapMs + 1, 1L)))
  }

  test("streaming bounded-state top-k converges to the batch top-k") {
    implicit val ctx = spark.sqlContext
    import EventStreams.KeyedEvent
    val k = 2
    val events = Seq(
      KeyedEvent(0L, "view", 1L, 5.0),
      KeyedEvent(0L, "view", 2L, 9.0),
      KeyedEvent(0L, "view", 3L, 7.0),   // evicts id=1 from top-2
      KeyedEvent(0L, "purchase", 4L, 1.0),
      KeyedEvent(hour, "view", 5L, 3.0),
      KeyedEvent(0L, "view", 6L, 9.0))   // tie with id=2: id asc keeps 2 then 6
    val input = MemoryStream[KeyedEvent]
    val q = EventStreams.topkStateful(input.toDS(), k)
      .writeStream.format("memory").queryName("topk_out").outputMode("update").start()
    try {
      input.addData(events.take(4)); q.processAllAvailable()
      input.addData(events.drop(4)); q.processAllAvailable()
    } finally q.stop()
    // LAST refreshed top-k per group (update mode re-emits on change):
    // reconstruct the final leaderboard from each group's latest emission
    val latest = spark.table("topk_out").collect()
      .map(r => (r.getAs[Long]("ws_ms"), r.getAs[String]("event_type"),
        r.getAs[Long]("event_id"), r.getAs[Double]("value"), r.getAs[Int]("rk")))
    // the leaderboard only improves over time, so each slot's final
    // occupant is its max-value emission (ties: lowest id)
    val finalBoard = latest.groupBy(t => (t._1, t._2, t._5))
      .map { case (_, vs) => vs.maxBy(t => (t._4, -t._3)) }.toSet
    val expect = Set(
      (0L, "view", 2L, 9.0, 1), (0L, "view", 6L, 9.0, 2),
      (0L, "purchase", 4L, 1.0, 1),
      (hour, "view", 5L, 3.0, 1))
    assert(finalBoard == expect, finalBoard.toSeq.sortBy(t => (t._1, t._2, t._5)).mkString("\n"))
    // and the state is bounded: each group's emission is at most k rows
    val perGroup = latest.groupBy(t => (t._1, t._2)).map(_._2.map(_._5).max)
    assert(perGroup.forall(_ <= k))
  }
}
