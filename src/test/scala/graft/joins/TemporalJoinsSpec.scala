package graft.joins

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AS-OF and band-join contracts: hand-checkable semantics, the
  * two-level distributed form == the naive one-window / cross-join
  * forms at every block width, and the plans that make them scale
  * (no per-key single-reducer window; no nested-loop join). */
class TemporalJoinsSpec extends SparkSpecBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // probe: purchases; build: quotes per key with payload (px, src)
  private def probe: DataFrame = Seq(
    (1L, "k1", ts("2024-01-01 10:00:00")),
    (2L, "k1", ts("2024-01-01 10:00:05")),
    (3L, "k1", ts("2024-01-03 00:00:01")), // blocks away from any quote
    (4L, "k2", ts("2024-01-01 09:00:00")), // before every k2 quote -> null
    (5L, "k2", ts("2024-01-01 12:00:00")),
    (6L, "k3", ts("2024-01-01 12:00:00")) // key with no quotes at all
  ).toDF("pid", "k", "t")

  private def build: DataFrame = Seq(
    ("k1", ts("2024-01-01 09:59:59"), 100L, "a"),
    ("k1", ts("2024-01-01 10:00:00"), 101L, "b"), // equal-ts: must match pid=1
    ("k1", ts("2024-01-01 10:00:04"), 102L, "c"),
    ("k2", ts("2024-01-01 11:00:00"), 200L, "d"),
    ("k2", ts("2024-01-01 11:30:00"), 201L, "e")
  ).toDF("k", "t", "px", "src")

  /** Naive reference: cross join + max-earlier pick, blind to blocking. */
  private def naiveAsof(p: DataFrame, b: DataFrame): Map[Long, Option[(Long, String)]] = {
    val bs = b.as[(String, java.sql.Timestamp, Long, String)].collect()
    p.as[(Long, String, java.sql.Timestamp)].collect().map { case (pid, k, t) =>
      val cands = bs.filter(r => r._1 == k && !r._2.after(t))
      pid -> (if (cands.isEmpty) None
              else { val m = cands.map(r => (r._2.getTime, r._3, r._4)).max
                     Some((m._2, m._3)) })
    }.toMap
  }

  private def run(p: DataFrame, b: DataFrame, blockMicros: Long): Map[Long, Option[(Long, String)]] =
    TemporalJoins.asofJoin(p, b, Seq("k"), "t", blockMicros)
      .select("pid", "px", "src")
      .as[(Long, Option[Long], Option[String])].collect()
      .map { case (pid, px, src) => pid -> px.map(v => (v, src.get)) }.toMap

  test("asof matches the naive per-key scan at every block width") {
    val want = naiveAsof(probe, build)
    for (w <- Seq(1000000L, 7L * 1000000L, 3600L * 1000000L, TemporalJoins.asofBlockMicros))
      assert(run(probe, build, w) == want, s"block width $w")
  }

  test("asof semantics: >= match, cross-block carry, left null-extension") {
    val got = run(probe, build, 60L * 1000000L) // 1-minute blocks
    assert(got(1L) == Some((101L, "b"))) // equal ts matches (>= rule)
    assert(got(2L) == Some((102L, "c")))
    assert(got(3L) == Some((102L, "c"))) // carried across empty blocks/days
    assert(got(4L) == None) // probe before every build row
    assert(got(5L) == Some((201L, "e")))
    assert(got(6L) == None) // key with no build rows at all
  }

  test("asof build ties on (key, ts) keep the greatest payload tuple") {
    val b2 = build.unionByName(
      Seq(("k1", ts("2024-01-01 10:00:00"), 150L, "z")).toDF("k", "t", "px", "src"))
    val got = run(probe, b2, TemporalJoins.asofBlockMicros)
    assert(got(1L) == Some((150L, "z"))) // (150,z) > (101,b) lexicographically
  }

  test("asof NULL timestamps: probes null-extend, build rows match nothing") {
    // >= never matches a NULL: a NULL-ts probe pairs with no build row,
    // and a NULL-ts build row must not leak to NULL-ts probes through a
    // shared NULL block
    val pN = probe.unionByName(
      Seq((7L, "k1", null.asInstanceOf[java.sql.Timestamp])).toDF("pid", "k", "t"))
    val bN = build.unionByName(
      Seq(("k1", null.asInstanceOf[java.sql.Timestamp], 999L, "n")).toDF("k", "t", "px", "src"))
    val got = run(pN, bN, 60L * 1000000L)
    assert(got(7L) == None) // NULL probe: no match, row kept (left semantics)
    assert(got(1L) == Some((101L, "b"))) // non-null rows unaffected
    assert(got.values.forall(_ != Some((999L, "n")))) // NULL build matches nothing
  }

  test("asof forward direction: nearest at-or-after, across blocks, null past the end") {
    val got = TemporalJoins.asofJoin(probe, build, Seq("k"), "t",
        blockMicros = 60L * 1000000L, direction = "forward")
      .select("pid", "px", "src")
      .as[(Long, Option[Long], Option[String])].collect()
      .map { case (pid, px, src) => pid -> px.map(v => (v, src.get)) }.toMap
    assert(got(1L) == Some((101L, "b"))) // equal ts matches (<= rule)
    assert(got(2L) == None) // 10:00:05 — no k1 build at-or-after
    assert(got(3L) == None) // Jan 3 — past every build row
    assert(got(4L) == Some((200L, "d"))) // 09:00 → next is 11:00, blocks away
    assert(got(5L) == None)
    assert(got(6L) == None)
  }

  test("asof tolerance null-extends distant matches without dropping rows") {
    // backward with a 10-second bound: pid=3 (days past the last build)
    // loses its match but keeps its row; close matches are untouched
    val got = TemporalJoins.asofJoin(probe, build, Seq("k"), "t",
        tolerance = Some(10L * 1000000L))
      .select("pid", "px").as[(Long, Option[Long])].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(got(1L) == Some(101L) && got(2L) == Some(102L))
    assert(got(3L) == None) // match exists but is ~2 days away
    assert(got(5L) == None) // 12:00 vs 11:30 = 30 min > 10 s
    // forward + tolerance compose: pid=4 (09:00) → 11:00 is 2h away
    val fwd = TemporalJoins.asofJoin(probe, build, Seq("k"), "t",
        direction = "forward", tolerance = Some(3600L * 1000000L))
      .select("pid", "px").as[(Long, Option[Long])].collect().toMap
    assert(fwd(4L) == None && fwd(1L) == Some(101L))
  }

  test("asof NULL keys: probes null-extend (never vanish), build rows match nothing") {
    val pN = probe.unionByName(
      Seq((8L, null.asInstanceOf[String], ts("2024-01-01 10:00:00"))).toDF("pid", "k", "t"))
    val bN = build.unionByName(
      Seq((null.asInstanceOf[String], ts("2024-01-01 09:00:00"), 888L, "q"))
        .toDF("k", "t", "px", "src"))
    val got = run(pN, bN, 60L * 1000000L)
    assert(got.contains(8L) && got(8L) == None) // kept, null-extended
    assert(got(1L) == Some((101L, "b")))
    assert(got.values.forall(_ != Some((888L, "q")))) // NULL-key build inert
  }

  test("asof rejects payload/probe column collisions and empty payloads") {
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(probe, build.withColumnRenamed("px", "pid"), Seq("k"), "t")
    }
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(probe, build.select("k", "t"), Seq("k"), "t")
    }
  }

  test("asof plan: every window partitions on (key, block), never key alone") {
    val plan = TemporalJoins.asofJoin(probe, build, Seq("k"), "t")
      .queryExecution.optimizedPlan.toString()
    // the level-1 carry (__loc, over the row-level union frame) must be
    // blocked — partitioned by (key, block), never key alone; the only
    // per-key window (__prevb) runs over the slim per-(key, block) cells
    // frame (reads __lastb), whose size is blocks-per-key, not
    // rows-per-key
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    val rowLevel = winLines.filter(_.contains("__loc"))
    assert(rowLevel.nonEmpty && rowLevel.forall(l =>
      l.contains("windowspecdefinition(k#") &&
        l.substring(l.indexOf("windowspecdefinition")).contains("__blk")),
      s"row-level carry not blocked:\n${winLines.mkString("\n")}")
    val keyAlone = winLines.filterNot(_.contains("__loc"))
    assert(keyAlone.forall(_.contains("__lastb")),
      s"key-alone window over a non-slim frame:\n${keyAlone.mkString("\n")}")
  }

  test("asofStatic (SCD2 array form) equals the two-level asofJoin, nulls included") {
    val pN = probe.unionByName(
      Seq((7L, "k1", null.asInstanceOf[java.sql.Timestamp])).toDF("pid", "k", "t"))
    val bN = build.unionByName(
      Seq(("k1", null.asInstanceOf[java.sql.Timestamp], 999L, "n")).toDF("k", "t", "px", "src"))
    def collect(df: org.apache.spark.sql.DataFrame) = df.select("pid", "px", "src")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    assert(collect(TemporalJoins.asofStatic(pN, bN, Seq("k"), "t")) ==
      collect(TemporalJoins.asofJoin(pN, bN, Seq("k"), "t")))
  }

  test("asofStatic rides a real stream statelessly, row-equal to batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val input = MemoryStream[ProbeRow]
    val out = TemporalJoins.asofStatic(input.toDF(), build, Seq("k"), "t")
    val q = out.writeStream.format("memory").queryName("asof_stream").start()
    try {
      input.addData(probe.as[ProbeRow].collect().take(3).toSeq)
      q.processAllAvailable()
      input.addData(probe.as[ProbeRow].collect().drop(3).toSeq)
      q.processAllAvailable()
      val streamed = spark.table("asof_stream").select("pid", "px", "src")
        .as[(Long, Option[Long], Option[String])].collect().toSet
      val batch = TemporalJoins.asofStatic(probe, build, Seq("k"), "t")
        .select("pid", "px", "src")
        .as[(Long, Option[Long], Option[String])].collect().toSet
      assert(streamed == batch)
      // stateless: a stream-static join keeps NO state store operators
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  // ------------------------------------------------- stream-stream as-of

  private val day = 86400L * 1000000L

  test("asofStreamStream (batch form) equals asofJoin with tolerance = horizon") {
    def collect(df: DataFrame) = df.select("pid", "px", "src")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    for (h <- Seq(3600L * 1000000L, day, 30L * day)) {
      assert(collect(TemporalJoins.asofStreamStream(probe, build, Seq("k"), "t", h)) ==
        collect(TemporalJoins.asofJoin(probe, build, Seq("k"), "t",
          tolerance = Some(h))), s"horizon $h")
    }
  }

  test("asofStreamStream horizon bound: beyond-horizon matches null-extend, rows never drop") {
    val got = TemporalJoins.asofStreamStream(probe, build, Seq("k"), "t", 3600L * 1000000L)
      .select("pid", "px", "src")
      .as[(Long, Option[Long], Option[String])].collect()
      .map { case (pid, px, src) => pid -> px.map(v => (v, src.get)) }.toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L)) // every probe row survives
    assert(got(1L) == Some((101L, "b"))) // >= rule at equal ts
    assert(got(3L) == None) // build exists but > 1h back -> null-extend
    assert(got(5L) == Some((201L, "e"))) // 30 min back, inside horizon
  }

  test("asofStreamStream build ties on (key, ts) keep the greatest payload tuple") {
    val b2 = build.unionByName(
      Seq(("k1", ts("2024-01-01 10:00:00"), 150L, "z")).toDF("k", "t", "px", "src"))
    val got = TemporalJoins.asofStreamStream(probe, b2, Seq("k"), "t", day)
      .where($"pid" === 1L).select("px", "src")
      .as[(Option[Long], Option[String])].collect().toSeq
    assert(got == Seq((Some(150L), Some("z"))))
  }

  test("asofNearest picks the closer side, ties backward, tolerance cuts both ways") {
    // probes per case: closer-backward, closer-forward, exact tie,
    // backward-only, forward-only, beyond tolerance both sides, no build
    val p = Seq(
      (1L, "k1", ts("2024-01-01 10:00:10")), // bwd 10s vs fwd 50s -> bwd
      (2L, "k1", ts("2024-01-01 10:00:55")), // bwd 55s vs fwd 5s -> fwd
      (3L, "k1", ts("2024-01-01 10:00:30")), // 30s both -> tie -> bwd
      (4L, "k1", ts("2024-01-01 09:59:50")), // before all -> fwd only
      (5L, "k1", ts("2024-01-01 10:01:30")), // after all -> bwd only
      (6L, "k1", ts("2024-01-05 00:00:00")), // bwd exists but > tol -> null
      (7L, "k9", ts("2024-01-01 10:00:00")) // key with no build rows
    ).toDF("pid", "k", "t")
    def b(pfx: String) = Seq(
      ("k1", ts("2024-01-01 10:00:00"), 100L),
      ("k1", ts("2024-01-01 10:01:00"), 200L)
    ).toDF("k", "t", "x")
      .select(col("k"), col("t"), unix_micros(col("t")).as(s"${pfx}mus"),
        col("x").as(s"${pfx}x"))
    val out = TemporalJoins.asofNearest(p, b("b"), b("f"), Seq("k"), "t",
        "bmus", "fmus", tolerance = Some(3600L * 1000000L))
      .select(col("pid"),
        when(col("__useB"), col("bx")).otherwise(col("fx")).as("nx"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(
      1L -> Some(100L), 2L -> Some(200L), 3L -> Some(100L),
      4L -> Some(100L), 5L -> Some(200L), 6L -> None, 7L -> None))
  }

  test("asofStreamStream runs with BOTH sides live, stream == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val pIn = MemoryStream[ProbeRow]
    val bIn = MemoryStream[BuildRow]
    // the arrival order below is out-of-order by ~2 days across batches
    // (pid 3 lands before pids 4-6 with older timestamps), so the
    // watermark delay must span that disorder or the old rows are
    // DROPPED AS LATE — which is correct streaming semantics, and why
    // watermarkDelay is a caller knob
    val out = TemporalJoins.asofStreamStream(pIn.toDF(), bIn.toDF(), Seq("k"), "t", day,
      watermarkDelay = "30 days")
    val q = out.writeStream.format("memory").queryName("asof_ss").outputMode("append").start()
    try {
      val ps = probe.as[ProbeRow].collect().toSeq
      val bs = build.as[BuildRow].collect().toSeq
      // interleaved arrival across micro-batches, then a far-future flush
      // row on each side so the watermark passes every real event
      pIn.addData(ps.take(3)); bIn.addData(bs.take(2))
      q.processAllAvailable()
      pIn.addData(ps.drop(3)); bIn.addData(bs.drop(2))
      q.processAllAvailable()
      val flushT = ts("2024-03-01 00:00:00")
      pIn.addData(Seq(ProbeRow(999L, "kf", flushT)))
      bIn.addData(Seq(BuildRow("kf", flushT, 0L, "f")))
      q.processAllAvailable()
      // one more batch so the advanced watermark takes effect downstream
      pIn.addData(Seq(ProbeRow(998L, "kf", flushT)))
      bIn.addData(Seq(BuildRow("kf", flushT, 0L, "f")))
      q.processAllAvailable()
      val streamed = spark.table("asof_ss").where($"pid" < 100)
        .select("pid", "px", "src")
        .as[(Long, Option[Long], Option[String])].collect().toSet
      val batch = TemporalJoins.asofStreamStream(probe, build, Seq("k"), "t", day)
        .select("pid", "px", "src")
        .as[(Long, Option[Long], Option[String])].collect().toSet
      assert(streamed == batch)
      // genuinely stateful: the join and the latest-pick aggregate both
      // hold watermark-bounded state
      assert(q.lastProgress.stateOperators.length >= 2)
    } finally q.stop()
  }

  test("asofStreamStream forward direction equals the forward asofJoin with tolerance = horizon") {
    def collect(df: DataFrame) = df.select("pid", "px", "src")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    for (h <- Seq(3600L * 1000000L, day, 30L * day)) {
      assert(collect(TemporalJoins.asofStreamStream(probe, build, Seq("k"), "t", h,
          direction = "forward")) ==
        collect(TemporalJoins.asofJoin(probe, build, Seq("k"), "t",
          direction = "forward", tolerance = Some(h))), s"horizon $h")
    }
  }

  test("asofStreamStream nearest: closer side wins, ties backward, horizon cuts both ways") {
    val got = TemporalJoins.asofStreamStream(probe, build, Seq("k"), "t",
        3600L * 1000000L, direction = "nearest")
      .select("pid", "px", "src")
      .as[(Long, Option[Long], Option[String])].collect()
      .map { case (pid, px, src) => pid -> px.map(v => (v, src.get)) }.toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(got(1L) == Some((101L, "b"))) // equal ts: distance 0 beats everything
    assert(got(2L) == Some((102L, "c"))) // bwd 1s, nothing forward in range
    assert(got(3L) == None)              // > 1h both ways
    assert(got(4L) == None)              // first k2 build is 2h forward, > horizon
    assert(got(5L) == Some((201L, "e"))) // bwd 30min beats nothing forward
    assert(got(6L) == None)              // key with no build rows
    // exact two-sided tie prefers the backward row
    val p0 = Seq((50L, "k1", ts("2024-01-01 10:30:00"))).toDF("pid", "k", "t")
    val b0 = Seq(
      ("k1", ts("2024-01-01 10:00:00"), 1L, "bwd"),
      ("k1", ts("2024-01-01 11:00:00"), 2L, "fwd")
    ).toDF("k", "t", "px", "src")
    val tie = TemporalJoins.asofStreamStream(p0, b0, Seq("k"), "t", day,
        direction = "nearest")
      .select("px", "src").as[(Option[Long], Option[String])].collect().toSeq
    assert(tie == Seq((Some(1L), Some("bwd"))))
  }

  test("asofStreamStream nearest runs with BOTH sides live, stream == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val pIn = MemoryStream[ProbeRow]
    val bIn = MemoryStream[BuildRow]
    val out = TemporalJoins.asofStreamStream(pIn.toDF(), bIn.toDF(), Seq("k"), "t", day,
      watermarkDelay = "30 days", direction = "nearest")
    val q = out.writeStream.format("memory").queryName("asof_ss_near")
      .outputMode("append").start()
    try {
      val ps = probe.as[ProbeRow].collect().toSeq
      val bs = build.as[BuildRow].collect().toSeq
      pIn.addData(ps.take(3)); bIn.addData(bs.take(2))
      q.processAllAvailable()
      pIn.addData(ps.drop(3)); bIn.addData(bs.drop(2))
      q.processAllAvailable()
      val flushT = ts("2024-03-01 00:00:00")
      for (_ <- 1 to 2) {
        pIn.addData(Seq(ProbeRow(999L, "kf", flushT)))
        bIn.addData(Seq(BuildRow("kf", flushT, 0L, "f")))
        q.processAllAvailable()
      }
      val streamed = spark.table("asof_ss_near").where($"pid" < 100)
        .select("pid", "px", "src")
        .as[(Long, Option[Long], Option[String])].collect().toSet
      val batch = TemporalJoins.asofStreamStream(probe, build, Seq("k"), "t", day,
          direction = "nearest")
        .select("pid", "px", "src")
        .as[(Long, Option[Long], Option[String])].collect().toSet
      assert(streamed == batch)
      assert(q.lastProgress.stateOperators.length >= 2)
    } finally q.stop()
  }

  // ------------------------------------------------------------- band join

  private def lefts: DataFrame = Seq(
    (10L, ts("2024-01-01 10:00:00")),
    (11L, ts("2024-01-01 11:00:00")),
    (12L, ts("2024-01-02 00:00:30"))
  ).toDF("lid", "lt")

  private def rights: DataFrame = Seq(
    (20L, ts("2024-01-01 09:00:00")), // exactly band before lid=10 (inclusive)
    (21L, ts("2024-01-01 08:59:59")), // one second too early
    (22L, ts("2024-01-01 10:00:00")), // equal ts (inclusive)
    (23L, ts("2024-01-01 10:00:01")), // after lid=10, within band of lid=11
    (24L, ts("2024-01-01 23:30:00"))  // crosses midnight into lid=12's band
  ).toDF("rid", "rt")

  private val hour = 3600L * 1000000L

  test("band join matches the cross-join filter exactly, bounds inclusive") {
    val got = TemporalJoins.bandJoin(lefts, rights, "lt", "rt", hour)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = lefts.crossJoin(rights)
      .where(col("rt") >= col("lt") - expr("INTERVAL 1 HOUR") && col("rt") <= col("lt"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(got == Set((10L, 20L), (10L, 22L), (11L, 23L), (11L, 22L), (12L, 24L)))
  }

  test("band join emits each matching pair exactly once (no block-overlap dupes)") {
    val got = TemporalJoins.bandJoin(lefts, rights, "lt", "rt", hour)
      .select("lid", "rid").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size)
  }

  test("band join plan is an equi-join, never a nested loop or cartesian") {
    val plan = TemporalJoins.bandJoin(lefts, rights, "lt", "rt", hour)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the block id is the join key
    assert(plan.contains("__blk"))
  }

  // -------------------------------------------------------- interval join

  private def ivs(rows: Seq[(Long, Long, Long)], id: String, a: String, b: String) = {
    import spark.implicits._
    rows.toDF(id, a, b)
  }

  test("interval join matches the cross-join filter, endpoints inclusive, exactly once") {
    val M = 1000000L
    val L = ivs(Seq((1L, 0L * M, 100L * M), (2L, 500L * M, 500L * M), // point interval
      (3L, 7000L * M, 7200L * M), (4L, 10L * M, 5L * M)), // empty: e < s
      "lid", "ls", "le")
    val R = ivs(Seq((10L, 100L * M, 200L * M), // touches lid=1 at the endpoint
      (11L, 400L * M, 600L * M), (12L, 7199L * M, 9000L * M),
      (13L, 0L * M, 20000L * M)), // spans everything
      "rid", "rs", "re")
    val got = TemporalJoins.intervalJoin(L, R, "ls", "le", "rs", "re", 60L * M)
      .select("lid", "rid").as[(Long, Long)].collect().toList
    assert(got.length == got.toSet.size, "pair emitted more than once")
    val want = L.where(col("le") >= col("ls")).crossJoin(R)
      .where(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got.toSet == want)
    assert(got.toSet == Set((1L, 10L), (1L, 13L), (2L, 11L), (2L, 13L),
      (3L, 12L), (3L, 13L))) // lid=4 empty -> nothing
  }

  test("interval join plan is an equi-join on the block id") {
    val M = 1000000L
    val L = ivs(Seq((1L, 0L, 100L * M)), "lid", "ls", "le")
    val R = ivs(Seq((10L, 50L * M, 60L * M)), "rid", "rs", "re")
    val plan = TemporalJoins.intervalJoin(L, R, "ls", "le", "rs", "re", 60L * M)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("__blk"))
  }

  test("band join rejects overlapping column names") {
    intercept[IllegalArgumentException] {
      TemporalJoins.bandJoin(lefts, lefts, "lt", "lt", hour)
    }
  }
}

/** One probe row for the MemoryStream run. */
case class ProbeRow(pid: Long, k: String, t: java.sql.Timestamp)

/** One build row for the stream-stream as-of MemoryStream run. */
case class BuildRow(k: String, t: java.sql.Timestamp, px: Long, src: String)
