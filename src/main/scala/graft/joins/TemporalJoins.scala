package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators Spark's optimizer has no native plan for:
 *
 *  - [[asofJoin]] — the kdb/pandas/DuckDB AS-OF join: each probe row
 *    picks the single build row with the greatest timestamp at-or-before
 *    its own, per key. Spark would need a per-key sort + merge the
 *    planner doesn't know; the naive window form puts each key's entire
 *    history in one reducer partition (the single-reducer class this
 *    repo closed in r13).
 *  - [[bandJoin]] — a pure range-band join with NO equi key: Spark plans
 *    `a.ts BETWEEN b.ts - band AND b.ts` as BroadcastNestedLoopJoin /
 *    CartesianProduct (O(|A|·|B|) pair evaluations). Bucketing time into
 *    band-width blocks turns it into an ordinary shuffled equi-join plus
 *    an exact residual filter.
 *
 * Both express the physical trick declaratively (DataFrame ops only) so
 * Catalyst/AQE still own partitioning, skew splitting, and join
 * strategy selection.
 */
object TemporalJoins {

  /** Exact floor block id of a micros column for width `w` (plain `div`
    * truncates toward zero, which anti-orders pre-epoch timestamps). All
    * arithmetic stays in longs — no double hop, so the id is exact for
    * the full timestamp range, not just below 2^53 micros. */
  private def blockOf(musCol: String, w: Long): Column =
    expr(s"($musCol - pmod($musCol, ${w}L)) div ${w}L")

  /** Default as-of block width: one day of micros. The level-1 window
    * partition then holds (key rate × 1 day) rows — the same
    * rate-times-horizon bound Structured Streaming state carries — and
    * the level-2 frame one row per (key, active day). */
  val asofBlockMicros: Long = 86400L * 1000000L

  /**
   * AS-OF join, DuckDB `ASOF JOIN` / pandas `merge_asof` semantics: for
   * every probe row, attach the payload of the NEAREST build row within
   * the same `keys` — `direction = "backward"` (default) takes the
   * greatest build ts ≤ the probe's (`>=` match), `"forward"` the
   * smallest build ts ≥ it (`<=` match); `tolerance` (micros) null-
   * extends matches farther than the bound instead of dropping the row
   * (merge_asof's tolerance, absent from DuckDB's ASOF — its oracle is
   * a CASE over the matched distance). Probes with no qualifying build
   * row null-extend (LEFT semantics). `build` must carry exactly
   * `keys ++ tsCol ++ payload`; payload column names must not collide
   * with probe columns (expose the matched build timestamp by
   * projecting it under a second name before the call). Build rows
   * sharing (keys, ts) collapse to the lexicographically greatest
   * payload tuple — a deterministic, engine-portable tie rule.
   * Internally forward is the backward machinery on a NEGATED time
   * axis — one code path, both directions.
   *
   * Scale shape — a DISTRIBUTED two-level carry-forward, not one
   * `PARTITION BY key` window (a hot key's entire history on one
   * reducer):
   *  level 1: probe and build rows union-tag into one frame, blocked by
   *           `ts div blockMicros`; within each bounded (key, block)
   *           cell a window ordered by (ts, tag) carries the last
   *           non-null build payload forward — build tag 0 sorts before
   *           probe tag 1 at equal ts, which IS the `>=` rule.
   *  level 2: the per-(key, block) LATEST build payload is a slim
   *           aggregate (one row per active cell); a per-key window
   *           over THAT frame — bounded by blocks-per-key, not
   *           rows-per-key — carries it across blocks, and an ordinary
   *           equi-join (AQE-sized, deliberately not forced broadcast:
   *           the frame is (key × active-block)-cardinality) hands each
   *           cell its previous-blocks carry.
   * A probe's match is then coalesce(within-block carry, prior-block
   * carry) — bit-identical to the sequential per-key scan because
   * blocks respect ts order.
   */
  def asofJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
               tsCol: String, blockMicros: Long = asofBlockMicros,
               direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame = {
    require(blockMicros >= 1, s"positive block width required, got $blockMicros")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    tolerance.foreach(t => require(t >= 0, s"negative tolerance: $t"))
    // the whole pipeline runs on a signed axis: backward keeps real
    // micros, forward negates them, turning "greatest ts <= probe" into
    // the same scan
    val sign = if (direction == "backward") 1L else -1L
    val payCols = build.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    require(payCols.nonEmpty, "build side carries no payload columns")
    val collide = payCols.toSet.intersect(probe.columns.toSet)
    require(collide.isEmpty, s"payload columns collide with probe columns: $collide")
    // NULL build rows: `=`/`>=` never match a NULL, so a build row with
    // a NULL timestamp OR a NULL key can match nothing and is dropped
    // here — otherwise it would pair with same-NULL probes through the
    // window partition (which, unlike an equi-join, groups NULLs as
    // equal), diverging from the comparison semantics. NULL probes
    // null-extend instead (see the sentinel block and left join below).
    // one deterministic build row per (keys, ts): greatest payload tuple
    val build1 = build
      .where((tsCol +: keys).map(col(_).isNotNull).reduce(_ && _))
      .groupBy((keys :+ tsCol).map(col): _*)
      .agg(max(struct(payCols.map(col): _*)).as("__pay"))
    val payT = build1.schema("__pay").dataType
    val probeT = probe.schema
    val keyCols = keys.map(col)
    val probeTagged = probe.select(
      keyCols ++ Seq(col(tsCol).as("__ts"), lit(1).as("__tag"),
        struct(probe.columns.map(col): _*).as("__pr"),
        lit(null).cast(payT).as("__pay")): _*)
    val buildTagged = build1.select(
      keyCols ++ Seq(col(tsCol).as("__ts"), lit(0).as("__tag"),
        lit(null).cast(org.apache.spark.sql.types.StructType(probeT.fields)).as("__pr"),
        col("__pay")): _*)
    // the union frame feeds BOTH the level-1 window and the slim cells
    // aggregate — independent subtrees whose exchanges differ, so
    // ReuseExchange cannot dedupe them; a tracked persist keeps the two
    // input scans + the build1 aggregation from running twice (callers
    // release via CacheRegistry.unpersistAll, the repo-wide contract)
    val tagged = graft.CacheRegistry.persistTracked(
      probeTagged.unionByName(buildTagged)
        .withColumn("__mus", lit(sign) * unix_micros(col("__ts")))
        // NULL-ts probes take a sentinel block that sorts before every
        // real one and carries no build mass (NULL build rows are
        // filtered above) — a NULL block id would silently DROP the
        // probe at the cells join (NULL keys never equi-match)
        .withColumn("__blk",
          coalesce(blockOf("__mus", blockMicros), lit(Long.MinValue))))
    // the carried unit is (matched build axis-time, payload): tolerance
    // needs the distance, and a struct of a NON-NULL probe mus would
    // defeat ignoreNulls, hence the when(tag=0) wrap
    val buildUnit = when(col("__tag") === 0,
      struct(col("__mus").as("__bm"), col("__pay").as("__bp")))
    // level 1: carry within the bounded (keys, block) cell
    val w1 = Window.partitionBy((keys :+ "__blk").map(col): _*)
      .orderBy(col("__mus"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = tagged.withColumn("__loc", last(buildUnit, ignoreNulls = true).over(w1))
    // level 2: latest build unit per active cell, carried across
    // blocks on the slim frame only
    val w2 = Window.partitionBy(keyCols: _*).orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cells = tagged.groupBy((keys :+ "__blk").map(col): _*)
      .agg(max(buildUnit).as("__lastb"))
      .withColumn("__prevb", last(col("__lastb"), ignoreNulls = true).over(w2))
      .select((keys :+ "__blk").map(col) :+ col("__prevb").as("__prev"): _*)
    // LEFT join: a NULL-key probe has no cells row (NULL keys never
    // equi-match) but must still null-extend, not vanish — the LEFT
    // semantics DuckDB's ASOF LEFT JOIN gives the same row
    val chosen = coalesce(col("__loc"), col("__prev"))
    // distance on the signed axis is |real difference| and ≥ 0 by the
    // match rule; beyond-tolerance matches null-extend (merge_asof), the
    // row itself is never dropped
    val matched = tolerance match {
      case Some(t) => when(chosen.isNotNull &&
        col("__mus") - chosen.getField("__bm") <= t, chosen)
      case None => chosen
    }
    local.join(cells, keys :+ "__blk", "left")
      .where(col("__tag") === 1)
      .withColumn("__m", matched.getField("__bp"))
      .select(probe.columns.map(c => col(s"__pr.`$c`").as(c)) ++
        payCols.map(c => col(s"__m.`$c`").as(c)): _*)
  }

  /**
   * STATIC-DIMENSION as-of lookup — the SCD Type-2 point-in-time join,
   * and the STREAMING form of [[asofJoin]]: the build side compacts to
   * ONE row per key holding its sorted (ts, payload) history, and each
   * probe row picks the last history entry at-or-before its timestamp
   * with pure array projections. No window, no watermark, no state
   * store — on a stream this is a stateless stream-static join, so it
   * rides `readStream` unchanged and each micro-batch sees the
   * dimension as-of join time.
   *
   * Contract vs [[asofJoin]]: the build side must be DIMENSION-shaped —
   * per-key history small enough to hold in one row (version chains of
   * a dimension table; thousands, not billions). Event-scale build
   * sides take the two-level [[asofJoin]]; this form trades that
   * generality for statelessness. Same matching semantics: `>=` rule,
   * (key, ts) ties collapse to the greatest payload tuple, NULL-ts/key
   * build rows match nothing, probes without a match null-extend.
   */
  def asofStatic(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 tsCol: String): DataFrame = {
    val payCols = build.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    require(payCols.nonEmpty, "build side carries no payload columns")
    val collide = payCols.toSet.intersect(probe.columns.toSet)
    require(collide.isEmpty, s"payload columns collide with probe columns: $collide")
    val hist = build
      .where((tsCol +: keys).map(col(_).isNotNull).reduce(_ && _))
      .groupBy((keys :+ tsCol).map(col): _*)
      .agg(max(struct(payCols.map(col): _*)).as("__pay"))
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(unix_micros(col(tsCol)).as("__bm"),
        col("__pay").as("__bp")))).as("__hist"))
    val probeM = probe.withColumn("__pm", unix_micros(col(tsCol)))
    // guarded positive index: ANSI mode (Spark 4 default) makes
    // element_at THROW on an empty array rather than return NULL
    val eligible = filter(col("__hist"), h => h.getField("__bm") <= col("__pm"))
    val matched = when(size(eligible) > 0, element_at(eligible, size(eligible)))
    probeM.join(broadcast(hist), keys, "left")
      .withColumn("__m", matched.getField("__bp"))
      .select(probe.columns.map(col) ++ payCols.map(c => col(s"__m.`$c`").as(c)): _*)
  }

  /**
   * NEAREST as-of (r15) — pandas `merge_asof(direction='nearest')`,
   * completing the direction family (backward / forward / nearest):
   * each probe picks whichever of its backward and forward matches is
   * CLOSER in time, ties to the backward one (the at-or-before match —
   * deterministic and the common convention); `tolerance` bounds both
   * directions. Pure composition of two [[asofJoin]] passes — the
   * second pass takes the first's output as its probe (payload names
   * must be pairwise disjoint), so the scale story is exactly 12d's
   * twice. `bTsCol`/`fTsCol` name the matched build timestamps inside
   * the two payloads (micros-long columns the caller projects in, the
   * documented expose-the-matched-ts trick) — the distance computation
   * needs them; both are retained in the output for the caller's own
   * projection.
   *
   * Returns the probe columns, both direction payloads, and `__useB`
   * (true where the backward match wins) — callers project the winning
   * payload with `when(col("__useB"), b).otherwise(f)`.
   */
  def asofNearest(probe: DataFrame, buildB: DataFrame, buildF: DataFrame,
                  keys: Seq[String], tsCol: String, bTsCol: String, fTsCol: String,
                  blockMicros: Long = asofBlockMicros,
                  tolerance: Option[Long] = None): DataFrame = {
    val bwd = asofJoin(probe, buildB, keys, tsCol, blockMicros, "backward", tolerance)
    val both = asofJoin(bwd, buildF, keys, tsCol, blockMicros, "forward", tolerance)
    val pm = unix_micros(col(tsCol))
    val bd = pm - col(bTsCol)   // >= 0 when matched
    val fd = col(fTsCol) - pm   // >= 0 when matched
    both.withColumn("__useB",
      col(bTsCol).isNotNull && (col(fTsCol).isNull || bd <= fd))
  }

  /**
   * STREAM-STREAM AS-OF join (r15) — BOTH sides live: each probe row
   * picks the greatest build ts in `[probe.ts - horizon, probe.ts]` per
   * key, null-extending when no build row falls inside the horizon.
   * The horizon is load-bearing twice over: it is merge_asof's
   * `tolerance` semantics AND the state bound — an unbounded-lookback
   * as-of is impossible when both sides stream (the join state could
   * never be reclaimed), so the bounded form IS the streaming operator.
   *
   * Declarative shape, identical on batch and streaming frames:
   *   1. watermark both sides (streaming only);
   *   2. stream-stream LEFT OUTER equi-join on the keys with the
   *      two-sided time-range condition — exactly the shape Spark
   *      reclaims join state from (watermark + time bound);
   *   3. per probe row, one max(struct(build ts, payload)) aggregate
   *      picks the latest match ((key, ts) build ties collapse to the
   *      greatest payload tuple, [[asofJoin]]'s rule); the group key
   *      keeps the probe's watermarked event-time column — the one
   *      event-time attribute that keeps the chained stateful operators
   *      in Spark's supported join→event-time-aggregation class.
   *
   * DIRECTIONS (r16, completing the temporal matrix on live streams):
   * `backward` (default) picks the greatest build ts in
   * `[probe.ts - horizon, probe.ts]`; `forward` the smallest in
   * `[probe.ts, probe.ts + horizon]`; `nearest` whichever build row in
   * `[probe.ts - horizon, probe.ts + horizon]` minimizes |Δt|, ties to
   * the backward side ([[asofNearest]]'s convention). All three are the
   * SAME dataflow — only the range condition and the max-struct's sort
   * prefix change (negated ts picks the smallest; negated distance then
   * a backward flag picks the closest-then-backward) — so each keeps
   * the watermark+two-sided-time-bound shape Spark reclaims
   * stream-stream join state from.
   *
   * Contracts: probe rows must be unique (they are the group identity —
   * real event streams carry an event id); build must be exactly
   * `keys ++ tsCol ++ payload` with payload names disjoint from probe's;
   * NULL-ts/key build rows match nothing (dropped), NULL-ts probe rows
   * null-extend on batch but are dropped by watermarking on a real
   * stream (the streaming-vs-batch delta inherent to event-time state).
   * At equal |Δt| (same ts, or nearest's two-sided tie) the collapse
   * order is: backward side first, then the greatest payload tuple —
   * [[asofJoin]]'s deterministic engine-portable rule.
   */
  def asofStreamStream(probe: DataFrame, build: DataFrame, keys: Seq[String],
                       tsCol: String, horizonMicros: Long,
                       watermarkDelay: String = "10 seconds",
                       direction: String = "backward"): DataFrame = {
    require(horizonMicros >= 0, s"negative horizon: $horizonMicros")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val payCols = build.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    require(payCols.nonEmpty, "build side carries no payload columns")
    val collide = payCols.toSet.intersect(probe.columns.toSet)
    require(collide.isEmpty, s"payload columns collide with probe columns: $collide")
    def wm(df: DataFrame): DataFrame =
      if (df.isStreaming) df.withWatermark(tsCol, watermarkDelay) else df
    val b = wm(build)
      .where((tsCol +: keys).map(col(_).isNotNull).reduce(_ && _))
      .select(keys.map(c => col(c).as(s"__bk_$c")) :+
        col(tsCol).as("__bts") :+
        struct(payCols.map(col): _*).as("__bp"): _*)
    val p = wm(probe)
    val horizon = expr(s"INTERVAL $horizonMicros MICROSECOND")
    val cond = keys.map(c => p(c) === b(s"__bk_$c")).reduce(_ && _) &&
      (direction match {
        case "backward" =>
          b("__bts") <= p(tsCol) && b("__bts") >= p(tsCol) - horizon
        case "forward" =>
          b("__bts") >= p(tsCol) && b("__bts") <= p(tsCol) + horizon
        case _ =>
          b("__bts") >= p(tsCol) - horizon && b("__bts") <= p(tsCol) + horizon
      })
    val bm = unix_micros(col("__bts"))
    val pm = unix_micros(col(tsCol))
    val unit = direction match {
      case "backward" => when(col("__bts").isNotNull,
        struct(bm.as("__bm"), col("__bp").as("__p")))
      case "forward" => when(col("__bts").isNotNull,
        struct((-bm).as("__bm"), col("__bp").as("__p")))
      case _ => when(col("__bts").isNotNull,
        struct((-abs(bm - pm)).as("__nd"),
          when(bm <= pm, 1).otherwise(0).as("__bwd"),
          col("__bp").as("__p")))
    }
    // the group key includes the probe's event-time column WITH its
    // watermark metadata intact — that one column is what lets the
    // streaming aggregation run in append mode and reclaim state; adding
    // a window() on top would make TWO event-time columns, which the
    // chained-stateful-operator checker rejects
    val grouped = p.join(b, cond, "left_outer")
      .groupBy(probe.columns.map(p(_)): _*)
      .agg(max(unit).as("__best"))
    grouped.select(probe.columns.map(col) ++
      payCols.map(c => col(s"__best.__p.`$c`").as(c)): _*)
  }

  /**
   * INTERVAL-OVERLAP join with NO equi key: all pairs whose intervals
   * `[sL, eL]` and `[sR, eR]` (inclusive micros-long columns — pass
   * `unix_micros` projections) intersect — the two-sided general form
   * of [[bandJoin]], the genomics/observability overlap query Spark
   * also plans as a nested loop. Each interval replicates to every
   * block it covers (fan-out = length/block + 1 — size `blockMicros`
   * near the typical interval length), the join runs on the block id,
   * and a pair is emitted EXACTLY ONCE: at the first block both cover,
   * `greatest(firstBlock(L), firstBlock(R))` — which any overlapping
   * pair provably shares, because max(sL, sR) lies in both intervals.
   * Empty intervals (e < s) match nothing and are dropped; column
   * names must be disjoint.
   */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   sL: String, eL: String, sR: String, eR: String,
                   blockMicros: Long): DataFrame = {
    require(blockMicros >= 1, s"positive block width required, got $blockMicros")
    val collide = left.columns.toSet.intersect(right.columns.toSet)
    require(collide.isEmpty, s"column names must be disjoint, both sides have: $collide")
    def blocked(df: DataFrame, s: String, e: String, bs: String): DataFrame =
      df.where(col(e) >= col(s))
        .withColumn(bs, blockOf(s, blockMicros))
        .withColumn("__be", blockOf(e, blockMicros))
        .withColumn("__blk", explode(sequence(col(bs), col("__be"))))
        .drop("__be")
    val l = blocked(left, sL, eL, "__lbs")
    val r = blocked(right, sR, eR, "__rbs")
    l.join(r, Seq("__blk"))
      .where(col(sL) <= col(eR) && col(sR) <= col(eL) &&
        col("__blk") === greatest(col("__lbs"), col("__rbs")))
      .select((left.columns ++ right.columns).map(col): _*)
  }

  /**
   * Range-band join with NO equi key: all pairs where
   * `l.tsL - band ≤ r.tsR ≤ l.tsL`. Column names must be disjoint
   * across the two inputs (project before the call).
   *
   * Spark plans the raw inequality as BroadcastNestedLoopJoin (or a
   * cartesian product when neither side broadcasts) — every left row
   * against every right row, dead at 100 TB. Blocking time at the band
   * width makes every matching right row live in the left row's own
   * block or the one before it (band == block width, so the window
   * spans at most two block boundaries); replicating only the LEFT side
   * ×2 turns the whole thing into one shuffled equi-join on the block
   * id plus an exact micros residual filter. A traffic burst makes a
   * hot block on BOTH sides of the same key — exactly the shape AQE's
   * skew-join split handles.
   */
  def bandJoin(left: DataFrame, right: DataFrame, tsL: String, tsR: String,
               bandMicros: Long): DataFrame = {
    require(bandMicros >= 1, s"positive band required, got $bandMicros")
    val collide = left.columns.toSet.intersect(right.columns.toSet)
    require(collide.isEmpty, s"column names must be disjoint, both sides have: $collide")
    val l = left.withColumn("__lmus", unix_micros(col(tsL)))
      .withColumn("__b0", blockOf("__lmus", bandMicros))
      .withColumn("__blk", explode(array(col("__b0") - 1, col("__b0"))))
      .drop("__b0")
    val r = right.withColumn("__rmus", unix_micros(col(tsR)))
      .withColumn("__blk", blockOf("__rmus", bandMicros))
    l.join(r, "__blk")
      .where(col("__rmus") >= col("__lmus") - lit(bandMicros) &&
        col("__rmus") <= col("__lmus"))
      .select((left.columns ++ right.columns).map(col): _*)
  }
}
