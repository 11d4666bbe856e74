package graft.cqc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Yannakakis-style evaluation of acyclic conjunctive queries with
 * comparisons (CQC), expressed entirely in DataFrame operations so that
 * Catalyst/Tungsten/AQE pick the physical strategy (hash vs broadcast
 * semijoin, skew handling, codegen).
 *
 * Mapping from the reference's RDD runtime (sqlplus-lib
 * helper/ImplicitConversions.scala) to Spark-first constructs:
 *
 *  - `semiJoin` (:178)                  -> `join(..., "left_semi")`
 *  - `appendExtraColumn`+`extractFieldInHeadElement` (:125,:73) —
 *    per-join-key min/max annotation    -> `groupBy(keys).agg(min/max)`
 *    + inner join + filter (partial aggregation is map-side; the
 *    annotation payload is key+1 value, broadcastable when small)
 *  - `sortValuesWith`+`takeWhile` enumeration (:61,:229) -> equi-join on
 *    fully-reduced inputs + comparison filter applied at the first join
 *    where both sides are bound (Catalyst evaluates it inside the join)
 *  - TreeLikeArray two-comparison pruning (cqc/TreeLikeArray.scala) ->
 *    both bounds annotated per key (min of one column, max of the other),
 *    exact residual filter at enumeration.
 *
 * The full reducer guarantees dangling-free inputs, so intermediate join
 * results of a full CQ are bounded by the output size; comparison
 * annotations additionally prune rows that cannot satisfy any comparison
 * partner, which is what makes CQC output-sensitive.
 */
object Yannakakis {

  /** The direct-route size gate (see [[solveWithTree]]): true when every
    * relation's driver-side estimate ([[Hypergraph.estSize]] — stats, or
    * the fold's multiplicity-neutral hint) is at or under
    * `spark.graft.direct.threshold` bytes. 0 or negative disables the
    * route (every query takes the full reducer — the scale path). The
    * default is deliberately far below `autoBroadcastJoinThreshold`:
    * direct enumeration forfeits the output-sensitive intermediate bound,
    * so it is only taken where the measured reducer overhead exceeds any
    * possible pruning payoff (fixed-size dimension-like inputs), never at
    * "merely broadcastable" sizes where reduction already wins (see the
    * measured crossover in the solveWithTree note).
    */
  private[graft] def routesDirect(rels: Seq[Rel]): Boolean =
    rels.nonEmpty && {
      val thr =
        try rels.head.df.sparkSession.conf.get("spark.graft.direct.threshold", "262144").toLong
        catch { case scala.util.control.NonFatal(_) => 262144L }
      thr > 0 && rels.forall(r => Hypergraph.estSize(r) <= BigInt(thr))
    }

  /**
   * Remove all dangling tuples: bottom-up then top-down semijoin passes
   * (the classic full reducer). Returns the reduced DataFrame per relation.
   */
  /** Cache policy for leaf INPUTS: base-table scans stay lazy (pushdown-
    * pruned columnar reads are the cheap path, and at 100 TB raw inputs
    * don't fit in any cache) — but a DERIVED leaf (aggregate / join /
    * distinct / window subquery) re-runs its whole shuffle every time a
    * reducer pass references it, and by construction it has already
    * shrunk. Persist those (tracked). A welcome side effect: duplicated
    * derived leaves (e.g. ref q3's three identical degree subqueries)
    * canonically dedup in the CacheManager — one materialization serves
    * every copy. */
  private def cacheDerivedLeaf(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    // Aggregate/Window leaves only: those re-run a full shuffle per
    // reference and have shrunk by construction. Distinct-projection
    // leaves (the derived edge lists) measured ~break-even-to-negative
    // under caching — their re-derivation is a pushdown-pruned scan +
    // one exchange, cheaper than a materialize-and-read-back.
    // TOP operator only (descending through unary wrappers): a leaf whose
    // ROOT is a join (e.g. an edge enriched with a folded keyed aggregate)
    // is fact-sized at scale — persisting it would materialize the fact
    // side; the tiny aggregate beneath it is persisted separately by the
    // fold itself and shared via the CacheManager's canonical match.
    @annotation.tailrec
    def topAgg(p: LogicalPlan): Boolean = p match {
      case _: Aggregate | _: Window => true
      case _: Join => false
      case u: UnaryNode => topAgg(u.child)
      case _ => false
    }
    if (topAgg(df.queryExecution.analyzed)) graft.CacheRegistry.persistTracked(df)
    else df
  }

  /** Reducer policy for the MESSAGE-PASSING aggregate paths
    * ([[aggOverJoin]]/[[productOverJoin]]): the same cost gate as
    * enumeration. Correctness does not need the reducer there — every
    * child message joins its parent INNER (per key), and the root only
    * keeps rows matched by a message from every child subtree, so
    * dangling rows drop out of the semiring on their own; reduction just
    * prunes them earlier. [[extremaOverJoin]] is the exception: its
    * carrier walk relies on every relation being dangling-free (it reads
    * extrema straight off the reduced root) and ALWAYS reduces. */
  private def reducedForMessages(tree: JoinTree): Map[String, DataFrame] =
    if (routesDirect(tree.rels.values.toSeq))
      tree.rels.map { case (n, r) => n -> cacheDerivedLeaf(r.df) }.toMap
    else fullReduce(tree)

  def fullReduce(tree: JoinTree): Map[String, DataFrame] = {
    val reduced = scala.collection.mutable.Map[String, DataFrame]()
    tree.rels.foreach { case (n, r) => reduced(n) = cacheDerivedLeaf(r.df) }

    // bottom-up: parent := parent ⋉ child
    for (n <- tree.bottomUp; p <- tree.parentOf.get(n)) {
      val shared = tree.sharedVars(n, p)
      if (shared.nonEmpty)
        reduced(p) = reduced(p).join(reduced(n).select(shared.map(col): _*), shared, "left_semi")
    }
    // top-down: child := child ⋉ parent
    for (n <- tree.topDown.drop(1)) {
      val p = tree.parentOf(n)
      val shared = tree.sharedVars(n, p)
      if (shared.nonEmpty)
        reduced(n) = reduced(n).join(reduced(p).select(shared.map(col): _*), shared, "left_semi")
    }
    reduced.toMap
  }

  /**
   * Evaluate the natural join of `rels` (+ comparison predicates) with
   * semijoin reduction, comparison-bound annotation pruning, and
   * output-sensitive enumeration. The result columns are all distinct
   * variables, in sorted order.
   */
  def solve(rels: Seq[Rel], cmps: Seq[Cmp] = Nil): DataFrame =
    solve(rels, cmps, Nil)

  /**
   * As above, plus `residualSql`: arbitrary predicates over the variables
   * (disjunctions, multi-relation expressions — anything that is not a
   * plain `Cmp`). Each is applied at the FIRST enumeration point where
   * every referenced variable is bound — the earliest the semantics
   * allow — so a cross-relation OR filters the join as it happens
   * instead of after the full result materializes.
   */
  def solve(rels: Seq[Rel], cmps: Seq[Cmp], residualSql: Seq[String]): DataFrame =
    solveWithTree(Hypergraph.joinTree(rels), cmps, residualSql)

  /**
   * The HINT door (reference convert/HintHandler.scala:9): evaluate with
   * a CALLER-PINNED join tree instead of the cost pick — any candidate
   * from [[Hypergraph.candidateTrees]] (or any rerooting; all join trees
   * of an acyclic query are result-equivalent, so a hint changes shuffle
   * payloads and enumeration order, never the answer). Inspect candidates
   * first with [[JoinTree.describe]] — the dry-run surface.
   */
  def solveWithTree(
      tree: JoinTree,
      cmps: Seq[Cmp] = Nil,
      residualSql: Seq[String] = Nil): DataFrame = {
    // Materialization discipline: every relation is referenced by several
    // passes (bottom-up semijoins, top-down semijoins, bound carriers,
    // enumeration). Left fully lazy, each reference re-embeds the whole
    // upstream plan — a measured 95 base-table FileScans for the
    // 5-relation flagship query. We persist ONLY the reduced relations
    // (below): they are the small, dangling-free outputs — the standard
    // Yannakakis materialization points (checkpoints at cluster scale).
    // Raw leaf inputs are deliberately NOT cached: at 100 TB the inputs
    // do not fit anywhere, and the 2-3 leaf reads the reducer makes are
    // pushdown-pruned columnar scans — the cheap path.
    //
    // COST-GATED ROUTE: when every leaf is estimated under
    // `spark.graft.direct.threshold` (default 256 KB), skip the reducer,
    // the bound annotation, and the per-relation persists, and run the
    // tree-ordered enumeration directly — every comparison/residual still
    // applies at its earliest binding (applyReady below), so the result
    // is identical; what is forfeited is the O(input+output) intermediate
    // guarantee, i.e. exactly the plan stock Spark runs for these sizes
    // (a broadcast-join cascade with pushed filters). At this scale the
    // reducer's 2(N-1) semijoins + N persists are pure scheduling breadth:
    // measured on local[32], ref-example bodies (≤40 KB leaves) run
    // 2–3x faster direct (q5: 61→20 stage-jobs, 7.6→1.5 s warm) while a
    // ~1.1 MB-leaf body (TPC-H Q9 profit block at sf0.1) is already 1.2x
    // FASTER with the reducer — the default threshold sits between the
    // two measured regimes, and anything cluster-scale is far above it.
    val direct = routesDirect(tree.rels.values.toSeq)
    val reduced: scala.collection.mutable.Map[String, DataFrame] =
      if (direct) {
        val m = scala.collection.mutable.Map[String, DataFrame]()
        tree.rels.foreach { case (n, r) => m(n) = cacheDerivedLeaf(r.df) }
        m
      } else scala.collection.mutable.Map[String, DataFrame]() ++ fullReduce(tree)

    // Comparison-bound annotation: for `x op y` with x computed over rel A
    // and y computed over rel B (A != B), propagate the best bound of the
    // y-expression along the tree path from B to A, per join key, then
    // filter A. Prunes A-rows having no possible comparison partner — the
    // CQC reduction. COMPUTED sides participate too (the reference q2/q10
    // sum-comparison shape): the bound carrier simply aggregates the
    // expression's value instead of a bare column. All comparisons sharing
    // the same (A, B) pair are FUSED into one aggregate + one join (the
    // TreeLikeArray double-bound case costs the same shuffle count as a
    // single bound), preserving first-occurrence order for determinism.
    val located = cmps.flatMap { cmp =>
      val locL = tree.rels.values
        .find(r => cmp.leftRefs.nonEmpty && cmp.leftRefs.subsetOf(r.vars)).map(_.name)
      val locR = tree.rels.values
        .find(r => cmp.rightRefs.nonEmpty && cmp.rightRefs.subsetOf(r.vars)).map(_.name)
      (locL, locR) match {
        case (Some(a), Some(b)) if a != b => Some(((a, b), cmp))
        case _ => None // same-relation / multi-relation side: residual covers it
      }
    }
    for (pair <- located.map(_._1).distinct if !direct) {
      val group = located.collect { case (`pair`, c) => c }
      annotateAndFilter(tree, reduced, pair._1, pair._2, group)
    }

    // Dangling-free, comparison-pruned relations are the enumeration
    // inputs; persist them — each is referenced by the enumeration join
    // AND was built from multi-referenced intermediates. Tracked in
    // CacheRegistry: callers release with CacheRegistry.unpersistAll()
    // after materializing the result.
    // On the direct route the leaves are broadcast-sized and referenced
    // exactly once (the enumeration join) — a persist would only insert
    // materialization barriers between AQE stages (measured: 29→262
    // stage-jobs when persists are dropped on the REDUCED route, whose
    // relations ARE multi-referenced, vs 33→29 when dropped on the
    // direct route).
    if (!direct)
      tree.topDown.foreach(n => reduced(n) = graft.CacheRegistry.persistTracked(reduced(n)))

    // Enumeration: fold natural joins root-first; apply each comparison /
    // residual predicate as soon as its variables are bound (earliest
    // possible filtering, like enumerateWithOneComparison's takeWhile).
    var acc = reduced(tree.root)
    var pending: Seq[(String, Set[String])] =
      cmps.map(c => c.sqlExpr -> (c.leftRefs ++ c.rightRefs)) ++
        residualSql.map(s => s -> Cmp.refsOf(s))
    def applyReady(): Unit = {
      val bound = acc.columns.toSet
      val (ready, rest) = pending.partition { case (_, refs) => refs.subsetOf(bound) }
      ready.foreach { case (sql, _) => acc = acc.where(expr(sql)) }
      pending = rest
    }
    applyReady()
    for (n <- tree.topDown.drop(1)) {
      val shared = acc.columns.toSet intersect tree.rels(n).vars
      acc =
        if (shared.nonEmpty) acc.join(reduced(n), shared.toSeq.sorted, "inner")
        else acc.crossJoin(reduced(n))
      applyReady()
    }
    require(pending.isEmpty, s"unresolved predicates: ${pending.map(_._1)}")
    acc.select(acc.columns.sorted.map(col): _*)
  }

  /**
   * COUNT(*) over the natural join of `rels`, grouped by `groupVars` —
   * computed WITHOUT enumerating the join. Classic aggregation
   * pushdown over a join tree (the FAQ/AJAR formulation; the reference
   * computes aggregates AFTER enumeration — TpchQueriesTest — which is
   * the part that cannot scale when the join output is huge): each node
   * sends its parent a per-join-key COUNT of its subtree's join
   * combinations, parents multiply incoming counts into their rows, and
   * the root groups by `groupVars` summing the products. Every message
   * is a small (key, count) aggregate — map-side combinable, broadcast-
   * able — so the full join result (potentially |edges|^depth rows)
   * never exists anywhere.
   *
   * `groupVars` must be covered by one relation; the tree is re-rooted
   * there. Comparisons are not supported on this path (they break the
   * per-subtree factorization); use [[solve]] + groupBy when you need
   * them.
   */
  def countOverJoin(rels: Seq[Rel], groupVars: Seq[String]): DataFrame =
    aggOverJoin(rels, groupVars, None)

  /**
   * COUNT(*) and optionally SUM(`sumVar`) over the natural join, grouped
   * by `groupVars`, via the same message passing — the (count, sum)
   * semiring: absorbing a child message into a node's rows multiplies
   * counts and cross-multiplies sums (`sum' = sum·cnt_c + cnt·sum_c`),
   * which is exactly how Σ x distributes over a product of independent
   * subtree combinations. `sumVar` may live in any ONE relation.
   */
  def aggOverJoin(
      rels: Seq[Rel],
      groupVars: Seq[String],
      sumVar: Option[String]): DataFrame =
    aggOverJoin(rels, groupVars, sumVar.toSeq)

  /** Multi-sum form: any number of sum variables, each living in exactly
    * one relation; messages carry one sum column per variable next to the
    * count, combined independently by the same cross-multiplication. */
  def aggOverJoin(
      rels: Seq[Rel],
      groupVars: Seq[String],
      sumVars: Seq[String]): DataFrame =
    aggOverJoin(rels, groupVars, sumVars, Nil, Nil)

  /**
   * The fully fused form: COUNT(*), any number of SUMs, and any number
   * of MIN/MAX variables in ONE message pass — extrema ride the same
   * per-key aggregates as the counting semiring (min/max are idempotent,
   * so a message's extremum combines with `least`/`greatest` instead of
   * the cross-multiplication; relations not on the variable's path carry
   * a typed null, which `least`/`greatest` skip). One shuffle per tree
   * edge total, however many aggregates are requested — the same fusion
   * discipline as the comparison-bound carriers.
   */
  def aggOverJoin(
      rels: Seq[Rel],
      groupVars: Seq[String],
      sumVars: Seq[String],
      minVars: Seq[String],
      maxVars: Seq[String]): DataFrame = {
    val rootRel = rels.find(r => groupVars.toSet.subsetOf(r.vars)).getOrElse(
      throw new IllegalArgumentException(
        s"groupVars $groupVars must be covered by a single relation"))
    sumVars.foreach(v => require(rels.count(_.vars.contains(v)) == 1,
      s"sum variable $v must appear in exactly ONE relation (a shared join " +
        "variable would be seeded once per copy and overcounted)"))
    val tree = Hypergraph.joinTree(rels).rerooted(rootRel.name)
    val reduced = reducedForMessages(tree)
    val sumCols = sumVars.indices.map(i => s"__sum$i")
    // DECIMAL sum variables run the semiring on EXACT arithmetic
    // ([[graft.functions.DecimalExact]] — DECIMAL(38, s) partials, r16):
    // Spark's native decimal *)/(+ adjust precision by SHRINKING scale
    // (never below 6), so scale > 6 sums used to be silently rounded
    // mid-semiring; the exact ops preserve the scale for ANY s and
    // null on magnitude overflow (the stock capped-accumulator class)
    val sumType: Map[String, org.apache.spark.sql.types.DataType] =
      sumVars.map(v => v -> rels.find(_.vars.contains(v)).getOrElse(
        throw new IllegalArgumentException(s"variable $v appears in no relation"))
        .df.schema(v).dataType).toMap
    def isDec(v: String): Boolean =
      sumType(v).isInstanceOf[org.apache.spark.sql.types.DecimalType]
    // extrema: (variable, isMin, message column); shared join variables
    // are fine here (idempotent — a double-seeded value changes nothing)
    val exSpecs = (minVars.map((_, true)) ++ maxVars.map((_, false)))
      .zipWithIndex.map { case ((v, isMin), i) => (v, isMin, s"__ex$i") }
    val exType = exSpecs.map { case (v, _, _) =>
      v -> rels.find(_.vars.contains(v)).getOrElse(
        throw new IllegalArgumentException(s"variable $v appears in no relation"))
        .df.schema(v).dataType
    }.toMap

    // bottom-up: per-key (count, sums..., extrema...) of each subtree
    val msg = scala.collection.mutable.Map[String, DataFrame]()
    def withChildMsgs(n: String): DataFrame = {
      // sum columns keep their own type (integral vars stay exact; float
      // vars are the caller's determinism tradeoff, as with any Spark sum)
      var df = reduced(n).withColumn("__cnt", lit(1L))
      sumVars.zip(sumCols).foreach { case (v, sc) =>
        // decimal vars seed a TYPED zero so the exact combine below never
        // sees a long/decimal mix; integrals keep the long identity
        val zero =
          if (isDec(v)) lit(java.math.BigDecimal.ZERO).cast(sumType(v))
          else lit(0L)
        df = df.withColumn(sc,
          if (tree.rels(n).vars.contains(v)) col(v) else zero)
      }
      exSpecs.foreach { case (v, _, ec) =>
        df = df.withColumn(ec,
          if (tree.rels(n).vars.contains(v)) col(v)
          else lit(null).cast(exType(v))) // least/greatest skip nulls
      }
      for (c <- tree.childrenOf(n)) {
        val ck = tree.sharedVars(c, n)
        var m = msg(c).withColumnRenamed("__cnt", "__cnt_c")
        (sumCols ++ exSpecs.map(_._3)).foreach(sc =>
          m = m.withColumnRenamed(sc, s"${sc}_c"))
        df =
          if (ck.nonEmpty) df.join(m, ck, "inner")
          else df.crossJoin(m) // disconnected edge: semiring still multiplies
        sumVars.zip(sumCols).foreach { case (v, sc) =>
          df = df.withColumn(sc,
            if (isDec(v)) {
              import graft.functions.DecimalExact
              DecimalExact.plus(
                DecimalExact.timesCount(col(sc), col("__cnt_c")),
                DecimalExact.timesCount(col(s"${sc}_c"), col("__cnt")))
            } else col(sc) * col("__cnt_c") + col("__cnt") * col(s"${sc}_c"))
        }
        exSpecs.foreach { case (_, isMin, ec) =>
          df = df.withColumn(ec,
            if (isMin) least(col(ec), col(s"${ec}_c"))
            else greatest(col(ec), col(s"${ec}_c")))
        }
        df = df.withColumn("__cnt", col("__cnt") * col("__cnt_c"))
          .drop("__cnt_c" +: (sumCols ++ exSpecs.map(_._3)).map(sc => s"${sc}_c"): _*)
      }
      df
    }
    for (n <- tree.bottomUp if n != tree.root) {
      val keys = tree.sharedVars(n, tree.parentOf(n))
      val d = withChildMsgs(n)
      val aggs = (sum(col("__cnt")).as("__cnt") +:
        sumCols.map(sc => sum(col(sc)).as(sc))) ++
        exSpecs.map { case (_, isMin, ec) =>
          (if (isMin) min(col(ec)) else max(col(ec))).as(ec)
        }
      msg(n) =
        if (keys.nonEmpty) d.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
        else d.agg(aggs.head, aggs.tail: _*)
    }
    val finalAggs = (sum(col("__cnt")).as("cnt") +:
      sumVars.zip(sumCols).map { case (v, sc) => sum(col(sc)).as(s"sum_$v") }) ++
      exSpecs.map { case (v, isMin, ec) =>
        if (isMin) min(col(ec)).as(s"min_$v") else max(col(ec)).as(s"max_$v")
      }
    withChildMsgs(tree.root)
      .groupBy(groupVars.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /**
   * Σ over the natural join of a PRODUCT of per-relation factors — the
   * sum-of-products semiring, grouped by `groupVars`, with no
   * enumeration. `factors` maps relation name → SQL expression over that
   * relation's own variables; relations absent from the map contribute
   * the multiplicative identity 1. Seeding each row's message value with
   * its factor makes the same per-key message passing as
   * [[countOverJoin]] compute Σ_join Π_r factor_r directly: a subtree's
   * message is the per-join-key sum of its factor products, absorbing a
   * child message multiplies (independent combinations distribute), and
   * the root groups by `groupVars` summing the products. COUNT is the
   * all-ones special case; SUM(x) is the single-factor case — this is
   * the general semiring member of the family (cross-relation terms like
   * Σ x_A·y_B need it; the (count, sum) form of [[aggOverJoin]] cannot
   * express them).
   *
   * Every message is a small (key, value) aggregate — map-side
   * combinable, broadcastable — so the join result never exists.
   * Factor type discipline is the caller's (integer/decimal factors stay
   * exact and order-independent; floats carry the usual Spark-sum
   * caveat).
   */
  def productOverJoin(
      rels: Seq[Rel],
      groupVars: Seq[String],
      factors: Map[String, String],
      resultName: String = "sum_product"): DataFrame = {
    val rootRel = rels.find(r => groupVars.toSet.subsetOf(r.vars)).getOrElse(
      throw new IllegalArgumentException(
        s"groupVars $groupVars must be covered by a single relation"))
    factors.keys.foreach(n => require(rels.exists(_.name == n),
      s"factor relation $n not among the relations"))
    val tree = Hypergraph.joinTree(rels).rerooted(rootRel.name)
    val reduced = reducedForMessages(tree)

    def seeded(n: String): DataFrame =
      reduced(n).withColumn("__w",
        factors.get(n).map(expr).getOrElse(lit(1L)))
    // DECIMAL factors multiply through the exact semiring ops (r16 — the
    // aggOverJoin rationale: native decimal × shrinks scale > 6); the
    // factor-scale SUM must stay ≤ 38, which the door gate pre-checks
    // (a direct API caller gets the expression's loud require instead)
    def exactTimes(a: org.apache.spark.sql.Column, at: org.apache.spark.sql.types.DataType,
                   b: org.apache.spark.sql.Column,
                   bt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
      import org.apache.spark.sql.types.DecimalType
      import graft.functions.DecimalExact
      import org.apache.spark.sql.types.{DoubleType, FloatType}
      def fractional(t: org.apache.spark.sql.types.DataType): Boolean =
        t == DoubleType || t == FloatType
      (at, bt) match {
        case (_: DecimalType, _: DecimalType) => DecimalExact.times(a, b)
        // a fractional factor cannot ride timesCount (it casts the
        // factor to DECIMAL(20,0), silently rounding 0.5 to 0 — r16
        // advice); the product honestly degrades to double instead
        case (_: DecimalType, o) if fractional(o) => a * b
        case (o, _: DecimalType) if fractional(o) => a * b
        case (_: DecimalType, _) => DecimalExact.timesCount(a, b)
        case (_, _: DecimalType) => DecimalExact.timesCount(b, a)
        case _ => a * b
      }
    }
    val msg = scala.collection.mutable.Map[String, DataFrame]()
    def withChildMsgs(n: String): DataFrame = {
      var df = seeded(n)
      for (c <- tree.childrenOf(n)) {
        val ck = tree.sharedVars(c, n)
        val lt = df.schema("__w").dataType
        val rt = msg(c).schema("__w").dataType
        val m = msg(c).withColumnRenamed("__w", "__w_c")
        df =
          if (ck.nonEmpty) df.join(m, ck, "inner")
          else df.crossJoin(m) // disconnected edge: semiring still multiplies
        df = df.withColumn("__w",
          exactTimes(col("__w"), lt, col("__w_c"), rt)).drop("__w_c")
      }
      df
    }
    for (n <- tree.bottomUp if n != tree.root) {
      val keys = tree.sharedVars(n, tree.parentOf(n))
      val d = withChildMsgs(n)
      msg(n) =
        if (keys.nonEmpty) d.groupBy(keys.map(col): _*).agg(sum(col("__w")).as("__w"))
        else d.agg(sum(col("__w")).as("__w"))
    }
    withChildMsgs(tree.root)
      .groupBy(groupVars.map(col): _*)
      .agg(sum(col("__w")).as(resultName))
  }

  /**
   * MIN(v) and MAX(v) over the natural join, grouped by `groupVars`,
   * with no enumeration: min/max are idempotent, so join multiplicities
   * are irrelevant and the comparison-annotation carrier walk IS the
   * aggregate — per-key extrema of `v` flow from its relation along the
   * tree path to the (re-rooted) group relation, one tiny aggregate +
   * join per hop. Completes the aggregate family next to
   * [[countOverJoin]]/[[aggOverJoin]] (COUNT/SUM need the counting
   * semiring; MIN/MAX only need reachability).
   */
  def extremaOverJoin(rels: Seq[Rel], groupVars: Seq[String], v: String): DataFrame = {
    val rootRel = rels.find(r => groupVars.toSet.subsetOf(r.vars)).getOrElse(
      throw new IllegalArgumentException(
        s"groupVars $groupVars must be covered by a single relation"))
    val vRel = rels.find(_.vars.contains(v)).getOrElse(
      throw new IllegalArgumentException(s"variable $v appears in no relation")).name
    val tree = Hypergraph.joinTree(rels).rerooted(rootRel.name)
    val reduced = fullReduce(tree)
    if (vRel == tree.root)
      return reduced(tree.root).groupBy(groupVars.map(col): _*)
        .agg(min(col(v)).as(s"min_$v"), max(col(v)).as(s"max_$v"))
    val hops = tree.path(vRel, tree.root)
    var carrier: DataFrame = null
    for (i <- 0 until hops.length - 1) {
      val cur = hops(i)
      val next = hops(i + 1)
      val keys = tree.sharedVars(cur, next)
      require(keys.nonEmpty, s"disconnected tree edge $cur-$next")
      val base =
        if (i == 0) reduced(cur).select((keys :+ v).distinct.map(col): _*)
        else reduced(cur).join(carrier, tree.sharedVars(hops(i - 1), cur), "inner")
      val (mnc, mxc) = if (i == 0) (v, v) else ("__mn", "__mx")
      carrier = base.groupBy(keys.map(col): _*)
        .agg(min(col(mnc)).as("__mn"), max(col(mxc)).as("__mx"))
    }
    reduced(tree.root)
      .join(carrier, tree.sharedVars(hops(hops.length - 2), tree.root), "inner")
      .groupBy(groupVars.map(col): _*)
      .agg(min(col("__mn")).as(s"min_$v"), max(col("__mx")).as(s"max_$v"))
  }

  /**
   * Propagate the min/max bounds of every `cmp.right` in `cmps` (all
   * living in node `b`) along the tree path to node `a` in ONE fused
   * carrier, then filter `a` on all of them at once. Each hop is a single
   * per-key aggregate (map-side combinable, all bounds as extra agg
   * columns — the shuffle payload grows by one value per comparison, not
   * one pass per comparison) plus an inner join.
   */
  private def annotateAndFilter(
      tree: JoinTree,
      reduced: scala.collection.mutable.Map[String, DataFrame],
      a: String,
      b: String,
      cmps: Seq[Cmp]): Unit = {
    val hops = tree.path(b, a) // b ... a
    // relation names can contain expression operators (GHD bags are named
    // "g1+g2"), so sanitize everything embedded in a column name that
    // later round-trips through expr()
    def safe(s: String): String = s.replaceAll("[^A-Za-z0-9_]", "_")
    val bound = cmps.zipWithIndex.map { case (c, i) =>
      c -> s"__bound${i}_${safe(c.right)}_${safe(a)}_${safe(b)}"
    }

    // Walk from b toward a, carrying all per-join-key bounds together.
    // The first hop projects each right-hand side as an EXPRESSION over
    // b's variables (a bare column is just the simplest case), so computed
    // comparison sides get the same per-key bound machinery.
    var carrier: DataFrame = null
    for (i <- 0 until hops.length - 1) {
      val cur = hops(i)
      val next = hops(i + 1)
      val keys = tree.sharedVars(cur, next)
      if (keys.isEmpty) return // disconnected hop: bail out, residual filter still applies
      val base =
        if (i == 0) reduced(cur).select(
          keys.map(col) ++ bound.map { case (c, bc) => expr(c.right).as(bc) }: _*)
        else reduced(cur).join(carrier, tree.sharedVars(hops(i - 1), cur), "inner")
      val aggs = bound.map { case (c, bc) =>
        (if (c.rightBoundIsMax) max(col(bc)) else min(col(bc))).as(bc)
      }
      carrier = base.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    if (carrier == null) return
    val aKeys = tree.sharedVars(hops(hops.length - 2), a)
    val cond = bound.map { case (c, bc) => s"((${c.left}) ${c.op} $bc)" }.mkString(" AND ")
    val filtered = reduced(a)
      .join(carrier, aKeys, "inner")
      .where(expr(cond))
      .drop(bound.map(_._2): _*)
    reduced(a) = filtered
  }
}
