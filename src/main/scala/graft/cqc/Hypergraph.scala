package graft.cqc

import org.apache.spark.sql.DataFrame

/**
 * A relation in "variable space": the DataFrame's column names ARE the
 * query variables, so two relations sharing a column name are equi-joined
 * on it (natural-join semantics, like the reference's variable model in
 * sqlplus-core expression/Variable.scala).
 */
case class Rel(name: String, df: DataFrame, estHint: Option[BigInt] = None) {
  lazy val vars: Set[String] = df.columns.toSet
}

/**
 * A comparison predicate `left op right` between two sides, each either a
 * plain variable or a computed expression over variables (the CQC case —
 * reference graph/Comparison.scala; computed sides are the reference q2
 * `g1.src + g2.src + g3.src < ...` shape). Ops: < <= > >=.
 *
 * Plain-variable comparisons get bound-annotation pruning along the join
 * tree; computed sides are applied as filters at the first enumeration
 * point where every referenced variable is bound.
 */
case class Cmp(left: String, op: String, right: String) {
  require(Set("<", "<=", ">", ">=")(op), s"unsupported comparison op: $op")
  /** true if the bound to propagate for `right` is a max (left must be below it) */
  def rightBoundIsMax: Boolean = op == "<" || op == "<="
  def sqlExpr: String = s"($left) $op ($right)"

  lazy val leftRefs: Set[String] = Cmp.refsOf(left)
  lazy val rightRefs: Set[String] = Cmp.refsOf(right)

  /** Both sides are bare variables (bound annotation is applicable). */
  def isSimple: Boolean = leftRefs == Set(left) && rightRefs == Set(right)
}

object Cmp {
  /** Variable names a SQL expression string references (parsed, so
    * computed exprs work; the tree is unresolved here so collect attribute
    * NAMES — an unresolved tree's `references` set is empty). */
  private[graft] def refsOf(s: String): Set[String] =
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(s)
      .collect { case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => ua.name }
      .toSet
}

class CyclicQueryException(msg: String) extends RuntimeException(msg)

/**
 * Join tree of an acyclic conjunctive query, found by GYO ear
 * decomposition (reference: sqlplus-core gyo/GyoAlgorithm.scala — ours is
 * a fresh implementation of the textbook algorithm, driver-side only and
 * O(edges^2 * vars), negligible vs. data volume).
 */
final class JoinTree(
    val rels: Map[String, Rel],
    val root: String,
    val parentOf: Map[String, String]) {

  /** The same (undirected) join tree re-rooted at `newRoot`: parent
    * pointers along the path newRoot..root flip direction. Any node of a
    * join tree can serve as root — the running-intersection property is
    * undirected — so this is how a cost model picks WHERE enumeration
    * starts without re-running GYO. */
  def rerooted(newRoot: String): JoinTree = {
    require(rels.contains(newRoot), s"unknown relation $newRoot")
    if (newRoot == root) this
    else {
      // ancestors newRoot -> ... -> old root, then flip each edge on it
      val up = scala.collection.mutable.ArrayBuffer(newRoot)
      while (parentOf.contains(up.last)) up += parentOf(up.last)
      val flipped = scala.collection.mutable.Map[String, String]() ++ parentOf
      flipped -= newRoot
      for (i <- 0 until up.length - 1) flipped(up(i + 1)) = up(i)
      new JoinTree(rels, newRoot, flipped.toMap)
    }
  }

  val childrenOf: Map[String, Seq[String]] =
    parentOf.toSeq.groupBy(_._2).map { case (p, kids) => p -> kids.map(_._1).sorted }
      .withDefaultValue(Seq.empty)

  /** Nodes ordered leaves-first (every node appears before its parent). */
  lazy val bottomUp: Seq[String] = topDown.reverse

  /** Nodes ordered root-first (every node appears after its parent). */
  lazy val topDown: Seq[String] = {
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    def walk(n: String): Unit = { buf += n; childrenOf(n).foreach(walk) }
    walk(root)
    buf.toSeq
  }

  def sharedVars(a: String, b: String): Seq[String] =
    (rels(a).vars intersect rels(b).vars).toSeq.sorted

  /** Human-readable dry-run description: every node with its parent edge,
    * shared join variables, and the driver-side size estimate the cost
    * pick used — the plan surface WITHOUT executing anything (reference
    * convert/DryRunHandler.scala:6 prints its candidate plans the same
    * way). */
  def describe: String =
    topDown.map { n =>
      val edge = parentOf.get(n)
        .map(p => s"<- $p on [${sharedVars(n, p).mkString(",")}]")
        .getOrElse("(root)")
      s"$n $edge est=${Hypergraph.estSize(rels(n))}B"
    }.mkString("\n")

  /** Tree path between two nodes (inclusive). */
  def path(from: String, to: String): Seq[String] = {
    def ancestors(n: String): List[String] =
      n :: parentOf.get(n).map(ancestors).getOrElse(Nil)
    val fa = ancestors(from)
    val ta = ancestors(to)
    val common = fa.find(ta.contains).getOrElse(root)
    val up = fa.takeWhile(_ != common) :+ common
    val down = ta.takeWhile(_ != common).reverse
    up ++ down
  }
}

object Hypergraph {

  /** Driver-side size estimate from Catalyst's optimized-plan stats —
    * pure metadata (parquet footer sizes x selectivity guesses), no jobs.
    * The reference's cost pick reads table statistics the same way
    * (its join-tree candidates are costed before compilation).
    *
    * A relation constructed with an `estHint` overrides the stats: the
    * hint carries knowledge Catalyst's estimator lacks — e.g. a keyed
    * aggregate folded into a host relation is multiplicity-neutral
    * (≤ one match per host row), so the enriched relation is at most
    * host-sized, while the stats multiply the join children into
    * garbage (measured: a 37 KB example-graph edge list estimated at
    * 1.1 GB after one degree-subquery fold, poisoning both the tree
    * cost pick and the direct-route gate). */
  private[graft] def estSize(r: Rel): BigInt =
    r.estHint.getOrElse(
      try r.df.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case scala.util.control.NonFatal(_) => BigInt(Long.MaxValue) })

  /**
   * GYO reduction → join tree, COST-PICKED among the valid candidates
   * (reference: gyo/GyoAlgorithm.scala feeding a costed candidate pick):
   *  - each round absorbs the SMALLEST available ear, so small relations
   *    sit deep in the tree and semijoin filters flow outward from them;
   *  - among witnesses of that ear, prefer the largest shared-variable
   *    overlap (strongest semijoin), tie-broken by smaller size, then
   *    name (determinism);
   *  - the finished tree is re-rooted at the LARGEST relation: the big
   *    side is reduced by every child before enumeration ever widens it,
   *    and the accumulated intermediate joins against small reduced
   *    children (AQE broadcasts them) instead of meeting the big
   *    relation last.
   * Tree choice never changes results (join trees of an acyclic query
   * are result-equivalent — spec-verified); it changes shuffle payloads.
   * Throws CyclicQueryException when not alpha-acyclic (cyclic queries
   * go through [[graft.wcoj]] / GHD instead).
   */
  def joinTree(rels: Seq[Rel]): JoinTree = {
    val (parent, alive) = gyo(rels)
    if (alive.size > 1)
      throw new CyclicQueryException(
        s"query is cyclic; remaining hyperedges: ${alive.keys.mkString(", ")}")
    val byName = rels.map(r => r.name -> r).toMap
    val size: Map[String, BigInt] = rels.map(r => r.name -> estSize(r)).toMap
    val tree = new JoinTree(byName, alive.head._1, parent)
    val pick = Option(rootHintTL.get).filter(byName.contains)
      .getOrElse(rels.maxBy(r => (size(r.name), r.name)).name)
    tree.rerooted(pick)
  }

  /** Candidate-pick surface for callers that cannot pass a [[JoinTree]]
    * (the SQL door / web API): while `f` runs on this thread, [[joinTree]]
    * roots its ENUMERATION tree at `root` instead of the cost pick.
    * Tree choice never changes results (rerooting preserves the
    * running-intersection property); the fast aggregate paths reroot by
    * their own semantics and ignore the hint. Reference: sqlplus-web's
    * candidate-tree pick feeding convert/HintHandler.scala:9. */
  private val rootHintTL = new ThreadLocal[String]
  def withRootHint[T](root: String)(f: => T): T = {
    rootHintTL.set(root)
    try f finally rootHintTL.remove()
  }
  /** Whether a caller pinned a root on this thread — leaf-merging
    * rewrites are disabled under a pin so the named rel can't vanish. */
  private[graft] def activeRootHint: Option[String] = Option(rootHintTL.get)

  /** Every valid join tree the cost model chooses among: the GYO tree
    * rerooted at each relation (rerooting preserves the running-
    * intersection property, so all are result-equivalent — spec-verified).
    * The HINT surface: inspect with [[JoinTree.describe]], then pin one
    * via [[Yannakakis.solveWithTree]] (reference convert/
    * HintHandler.scala:9 pins user-chosen join trees the same way). */
  def candidateTrees(rels: Seq[Rel]): Seq[JoinTree] = {
    val t = joinTree(rels)
    rels.map(r => t.rerooted(r.name))
  }

  /** Names of the hyperedges left un-absorbed when GYO stalls — the
    * cyclic core of the query (empty when alpha-acyclic). [[graft.wcoj.Ghd]]
    * evaluates exactly this set worst-case-optimally as one bag. */
  def cyclicCore(rels: Seq[Rel]): Seq[String] = {
    val (_, alive) = gyo(rels)
    if (alive.size > 1) alive.keys.toSeq else Seq.empty
  }

  /** Shared GYO ear-absorption loop: returns (parent pointers, residual). */
  private def gyo(rels: Seq[Rel]): (Map[String, String], scala.collection.immutable.ListMap[String, Set[String]]) = {
    require(rels.map(_.name).distinct.size == rels.size, "relation names must be unique")
    val byName = rels.map(r => r.name -> r).toMap
    val size: Map[String, BigInt] = rels.map(r => r.name -> estSize(r)).toMap
    var alive = scala.collection.immutable.ListMap(rels.map(r => r.name -> r.vars): _*)
    val parent = scala.collection.mutable.Map[String, String]()

    var progress = true
    while (alive.size > 1 && progress) {
      progress = false
      val candidates = alive.iterator.flatMap { case (e, vs) =>
        val others = alive - e
        val isolated = vs.filter(v => !others.valuesIterator.exists(_.contains(v)))
        val rest = vs -- isolated
        // an "ear": its non-isolated vars are covered by a single witness;
        // collect every witness and keep the best one for this ear
        val witnesses = others.collect { case (w, wvs) if rest.subsetOf(wvs) => w }
        if (witnesses.isEmpty) None
        else {
          val w = witnesses.minBy(w =>
            (-(byName(e).vars intersect byName(w).vars).size, size(w), w))
          Some((e, w))
        }
      }.toSeq
      if (candidates.nonEmpty) {
        val (ear, witness) = candidates.minBy { case (e, _) => (size(e), e) }
        parent(ear) = witness
        alive -= ear
        progress = true
      }
    }
    (parent.toMap, alive)
  }

  def isAcyclic(rels: Seq[Rel]): Boolean =
    try { joinTree(rels); true } catch { case _: CyclicQueryException => false }
}
