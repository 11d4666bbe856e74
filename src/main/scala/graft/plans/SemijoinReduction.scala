package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.internal.SQLConf

/**
 * Catalyst optimizer rule: Yannakakis semijoin reduction for multiway
 * inner equi-join clusters written as plain SQL / DataFrame joins — the
 * "Extended Spark SQL" door to the CQC engine (reference: SparkSQLPlus
 * compiles whole queries; graft instead extends Catalyst so existing
 * `spark.sql(...)` text benefits without a separate front-end).
 *
 * For every maximal cluster of inner joins over >= 3 base relations
 * whose equality conditions form an alpha-acyclic hypergraph (GYO test
 * on the attribute-equivalence classes), the rule replaces each base
 * relation with its fully-reduced form: a bottom-up then top-down pass
 * of `LEFT SEMI` joins along the GYO join tree. Inner-join results are
 * unchanged (a semijoin only removes rows that cannot join), but
 * dangling tuples die in map-side-combinable semijoins BEFORE the
 * expensive shuffle joins — the Yannakakis guarantee, now applied by the
 * optimizer instead of the query author.
 *
 * Off by default (the reduction pays for itself on dangling-heavy
 * inputs, not on PK-FK star joins); enable per session or per statement:
 *   spark.conf.set("spark.graft.semijoinReduction", "true")
 */
object SemijoinReduction extends Rule[LogicalPlan] {

  val confKey = "spark.graft.semijoinReduction"

  /** Marks join roots this rule already rebuilt (fixpoint guard). */
  private val reducedTag = TreeNodeTag[Boolean]("graft.semijoin.reduced")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!SQLConf.get.getConfString(confKey, "false").toBoolean) return plan
    rewrite(plan)
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case j @ Join(_, _, Inner, _, _) if j.getTagValue(reducedTag).isEmpty =>
      val (leaves, conds) = flatten(j)
      val rebuilt = reduceCluster(j, leaves, conds)
      rebuilt.foreach(_.setTagValue(reducedTag, true))
      rebuilt.getOrElse(j.mapChildren(rewrite))
    case other => other.mapChildren(rewrite)
  }

  /** Attribute-only prunes are transparent to the join cluster. */
  private def isPrune(p: LogicalPlan): Boolean = p match {
    case Project(plist, _) => plist.forall(_.isInstanceOf[Attribute])
    case _ => false
  }

  /** Flatten a tree of inner joins (looking through column prunes) into
    * (base relations, conditions). */
  private def flatten(plan: LogicalPlan): (Seq[LogicalPlan], Seq[Expression]) =
    plan match {
      case Join(l, r, Inner, cond, _) =>
        val (ll, lc) = flatten(l)
        val (rl, rc) = flatten(r)
        (ll ++ rl, lc ++ rc ++ cond.toSeq.flatMap(splitConjuncts))
      case p @ Project(_, child) if isPrune(p) => flatten(child)
      case leaf => (Seq(leaf), Nil)
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /**
   * Attempt the reduction; None when the cluster is not eligible
   * (fewer than 3 leaves, cyclic, or no usable equalities).
   */
  private def reduceCluster(
      root: Join,
      leaves: Seq[LogicalPlan],
      conds: Seq[Expression]): Option[LogicalPlan] = {
    if (leaves.size < 3) return None
    // leaves already produced by this rule => converged
    if (leaves.forall(_.isInstanceOf[Join])) return None

    // attribute-equivalence classes from the equality conditions, keyed by
    // ExprId (condition references and leaf outputs can differ in
    // qualifier/nullability while being the same attribute)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(id: Long): Long = {
      val p = parent.getOrElse(id, id)
      if (p == id) id else { val r = find(p); parent(id) = r; r }
    }
    def union(a: Long, b: Long): Unit = parent(find(a)) = find(b)
    val equalities = conds.collect {
      case EqualTo(a: Attribute, b: Attribute) => (a.exprId.id, b.exprId.id)
    }
    if (equalities.isEmpty) return None
    equalities.foreach { case (a, b) => union(a, b) }

    // per-leaf variable sets (class representatives of its output attrs)
    val leafVars: Seq[Set[Long]] = leaves.map(_.output.map(a => find(a.exprId.id)).toSet)
    val shared = leafVars.zipWithIndex.flatMap { case (vs, i) =>
      vs.filter(v => leafVars.zipWithIndex.exists { case (o, j) => j != i && o(v) })
    }.toSet
    val hyperedges = leafVars.map(_.intersect(shared))
    if (hyperedges.exists(_.isEmpty)) return None // cross-join component

    joinTree(hyperedges) match {
      case None => None // cyclic — leave to Spark's planner (or Ghd API)
      case Some(parentOf) =>
        // var class -> the leaf attribute of a given leaf
        def attrFor(leaf: Int, v: Long): Attribute =
          leaves(leaf).output.find(a => find(a.exprId.id) == v).get
        def semiCond(a: Int, b: Int): Expression = {
          val vs = (hyperedges(a) intersect hyperedges(b)).toSeq.sorted
          vs.map(v => EqualTo(attrFor(a, v), attrFor(b, v)): Expression)
            .reduce(And)
        }
        // right side of a semijoin only needs the join attributes — prune
        // the shuffle payload to the shared variables
        def semiRight(of: Int, withLeaf: Int, plan: LogicalPlan): LogicalPlan = {
          val vs = (hyperedges(of) intersect hyperedges(withLeaf)).toSeq.sorted
          Project(vs.map(v => attrFor(withLeaf, v)), plan)
        }
        val reduced = scala.collection.mutable.Map[Int, LogicalPlan]() ++
          leaves.indices.map(i => i -> leaves(i)).toMap
        val order = topoOrder(parentOf, leaves.size)
        // bottom-up: parent ⋉ child, then top-down: child ⋉ parent
        for (n <- order.reverse; p <- parentOf.get(n))
          reduced(p) = Join(reduced(p), semiRight(p, n, reduced(n)), LeftSemi,
            Some(semiCond(p, n)), JoinHint.NONE)
        for (n <- order; p <- parentOf.get(n))
          reduced(n) = Join(reduced(n), semiRight(n, p, reduced(p)), LeftSemi,
            Some(semiCond(n, p)), JoinHint.NONE)

        // rebuild the original join structure over the reduced leaves
        val it = leaves.indices.iterator
        def rebuild(plan: LogicalPlan): LogicalPlan = plan match {
          case j @ Join(l, r, Inner, _, _) =>
            j.copy(left = rebuild(l), right = rebuild(r))
          case p @ Project(_, child) if isPrune(p) =>
            p.copy(child = rebuild(child))
          case _ => reduced(it.next())
        }
        Some(rebuild(root))
    }
  }

  /** GYO ear decomposition on the leaf hypergraph: Some(parentOf) when
    * alpha-acyclic. Driver-side, O(n^2 * vars) on a handful of leaves. */
  private def joinTree(hyperedges: Seq[Set[Long]]): Option[Map[Int, Int]] = {
    var alive = hyperedges.indices.toList
    val parentOf = scala.collection.mutable.Map[Int, Int]()
    var progress = true
    while (alive.size > 1 && progress) {
      progress = false
      val ear = alive.iterator.flatMap { e =>
        val others = alive.filter(_ != e)
        val rest = hyperedges(e).filter(v => others.exists(o => hyperedges(o)(v)))
        others.find(w => rest.subsetOf(hyperedges(w))).map(w => (e, w))
      }.nextOption()
      ear.foreach { case (e, w) =>
        parentOf(e) = w
        alive = alive.filter(_ != e)
        progress = true
      }
    }
    if (alive.size > 1) None else Some(parentOf.toMap)
  }

  /** Root-first order implied by parentOf. */
  private def topoOrder(parentOf: Map[Int, Int], n: Int): Seq[Int] = {
    val children = parentOf.toSeq.groupBy(_._2).map { case (p, ks) => p -> ks.map(_._1) }
      .withDefaultValue(Nil)
    val root = (0 until n).find(!parentOf.contains(_)).get
    val buf = scala.collection.mutable.ArrayBuffer[Int]()
    def walk(x: Int): Unit = { buf += x; children(x).foreach(walk) }
    walk(root)
    buf.toSeq
  }
}
