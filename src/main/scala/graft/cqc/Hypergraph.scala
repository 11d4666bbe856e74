package graft.cqc

import org.apache.spark.sql.DataFrame

/**
 * A relation in "variable space": the DataFrame's column names ARE the
 * query variables, so two relations sharing a column name are equi-joined
 * on it (natural-join semantics, like the reference's variable model in
 * sqlplus-core expression/Variable.scala).
 */
case class Rel(name: String, df: DataFrame) {
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

  /** Variable names each side references (parsed, so computed exprs work;
    * the tree is unresolved here so collect attribute NAMES — an
    * unresolved tree's `references` set is empty). */
  private def refsOf(s: String): Set[String] =
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(s)
      .collect { case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => ua.name }
      .toSet

  lazy val leftRefs: Set[String] = refsOf(left)
  lazy val rightRefs: Set[String] = refsOf(right)

  /** Both sides are bare variables (bound annotation is applicable). */
  def isSimple: Boolean = leftRefs == Set(left) && rightRefs == Set(right)
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

  /**
   * GYO reduction → join tree. Throws CyclicQueryException when the
   * hypergraph is not alpha-acyclic (cyclic queries go through
   * [[graft.wcoj]] / GHD instead).
   */
  def joinTree(rels: Seq[Rel]): JoinTree = {
    require(rels.map(_.name).distinct.size == rels.size, "relation names must be unique")
    val byName = rels.map(r => r.name -> r).toMap
    var alive = scala.collection.immutable.ListMap(rels.map(r => r.name -> r.vars): _*)
    val parent = scala.collection.mutable.Map[String, String]()

    var progress = true
    while (alive.size > 1 && progress) {
      progress = false
      val candidates = alive.iterator.flatMap { case (e, vs) =>
        val others = alive - e
        val isolated = vs.filter(v => !others.valuesIterator.exists(_.contains(v)))
        val rest = vs -- isolated
        // an "ear": its non-isolated vars are covered by a single witness
        others.collectFirst { case (w, wvs) if rest.subsetOf(wvs) => (e, w) }
      }
      candidates.nextOption() match {
        case Some((ear, witness)) =>
          parent(ear) = witness
          alive -= ear
          progress = true
        case None => ()
      }
    }

    if (alive.size > 1)
      throw new CyclicQueryException(
        s"query is cyclic; remaining hyperedges: ${alive.keys.mkString(", ")}")

    new JoinTree(byName, alive.head._1, parent.toMap)
  }

  def isAcyclic(rels: Seq[Rel]): Boolean =
    try { joinTree(rels); true } catch { case _: CyclicQueryException => false }
}
