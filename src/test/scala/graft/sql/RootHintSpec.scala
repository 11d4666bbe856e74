package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

/** SQL-comment join-tree hints: `/*+ ROOT(x) */` in plain query text
  * pins the enumeration root (reference convert/HintHandler.scala:10 —
  * there only reachable through the web UI's structured hint; here a
  * plain-SQL user writes it inline). Pinning never changes results. */
class RootHintSpec extends SparkSpecBase {

  private val q =
    """SELECT g1.src AS a, g1.dst AS b, g2.dst AS c, g3.dst AS d
      |FROM hint_edges g1, hint_edges g2, hint_edges g3
      |WHERE g1.dst = g2.src AND g2.dst = g3.src""".stripMargin

  private def view(): Unit =
    Tables.edges(spark, sfDir).createOrReplaceTempView("hint_edges")

  test("ROOT(rN) comment pins a non-default root, same result") {
    view()
    val cands = CqcSql.candidates(spark, q)
    assert(cands.size == 3, cands.map(_._1))
    val default = CqcSql.explain(spark, q)
    val defaultRoot = cands.map(_._1).find(r => default.contains(s"$r (root)")).get
    val other = cands.map(_._1).find(_ != defaultRoot).get
    val hinted = q.replace("SELECT", s"SELECT /*+ ROOT($other) */")
    val t = CqcSql.explain(spark, hinted)
    assert(t.contains(s"$other (root)"), t)
    assert(!t.contains(s"$defaultRoot (root)"), t)
    val a = CqcSql.solve(spark, q).orderBy("a", "b", "c", "d").collect().toSeq
    val b = CqcSql.solve(spark, hinted).orderBy("a", "b", "c", "d").collect().toSeq
    assert(a == b)
  }

  test("ROOT(alias) resolves the FROM alias positionally") {
    view()
    // g3 is the third FROM item -> r2
    val hinted = q.replace("SELECT", "SELECT /*+ ROOT(g3) */")
    val t = CqcSql.explain(spark, hinted)
    assert(t.contains("r2 (root)"), t)
    val a = CqcSql.solve(spark, q).count()
    assert(CqcSql.solve(spark, hinted).count() == a)
  }

  test("unknown ROOT name degrades to the cost pick, never errors") {
    view()
    val hinted = q.replace("SELECT", "SELECT /*+ ROOT(nope) */")
    assert(CqcSql.solve(spark, hinted).count() == CqcSql.solve(spark, q).count())
  }

  test("API solveWithRoot wins over the comment hint") {
    view()
    val hinted = q.replace("SELECT", "SELECT /*+ ROOT(r0) */")
    // an API pin (r2) around a text that says ROOT(r0): the API pin
    // is outermost and must hold
    val t = graft.cqc.Hypergraph.withRootHint("r2") {
      CqcSql.explain(spark, hinted)
    }
    assert(t.contains("r2 (root)"), t)
  }
}
