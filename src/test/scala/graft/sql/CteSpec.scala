package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

/** WITH-clause (CTE) inlining before decomposition: CTE bodies become
  * visible join structure (semijoin reduction + factorized aggregates),
  * multi-referenced CTEs inline once per reference with remapped
  * attributes, CTEs-referencing-CTEs recurse, and non-deterministic
  * defs decline inlining (stock fallback keeps once-per-def semantics). */
class CteSpec extends SparkSpecBase {

  private def view(): Unit =
    Tables.edges(spark, sfDir).createOrReplaceTempView("cte_edges")

  test("CTE self-join aggregate inlines and rides the factorized fast path") {
    view()
    val q =
      """WITH e AS (SELECT src, dst FROM cte_edges WHERE src <> dst)
        |SELECT g1.src AS k, COUNT(*) AS n, CAST(SUM(g3.dst) AS BIGINT) AS s
        |FROM e g1, e g2, e g3
        |WHERE g1.dst = g2.src AND g2.dst = g3.src
        |GROUP BY g1.src""".stripMargin
    val t = CqcSql.explain(spark, q)
    assert(t.contains("inlined WITH-clause"), t)
    assert(t.contains("factorized aggregate fast path"), t)
    val mine = CqcSql.solve(spark, q).orderBy("k").collect().toSeq
    val stock = spark.sql(q).orderBy("k").collect().toSeq
    assert(mine == stock)
  }

  test("CTE referencing an earlier CTE recurses through the door") {
    view()
    val q =
      """WITH e AS (SELECT src, dst FROM cte_edges),
        |     f AS (SELECT e1.src AS a, e2.dst AS b FROM e e1, e e2 WHERE e1.dst = e2.src)
        |SELECT COUNT(*) AS n, CAST(SUM(e.dst) AS BIGINT) AS s
        |FROM f, e WHERE f.b = e.src""".stripMargin
    val t = CqcSql.explain(spark, q)
    assert(t.contains("inlined WITH-clause"), t)
    val mine = CqcSql.solve(spark, q).collect().toSeq
    val stock = spark.sql(q).collect().toSeq
    assert(mine == stock)
  }

  test("non-deterministic CTE declines inlining but stays correct") {
    view()
    // rand() in the def: inlining a multi-referenced def would
    // re-evaluate it per reference — must stay on the WithCTE plan
    val q =
      """WITH r AS (SELECT src, rand() AS x FROM cte_edges)
        |SELECT COUNT(*) AS n FROM r a, r b WHERE a.src = b.src AND a.x >= 0 AND b.x >= 0""".stripMargin
    val t = CqcSql.explain(spark, q)
    assert(!t.contains("inlined WITH-clause"), t)
    val n = CqcSql.solve(spark, q).collect().head.getLong(0)
    val stock = spark.sql(q).collect().head.getLong(0)
    assert(n == stock)
  }

  test("CTE under ORDER BY / LIMIT peels as usual") {
    view()
    val q =
      """WITH e AS (SELECT src, dst FROM cte_edges)
        |SELECT g1.src AS a, g2.dst AS b FROM e g1, e g2
        |WHERE g1.dst = g2.src
        |ORDER BY a DESC, b ASC LIMIT 7""".stripMargin
    val mine = CqcSql.solve(spark, q).collect().toSeq
    val stock = spark.sql(q).collect().toSeq
    assert(mine == stock)
  }
}
