package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

/** Fifth adversarial battery: WITH-clause interactions — CTEs shadowing
  * real table names, CTEs feeding set-op branches, outer joins and
  * windows over CTE bodies, a CTE inside a subquery predicate, and
  * nested WITH inside a CTE definition. Every shape must match stock
  * Spark exactly (inlined or not). */
class DoorEdge5Spec extends SparkSpecBase {

  private def views(): Unit = {
    Tables.edges(spark, sfDir).createOrReplaceTempView("d5_edges")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("d5_lineitem")
  }

  test("WITH-interaction door shapes match stock") {
    views()
    val shapes = Seq(
      // CTE SHADOWS a real temp view name: references must bind to the
      // CTE, not the table (analyzer handles it; the door must not
      // resurrect the shadowed table after inlining)
      "cte_shadows_view" ->
        """WITH d5_edges AS (SELECT src, dst FROM d5_edges WHERE src < 50)
          |SELECT COUNT(*) AS n FROM d5_edges g1, d5_edges g2
          |WHERE g1.dst = g2.src""".stripMargin,
      // one CTE feeding both branches of a set op
      "cte_in_union_branches" ->
        """WITH e AS (SELECT src, dst FROM d5_edges)
          |SELECT src AS k, COUNT(*) AS n FROM e GROUP BY src
          |UNION ALL
          |SELECT dst AS k, COUNT(*) AS n FROM e GROUP BY dst""".stripMargin,
      // outer join over a CTE body
      "cte_outer_join" ->
        """WITH e AS (SELECT src, dst FROM d5_edges WHERE dst < 80)
          |SELECT g1.src AS a, COUNT(g2.dst) AS n
          |FROM e g1 LEFT JOIN e g2 ON g1.dst = g2.src
          |GROUP BY g1.src""".stripMargin,
      // window over a CTE self-join aggregate
      "cte_window" ->
        """WITH e AS (SELECT src, dst FROM d5_edges)
          |SELECT a, s, SUM(s) OVER (PARTITION BY a % 3) AS ws FROM (
          |  SELECT g1.src AS a, SUM(g2.dst) AS s FROM e g1, e g2
          |  WHERE g1.dst = g2.src GROUP BY g1.src)""".stripMargin,
      // CTE referenced inside a subquery predicate
      "cte_in_subquery_pred" ->
        """WITH hot AS (SELECT src FROM d5_edges GROUP BY src HAVING COUNT(*) > 2)
          |SELECT COUNT(*) AS n FROM d5_edges g
          |WHERE g.src IN (SELECT src FROM hot)""".stripMargin,
      // CTE defined in terms of ANOTHER CTE, used in an aggregate join
      "cte_chain_three" ->
        """WITH a AS (SELECT src, dst FROM d5_edges),
          |     b AS (SELECT src, dst FROM a WHERE src % 2 = 0),
          |     c AS (SELECT b1.src, b2.dst FROM b b1, b b2 WHERE b1.dst = b2.src)
          |SELECT COUNT(*) AS n, SUM(c.dst) AS s FROM c""".stripMargin,
      // DISTINCT + ORDER BY + LIMIT over a CTE join
      "cte_distinct_topk" ->
        """WITH e AS (SELECT src, dst FROM d5_edges)
          |SELECT DISTINCT g1.src AS a FROM e g1, e g2
          |WHERE g1.dst = g2.src ORDER BY a DESC LIMIT 5""".stripMargin,
      // CTE over a DERIVED table with an aggregate inside
      "cte_over_aggregate" ->
        """WITH deg AS (SELECT src, COUNT(*) AS cnt FROM d5_edges GROUP BY src)
          |SELECT g.src AS k, MAX(d.cnt) AS mc
          |FROM d5_edges g, deg d WHERE g.src = d.src
          |GROUP BY g.src""".stripMargin)

    var bad = 0
    shapes.foreach { case (name, sql) =>
      try {
        val got = CqcSql.solve(spark, sql).collect().map(_.toSeq).toSet
        val want = spark.sql(sql).collect().map(_.toSeq).toSet
        if (got != want) {
          System.err.println(s"[$name] MISMATCH\n got=${got.take(5)}\n want=${want.take(5)}")
          bad += 1
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[$name] THREW ${e.getClass.getSimpleName}: ${e.getMessage}")
          bad += 1
      }
    }
    assert(bad == 0, s"$bad WITH-interaction shapes failed")
  }

  test("exotic top shapes match stock (generators, LATERAL, VALUES, ALL, UNPIVOT)") {
    views()
    val shapes = Seq(
      "exists_in_select" ->
        """SELECT g1.src AS a, EXISTS(SELECT 1 FROM d5_edges e WHERE e.src = g1.dst) AS h
          |FROM d5_edges g1, d5_edges g2 WHERE g1.dst = g2.src""".stripMargin,
      "in_pred_in_select" ->
        """SELECT g1.src AS a, g1.dst IN (SELECT src FROM d5_edges WHERE dst < 10) AS h
          |FROM d5_edges g1, d5_edges g2 WHERE g1.dst = g2.src""".stripMargin,
      "explode_over_join" ->
        """SELECT a, x FROM (SELECT g1.src AS a, array(g1.dst, g2.dst) AS arr
          |  FROM d5_edges g1, d5_edges g2 WHERE g1.dst = g2.src)
          |LATERAL VIEW explode(arr) t AS x""".stripMargin,
      "lateral_subquery" ->
        """SELECT g1.src, l.m FROM d5_edges g1,
          |LATERAL (SELECT MAX(dst) AS m FROM d5_edges e WHERE e.src = g1.dst) l""".stripMargin,
      "values_leaf" ->
        """SELECT v.k, COUNT(*) AS n FROM (VALUES (1), (2), (3)) AS v(k), d5_edges g
          |WHERE g.src % 4 = v.k GROUP BY v.k""".stripMargin,
      "group_by_all" ->
        """SELECT g1.src AS a, COUNT(*) AS n FROM d5_edges g1, d5_edges g2
          |WHERE g1.dst = g2.src GROUP BY ALL""".stripMargin,
      "order_by_all" ->
        """SELECT g1.src AS a, g2.dst AS b FROM d5_edges g1, d5_edges g2
          |WHERE g1.dst = g2.src ORDER BY ALL LIMIT 5""".stripMargin,
      "distribute_by" ->
        """SELECT g1.src AS a, g2.dst AS b FROM d5_edges g1, d5_edges g2
          |WHERE g1.dst = g2.src DISTRIBUTE BY a""".stripMargin,
      "tablesample_full" ->
        """SELECT COUNT(*) AS n FROM d5_edges TABLESAMPLE (100 PERCENT) g1, d5_edges g2
          |WHERE g1.dst = g2.src""".stripMargin,
      "unpivot" ->
        "SELECT COUNT(*) AS n FROM (SELECT * FROM d5_edges UNPIVOT (v FOR c IN (src, dst)))")
    var bad = 0
    shapes.foreach { case (name, sql) =>
      try {
        val got = CqcSql.solve(spark, sql).collect().map(_.toSeq).toSet
        val want = spark.sql(sql).collect().map(_.toSeq).toSet
        if (got != want) { System.err.println(s"[$name] MISMATCH"); bad += 1 }
      } catch {
        case e: Throwable =>
          System.err.println(s"[$name] THREW ${e.getClass.getSimpleName}: ${e.getMessage}")
          bad += 1
      }
    }
    assert(bad == 0, s"$bad exotic top shapes failed")
  }

  test("scalar subqueries in the SELECT list: uncorrelated rides, correlated falls back") {
    views()
    // uncorrelated: independently evaluable — keeps the fast path
    val q1 =
      """SELECT g1.src AS a, (SELECT MAX(dst) FROM d5_edges) AS mx, COUNT(*) AS n
        |FROM d5_edges g1, d5_edges g2 WHERE g1.dst = g2.src GROUP BY g1.src""".stripMargin
    val t1 = CqcSql.explain(spark, q1)
    assert(t1.contains("factorized aggregate fast path"), t1)
    assert(CqcSql.solve(spark, q1).orderBy("a").collect().toSeq ==
      spark.sql(q1).orderBy("a").collect().toSeq)
    // correlated in SELECT: outer refs cannot survive CQC renaming —
    // must fall back to stock (this crashed with an internal error
    // before the guard), and must still be CORRECT
    val q2 =
      """SELECT g1.src AS a, (SELECT COUNT(*) FROM d5_edges e WHERE e.src = g1.src) AS c
        |FROM d5_edges g1, d5_edges g2 WHERE g1.dst = g2.src""".stripMargin
    val t2 = CqcSql.explain(spark, q2)
    assert(t2.contains("stock fallback: correlated subquery in the SELECT list"), t2)
    assert(CqcSql.solve(spark, q2).orderBy("a", "c").collect().toSeq ==
      spark.sql(q2).orderBy("a", "c").collect().toSeq)
  }
}
