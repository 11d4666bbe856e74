package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

/** Seventh adversarial battery: CROSS-FEATURE interactions — windows over
  * set-op branches, ROLLUP over an outer join, ranked chains fed by CTEs,
  * three-level outer chains, correlated aggregate subqueries, HAVING with
  * subqueries, DISTINCT set ops over aggregates. Every shape must match
  * stock Spark exactly (routed or fallen back). */
class DoorEdge7Spec extends SparkSpecBase {

  private def views(): Unit = {
    Tables.edges(spark, sfDir).createOrReplaceTempView("d7_edges")
    Tables.ratedEdges(spark, sfDir).createOrReplaceTempView("d7_rated")
  }

  private def battery(shapes: Seq[(String, String)], what: String): Unit = {
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
    assert(bad == 0, s"$bad $what shapes failed")
  }

  test("cross-feature interaction shapes match stock") {
    views()
    battery(Seq(
      "window_over_union" ->
        """SELECT k, n, SUM(n) OVER (PARTITION BY k % 2) AS ws FROM (
          |  SELECT src AS k, COUNT(*) AS n FROM d7_edges GROUP BY src
          |  UNION ALL
          |  SELECT dst AS k, COUNT(*) AS n FROM d7_edges GROUP BY dst)""".stripMargin,
      "rollup_over_outer" ->
        """SELECT g1.src AS a, g2.dst AS b, COUNT(*) AS n
          |FROM d7_edges g1 LEFT JOIN d7_edges g2 ON g1.dst = g2.src
          |GROUP BY ROLLUP(g1.src, g2.dst)""".stripMargin,
      "ranked_chain_from_cte" ->
        """WITH r AS (SELECT src, dst, CAST(src + dst AS DOUBLE) AS w FROM d7_rated)
          |SELECT r1.src AS a, r2.dst AS b, r1.w + r2.w AS s
          |FROM r r1, r r2 WHERE r1.dst = r2.src
          |ORDER BY s DESC LIMIT 5""".stripMargin,
      "three_level_outer_chain" ->
        """SELECT g1.src AS a, COUNT(g2.dst) AS n2, COUNT(g3.dst) AS n3
          |FROM d7_edges g1
          |LEFT JOIN d7_edges g2 ON g1.dst = g2.src
          |LEFT JOIN d7_edges g3 ON g2.dst = g3.src
          |GROUP BY g1.src""".stripMargin,
      "correlated_agg_subquery" ->
        """SELECT g1.src AS a, COUNT(*) AS n
          |FROM d7_edges g1, d7_edges g2
          |WHERE g1.dst = g2.src
          |  AND g2.dst > (SELECT AVG(dst) FROM d7_edges e WHERE e.src = g1.src)
          |GROUP BY g1.src""".stripMargin,
      "having_with_subquery" ->
        """SELECT g1.src AS a, COUNT(*) AS n
          |FROM d7_edges g1, d7_edges g2 WHERE g1.dst = g2.src
          |GROUP BY g1.src
          |HAVING COUNT(*) > (SELECT AVG(dst) / 30 FROM d7_edges)""".stripMargin,
      "distinct_setop_over_aggs" ->
        """SELECT src AS k FROM d7_edges GROUP BY src HAVING COUNT(*) > 1
          |INTERSECT
          |SELECT dst AS k FROM d7_edges GROUP BY dst HAVING COUNT(*) > 1""".stripMargin,
      "union_of_outer_and_inner" ->
        """SELECT g1.src AS a, COUNT(g2.dst) AS n
          |FROM d7_edges g1 LEFT JOIN d7_edges g2 ON g1.dst = g2.src GROUP BY g1.src
          |UNION
          |SELECT g1.src AS a, COUNT(*) AS n
          |FROM d7_edges g1 JOIN d7_edges g2 ON g1.dst = g2.src GROUP BY g1.src""".stripMargin,
      "window_then_filter_then_join" ->
        """SELECT t.src AS a, g.dst AS b FROM (
          |  SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn
          |  FROM d7_edges) t
          |JOIN d7_edges g ON t.dst = g.src
          |WHERE t.rn = 1 ORDER BY a, b LIMIT 10""".stripMargin,
      "cte_rollup_mix" ->
        """WITH e AS (SELECT src, dst FROM d7_edges WHERE dst < 90)
          |SELECT e1.src AS a, COUNT(*) AS n, GROUPING(e1.src) AS g
          |FROM e e1, e e2 WHERE e1.dst = e2.src
          |GROUP BY ROLLUP(e1.src)""".stripMargin,
      "anti_join_then_agg" ->
        """SELECT g1.src AS a, COUNT(*) AS n FROM d7_edges g1
          |LEFT ANTI JOIN d7_edges g2 ON g1.dst = g2.src
          |GROUP BY g1.src""".stripMargin,
      "scalar_subquery_in_order" ->
        """SELECT g1.src AS a, COUNT(*) AS n
          |FROM d7_edges g1, d7_edges g2 WHERE g1.dst = g2.src
          |GROUP BY g1.src
          |ORDER BY ABS(g1.src - (SELECT AVG(src) FROM d7_edges)), a LIMIT 8""".stripMargin),
      "cross-feature")
  }
}
