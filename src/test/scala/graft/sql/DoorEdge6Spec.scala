package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

/** Sixth adversarial battery: join-syntax variants (USING / NATURAL /
  * explicit SEMI / ANTI), aggregate modifiers (FILTER clauses, multiple
  * DISTINCT aggregates, HAVING without GROUP BY), ordinal references,
  * date-interval comparisons as join predicates, inner ORDER BY + LIMIT
  * subqueries, LIMIT 0, and SORT BY / CLUSTER BY tails. Every shape must
  * match stock Spark exactly (routed or fallen back). */
class DoorEdge6Spec extends SparkSpecBase {

  private def views(): Unit = {
    Tables.edges(spark, sfDir).createOrReplaceTempView("d6_edges")
    Tables.orders(spark, sfDir).createOrReplaceTempView("d6_orders")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("d6_lineitem")
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

  test("join-syntax variants match stock") {
    views()
    battery(Seq(
      "join_using" ->
        """SELECT g1.src AS a, COUNT(*) AS n
          |FROM d6_edges g1 JOIN d6_edges g2 USING (src)
          |GROUP BY g1.src""".stripMargin,
      "natural_join_self" ->
        "SELECT COUNT(*) AS n FROM d6_edges g1 NATURAL JOIN d6_edges g2",
      "explicit_semi" ->
        """SELECT COUNT(*) AS n FROM d6_edges g1
          |LEFT SEMI JOIN d6_edges g2 ON g1.dst = g2.src""".stripMargin,
      "explicit_anti" ->
        """SELECT COUNT(*) AS n FROM d6_edges g1
          |LEFT ANTI JOIN d6_edges g2 ON g1.dst = g2.src""".stripMargin,
      "cross_keyword_with_where" ->
        """SELECT COUNT(*) AS n FROM d6_edges g1 CROSS JOIN d6_edges g2
          |WHERE g1.dst = g2.src""".stripMargin,
      "full_outer_coalesce_group" ->
        """SELECT COALESCE(g1.src, g2.dst) AS k, COUNT(*) AS n
          |FROM d6_edges g1 FULL OUTER JOIN d6_edges g2 ON g1.dst = g2.src
          |GROUP BY COALESCE(g1.src, g2.dst)""".stripMargin,
      "right_join_null_filtered" ->
        """SELECT COUNT(*) AS n
          |FROM d6_edges g1 RIGHT JOIN d6_edges g2 ON g1.dst = g2.src
          |WHERE g1.src IS NOT NULL AND g1.src < 50""".stripMargin,
      "interval_date_join_cmp" ->
        """SELECT COUNT(*) AS n
          |FROM d6_orders o JOIN d6_lineitem l ON o.o_orderkey = l.l_orderkey
          |WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY""".stripMargin),
      "join-syntax")
  }

  test("aggregate modifiers and ordinals match stock") {
    views()
    battery(Seq(
      "filter_clause_aggs" ->
        """SELECT g1.src AS a,
          |       COUNT(*) FILTER (WHERE g2.dst > 50) AS hi,
          |       SUM(g2.dst) FILTER (WHERE g2.dst % 2 = 0) AS ev
          |FROM d6_edges g1, d6_edges g2 WHERE g1.dst = g2.src
          |GROUP BY g1.src""".stripMargin,
      "multi_distinct_aggs" ->
        """SELECT COUNT(DISTINCT g1.src) AS ds, COUNT(DISTINCT g2.dst) AS dd,
          |       COUNT(*) AS n
          |FROM d6_edges g1, d6_edges g2 WHERE g1.dst = g2.src""".stripMargin,
      "group_order_by_ordinal" ->
        """SELECT g1.src AS a, COUNT(*) AS n
          |FROM d6_edges g1, d6_edges g2 WHERE g1.dst = g2.src
          |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 7""".stripMargin,
      "having_without_group" ->
        """SELECT COUNT(*) AS n FROM d6_edges g1, d6_edges g2
          |WHERE g1.dst = g2.src HAVING COUNT(*) > 0""".stripMargin,
      "inner_topk_then_join" ->
        """SELECT COUNT(*) AS n FROM
          |  (SELECT src, dst FROM d6_edges ORDER BY dst DESC LIMIT 20) t
          |JOIN d6_edges g ON t.dst = g.src""".stripMargin,
      "union_subquery_join" ->
        """SELECT COUNT(*) AS n FROM
          |  (SELECT src AS k FROM d6_edges UNION SELECT dst AS k FROM d6_edges) u
          |JOIN d6_edges g ON u.k = g.src""".stripMargin,
      "limit_zero" ->
        """SELECT g1.src AS a FROM d6_edges g1, d6_edges g2
          |WHERE g1.dst = g2.src LIMIT 0""".stripMargin,
      "sort_by_tail" ->
        """SELECT g1.src AS a, COUNT(*) AS n
          |FROM d6_edges g1, d6_edges g2 WHERE g1.dst = g2.src
          |GROUP BY g1.src SORT BY a""".stripMargin,
      "cluster_by_tail" ->
        """SELECT g1.src AS a, g2.dst AS b
          |FROM d6_edges g1, d6_edges g2 WHERE g1.dst = g2.src
          |CLUSTER BY a""".stripMargin,
      "count_over_empty_window" ->
        """SELECT a, n, COUNT(*) OVER () AS tot FROM (
          |  SELECT g1.src AS a, COUNT(*) AS n
          |  FROM d6_edges g1, d6_edges g2 WHERE g1.dst = g2.src
          |  GROUP BY g1.src)""".stripMargin),
      "aggregate-modifier")
  }
}
