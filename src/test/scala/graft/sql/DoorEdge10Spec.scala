package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

/** Tenth adversarial battery (r8): degenerate inputs and NULL-semantics
  * edges. Empty leaves are the classic Yannakakis blind spot (the
  * reducer, the message passes, and the direct route must all agree
  * that an empty relation annihilates the join — and that a GLOBAL
  * aggregate over the annihilated join still returns its one row);
  * NOT IN over empty and NULL-bearing subqueries flips between
  * all-rows and no-rows on three-valued logic; EXCEPT/INTERSECT ALL
  * carry multiplicities the set-op peel must not collapse. Every shape
  * runs direct-eligible, forced-reduced, and stock, compared as
  * multisets. */
class DoorEdge10Spec extends SparkSpecBase {

  private def views(): Unit = {
    Tables.edges(spark, sfDir).createOrReplaceTempView("d10_edges")
    Tables.ratedEdges(spark, sfDir).createOrReplaceTempView("d10_rated")
  }

  private def battery(shapes: Seq[(String, String)]): Unit = {
    var bad = 0
    shapes.foreach { case (name, sql) =>
      try {
        val direct = CqcSql.solve(spark, sql).collect().map(_.toSeq)
          .groupBy(identity).view.mapValues(_.size).toMap
        graft.CacheRegistry.unpersistAll()
        spark.conf.set("spark.graft.direct.threshold", "0")
        val reduced =
          try CqcSql.solve(spark, sql).collect().map(_.toSeq)
            .groupBy(identity).view.mapValues(_.size).toMap
          finally spark.conf.unset("spark.graft.direct.threshold")
        graft.CacheRegistry.unpersistAll()
        val stock = spark.sql(sql).collect().map(_.toSeq)
          .groupBy(identity).view.mapValues(_.size).toMap
        if (direct != reduced || direct != stock) {
          System.err.println(s"[$name] MISMATCH sizes direct=${direct.size} reduced=${reduced.size} stock=${stock.size}")
          bad += 1
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[$name] THREW ${e.getClass.getSimpleName}: ${e.getMessage}")
          bad += 1
      }
    }
    assert(bad == 0, s"$bad shapes disagreed between routes")
  }

  test("degenerate and NULL-semantics shapes agree across routes") {
    views()
    battery(Seq(
      "empty_leaf_enum" ->
        """SELECT g1.src AS a, g2.dst AS b
          |FROM d10_edges g1, d10_edges g2
          |WHERE g1.dst = g2.src AND g2.dst < -1""".stripMargin,
      "empty_global_count" ->
        """SELECT COUNT(*) AS n, SUM(g1.src) AS s
          |FROM d10_edges g1, d10_edges g2
          |WHERE g1.dst = g2.src AND g2.dst < -1""".stripMargin,
      "empty_groupby" ->
        """SELECT g1.src AS a, COUNT(*) AS n
          |FROM d10_edges g1, d10_edges g2
          |WHERE g1.dst = g2.src AND g2.dst < -1
          |GROUP BY g1.src""".stripMargin,
      "empty_outer_preserved" ->
        """SELECT g1.src AS a, COUNT(g2.dst) AS n
          |FROM d10_edges g1 LEFT JOIN (SELECT * FROM d10_edges WHERE dst < -1) g2
          |  ON g1.dst = g2.src
          |GROUP BY g1.src""".stripMargin,
      "limit_zero" ->
        """SELECT g1.src AS a, g2.dst AS b
          |FROM d10_edges g1, d10_edges g2
          |WHERE g1.dst = g2.src ORDER BY a, b LIMIT 0""".stripMargin,
      "global_agg_fast" ->
        """SELECT COUNT(*) AS n, SUM(g1.src + g3.dst) AS s, MIN(g2.src) AS m
          |FROM d10_edges g1, d10_edges g2, d10_edges g3
          |WHERE g1.dst = g2.src AND g2.dst = g3.src""".stripMargin,
      "single_relation_cmp" ->
        """SELECT src AS a, dst AS b FROM d10_edges WHERE src < dst AND dst % 3 = 1""".stripMargin,
      "pure_cross_cmp" ->
        """SELECT g1.src AS a, g2.src AS b
          |FROM (SELECT * FROM d10_edges WHERE src < 3) g1,
          |     (SELECT * FROM d10_edges WHERE src < 3) g2
          |WHERE g1.src < g2.src""".stripMargin,
      "nullif_nullsafe_cross" ->
        """SELECT g1.src AS a, g2.src AS b
          |FROM (SELECT * FROM d10_edges WHERE src < 3) g1,
          |     (SELECT * FROM d10_edges WHERE src < 3) g2
          |WHERE NULLIF(g1.dst, g1.dst) <=> NULLIF(g2.dst, g2.dst)""".stripMargin,
      "count_distinct_over_join" ->
        """SELECT g1.src AS a, COUNT(DISTINCT g2.dst) AS n
          |FROM d10_edges g1, d10_edges g2
          |WHERE g1.dst = g2.src
          |GROUP BY g1.src""".stripMargin,
      "avg_having_on_avg" ->
        """SELECT g1.src AS a, AVG(g2.dst) AS m
          |FROM d10_edges g1, d10_edges g2
          |WHERE g1.dst = g2.src
          |GROUP BY g1.src HAVING AVG(g2.dst) > 10""".stripMargin,
      "orderby_hidden_agg_offset" ->
        """SELECT g1.src AS a, COUNT(*) AS n
          |FROM d10_edges g1, d10_edges g2
          |WHERE g1.dst = g2.src
          |GROUP BY g1.src ORDER BY SUM(g2.dst) DESC, a LIMIT 5 OFFSET 3""".stripMargin,
      "duplicate_output_names" ->
        """SELECT g1.src AS a, g2.dst AS a, g1.dst AS b
          |FROM d10_edges g1, d10_edges g2
          |WHERE g1.dst = g2.src AND g1.src < 5""".stripMargin,
      "in_empty_subq" ->
        """SELECT src AS a, dst AS b FROM d10_edges
          |WHERE src IN (SELECT src FROM d10_edges WHERE dst < -1)""".stripMargin,
      "not_in_empty_subq" ->
        """SELECT g1.src AS a, g2.dst AS b
          |FROM d10_edges g1, d10_edges g2
          |WHERE g1.dst = g2.src AND g1.src < 5
          |  AND g1.src NOT IN (SELECT src FROM d10_edges WHERE dst < -1)""".stripMargin,
      "not_in_null_subq" ->
        """SELECT src AS a, dst AS b FROM d10_edges
          |WHERE src NOT IN (SELECT NULLIF(src, src) FROM d10_edges)""".stripMargin,
      "intersect_all_multiplicity" ->
        """SELECT g1.src AS a, g2.dst AS b
          |FROM d10_edges g1, d10_edges g2 WHERE g1.dst = g2.src AND g1.src < 8
          |INTERSECT ALL
          |SELECT g1.src AS a, g2.dst AS b
          |FROM d10_edges g1, d10_edges g2 WHERE g1.dst = g2.src AND g2.dst < 40""".stripMargin,
      "except_all_multiplicity" ->
        """SELECT g1.src AS a, g2.dst AS b
          |FROM d10_edges g1, d10_edges g2 WHERE g1.dst = g2.src AND g1.src < 8
          |EXCEPT ALL
          |SELECT g1.src AS a, g2.dst AS b
          |FROM d10_edges g1, d10_edges g2 WHERE g1.dst = g2.src AND g2.dst < 40""".stripMargin,
      "union_one_empty_branch" ->
        """SELECT g1.src AS a, g2.dst AS b
          |FROM d10_edges g1, d10_edges g2 WHERE g1.dst = g2.src AND g1.src < 5
          |UNION ALL
          |SELECT src AS a, dst AS b FROM d10_edges WHERE dst < -1""".stripMargin,
      "rank_ties_subquery" ->
        """SELECT a, b, rk FROM (
          |  SELECT r1.src AS a, r2.dst AS b,
          |         RANK() OVER (PARTITION BY r1.src ORDER BY r1.rating + r2.rating DESC) AS rk
          |  FROM d10_rated r1, d10_rated r2 WHERE r1.dst = r2.src
          |) WHERE rk <= 3""".stripMargin,
      "scalar_subq_in_select" ->
        """SELECT g1.src AS a, g2.dst AS b,
          |       (SELECT MAX(dst) FROM d10_edges) AS mx
          |FROM d10_edges g1, d10_edges g2
          |WHERE g1.dst = g2.src AND g1.src < 5""".stripMargin
    ))
  }
}
