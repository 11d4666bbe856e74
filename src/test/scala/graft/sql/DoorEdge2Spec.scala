package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

class DoorEdge2Spec extends SparkSpecBase {
  test("exotic door shapes match stock (CTE, USING, CUBE, FILTER clause, LATERAL VIEW, set ops)") {
    Tables.edges(spark, sfDir).createOrReplaceTempView("dx_edges")
    Tables.ratedEdges(spark, sfDir).createOrReplaceTempView("dx_rated")
    val shapes = Seq(
      "with_cte" ->
        """WITH two_hop AS (
          |  SELECT g1.src AS a, g2.dst AS c
          |  FROM dx_edges g1, dx_edges g2 WHERE g1.dst = g2.src)
          |SELECT a, COUNT(*) AS n FROM two_hop GROUP BY a""".stripMargin,
      "using_join" ->
        """SELECT COUNT(*) AS n
          |FROM (SELECT src, dst FROM dx_edges) t1
          |JOIN (SELECT dst, src AS s2 FROM dx_edges) t2 USING (dst)""".stripMargin,
      "cube_gs" ->
        """SELECT src % 3 AS a, dst % 2 AS b, COUNT(*) AS n
          |FROM dx_edges GROUP BY CUBE (src % 3, dst % 2)""".stripMargin,
      "having_in_subq" ->
        """SELECT g1.src AS k, COUNT(*) AS n
          |FROM dx_edges g1, dx_edges g2 WHERE g1.dst = g2.src
          |GROUP BY g1.src
          |HAVING COUNT(*) IN (SELECT DISTINCT COUNT(*)
          |                    FROM dx_edges g3, dx_edges g4 WHERE g3.dst = g4.src
          |                    GROUP BY g3.src)""".stripMargin,
      "filter_clause" ->
        """SELECT g1.src AS k,
          |       COUNT(*) FILTER (WHERE g2.dst > 50) AS hi,
          |       SUM(g2.dst) FILTER (WHERE g2.dst % 2 = 0) AS ev
          |FROM dx_edges g1, dx_edges g2 WHERE g1.dst = g2.src
          |GROUP BY g1.src""".stripMargin,
      "null_safe_join" ->
        """SELECT COUNT(*) AS n
          |FROM dx_edges g1, dx_edges g2 WHERE g1.dst <=> g2.src""".stripMargin,
      "explode_lateral" ->
        """SELECT g1.src AS k, x, COUNT(*) AS n
          |FROM dx_edges g1, dx_edges g2
          |LATERAL VIEW explode(array(1, 2)) t AS x
          |WHERE g1.dst = g2.src
          |GROUP BY g1.src, x""".stripMargin,
      "intersect_q" ->
        """SELECT g1.src AS k FROM dx_edges g1, dx_edges g2 WHERE g1.dst = g2.src
          |INTERSECT
          |SELECT src AS k FROM dx_edges""".stripMargin,
      "case_group" ->
        """SELECT CASE WHEN g1.src < 50 THEN 'lo' ELSE 'hi' END AS bucket, COUNT(*) AS n
          |FROM dx_edges g1, dx_edges g2 WHERE g1.dst = g2.src
          |GROUP BY CASE WHEN g1.src < 50 THEN 'lo' ELSE 'hi' END""".stripMargin,
      "win_over_win_input" ->
        """SELECT k, n, SUM(n) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS run
          |FROM (SELECT g1.src AS k, COUNT(*) AS n
          |      FROM dx_edges g1, dx_edges g2 WHERE g1.dst = g2.src
          |      GROUP BY g1.src) t""".stripMargin,
      "orderby_expr" ->
        """SELECT g1.src AS k, COUNT(*) AS n
          |FROM dx_edges g1, dx_edges g2 WHERE g1.dst = g2.src
          |GROUP BY g1.src ORDER BY n % 7 DESC, k LIMIT 6""".stripMargin,
      "agg_arith" ->
        """SELECT g1.src AS k, SUM(g2.dst) * 2 + COUNT(*) AS mixed
          |FROM dx_edges g1, dx_edges g2 WHERE g1.dst = g2.src
          |GROUP BY g1.src""".stripMargin
    )
    var bad = 0
    for ((name, sql) <- shapes) {
      try {
        val got = CqcSql.solve(spark, sql).collect().map(_.toSeq).toSet
        val want = spark.sql(sql).collect().map(_.toSeq).toSet
        if (got != want) { println(s"MISMATCH $name: got ${got.size} want ${want.size}"); bad += 1 }
        else println(s"OK $name (${want.size} rows)")
      } catch {
        case e: Throwable => println(s"CRASH $name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(150)}"); bad += 1
      }
    }
    assert(bad == 0, s"$bad exotic shapes failed")
  }
}
