package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

class DoorEdgeSpec extends SparkSpecBase {
  test("adversarial door shapes match stock (computed GROUP BY, hidden ORDER BY agg, rank-likes, unions, subqueries)") {
    Tables.edges(spark, sfDir).createOrReplaceTempView("de_edges")
    Tables.ratedEdges(spark, sfDir).createOrReplaceTempView("de_rated")
    Tables.orders(spark, sfDir).createOrReplaceTempView("de_orders")
    val shapes = Seq(
      // computed GROUP BY key
      "gb_computed" ->
        """SELECT g1.src % 5 AS k, COUNT(*) AS n
          |FROM de_edges g1, de_edges g2 WHERE g1.dst = g2.src
          |GROUP BY g1.src % 5""".stripMargin,
      // COUNT(DISTINCT) over a join
      "cnt_distinct" ->
        """SELECT g1.src AS k, COUNT(DISTINCT g2.dst) AS nd
          |FROM de_edges g1, de_edges g2 WHERE g1.dst = g2.src
          |GROUP BY g1.src""".stripMargin,
      // global aggregate, no GROUP BY
      "global_agg" ->
        """SELECT COUNT(*) AS n, SUM(g2.dst) AS s
          |FROM de_edges g1, de_edges g2 WHERE g1.dst = g2.src""".stripMargin,
      // ORDER BY an aggregate not in the SELECT list
      "order_hidden" ->
        """SELECT g1.src AS k, COUNT(*) AS n
          |FROM de_edges g1, de_edges g2 WHERE g1.dst = g2.src
          |GROUP BY g1.src ORDER BY SUM(g2.dst) DESC, g1.src ASC LIMIT 5""".stripMargin,
      // SUM(CASE WHEN)
      "sum_case" ->
        """SELECT g1.src AS k,
          |       SUM(CASE WHEN g2.dst > 50 THEN 1 ELSE 0 END) AS hi
          |FROM de_edges g1, de_edges g2 WHERE g1.dst = g2.src
          |GROUP BY g1.src""".stripMargin,
      // UNION ALL of two joins
      "union_all" ->
        """SELECT g1.src AS k FROM de_edges g1, de_edges g2 WHERE g1.dst = g2.src AND g1.src < 3
          |UNION ALL
          |SELECT g1.dst AS k FROM de_edges g1, de_edges g2 WHERE g1.dst = g2.src AND g1.src > 96""".stripMargin,
      // scalar subquery in SELECT
      "scalar_select" ->
        """SELECT g1.src AS k, COUNT(*) AS n,
          |       (SELECT MAX(dst) FROM de_edges) AS mx
          |FROM de_edges g1, de_edges g2 WHERE g1.dst = g2.src
          |GROUP BY g1.src""".stripMargin,
      // window + DISTINCT
      "win_distinct" ->
        """SELECT DISTINCT g1.src AS k,
          |       COUNT(*) OVER (PARTITION BY g1.src % 2) AS w
          |FROM de_edges g1, de_edges g2 WHERE g1.dst = g2.src""".stripMargin,
      // lag/lead through the door
      "win_lag" ->
        """SELECT o.o_orderkey AS k,
          |       LAG(o.o_orderkey, 1) OVER (PARTITION BY o.o_custkey ORDER BY o.o_orderdate, o.o_orderkey) AS prev
          |FROM de_orders o, de_edges g WHERE o.o_custkey % 100 = g.src AND g.dst < 3""".stripMargin,
      // NTILE + PERCENT_RANK (rank-likes with the fallback)
      "win_ranklike" ->
        """SELECT g1.src AS k, COUNT(*) AS n,
          |       NTILE(4) OVER (ORDER BY COUNT(*) DESC, g1.src) AS q,
          |       PERCENT_RANK() OVER (ORDER BY COUNT(*), g1.src) AS pr
          |FROM de_edges g1, de_edges g2 WHERE g1.dst = g2.src
          |GROUP BY g1.src""".stripMargin
    )
    var bad = 0
    for ((name, sql) <- shapes) {
      try {
        val got = CqcSql.solve(spark, sql).collect().map(_.toSeq).toSet
        val want = spark.sql(sql).collect().map(_.toSeq).toSet
        if (got != want) { println(s"MISMATCH $name"); bad += 1 }
        else println(s"OK $name (${want.size} rows)")
      } catch {
        case e: Throwable => println(s"CRASH $name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(150)}"); bad += 1
      }
    }
    assert(bad == 0, s"$bad adversarial shapes failed")
  }
}
