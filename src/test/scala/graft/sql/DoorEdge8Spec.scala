package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

/** Eighth adversarial battery (r8): the freshly-landed `/*+ ROOT(x) */`
  * SQL-comment hint crossed with every other door feature — fast
  * aggregates, ROLLUP, outer peel, windows, set ops, CTE inlining,
  * ranked chains, EXISTS/NOT-EXISTS leaf subqueries — plus degenerate
  * hint spellings (unknown names, duplicate hints, case/whitespace
  * variants, hints in branch position). The hint is a pure plan pin:
  * every shape must produce the stock answer with and without it, and
  * an invalid pin must degrade to the cost pick, never to an error or a
  * wrong answer. */
class DoorEdge8Spec extends SparkSpecBase {

  private def views(): Unit = {
    Tables.edges(spark, sfDir).createOrReplaceTempView("d8_edges")
    Tables.ratedEdges(spark, sfDir).createOrReplaceTempView("d8_rated")
  }

  /** Run each hinted shape through the door and compare to STOCK Spark
    * on the same text (Spark drops the unrecognized hint token), and to
    * the door WITHOUT the hint (hint must not change door results). */
  private def battery(shapes: Seq[(String, String)]): Unit = {
    var bad = 0
    shapes.foreach { case (name, sql) =>
      try {
        val got = CqcSql.solve(spark, sql).collect().map(_.toSeq).toSet
        val want = spark.sql(sql).collect().map(_.toSeq).toSet
        val unhinted = CqcSql.solve(spark,
          sql.replaceAll("(?is)/\\*\\+.*?\\*/", "")).collect().map(_.toSeq).toSet
        if (got != want || got != unhinted) {
          System.err.println(s"[$name] MISMATCH got=${got.take(3)} stock=${want.take(3)} unhinted=${unhinted.take(3)}")
          bad += 1
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[$name] THREW ${e.getClass.getSimpleName}: ${e.getMessage}")
          bad += 1
      }
    }
    assert(bad == 0, s"$bad hinted shapes failed")
  }

  test("ROOT hint crossed with door features matches stock and unhinted") {
    views()
    battery(Seq(
      "hint_fast_agg" ->
        """SELECT /*+ ROOT(r2) */ g1.src AS a, COUNT(*) AS n, SUM(g3.dst) AS s
          |FROM d8_edges g1, d8_edges g2, d8_edges g3
          |WHERE g1.dst = g2.src AND g2.dst = g3.src
          |GROUP BY g1.src""".stripMargin,
      "hint_rollup" ->
        """SELECT /*+ ROOT(r1) */ g1.src AS a, g2.dst AS b, COUNT(*) AS n
          |FROM d8_edges g1, d8_edges g2 WHERE g1.dst = g2.src
          |GROUP BY ROLLUP(g1.src, g2.dst)""".stripMargin,
      "hint_outer_peel" ->
        """SELECT /*+ ROOT(r0) */ g1.src AS a, COUNT(g2.dst) AS n
          |FROM d8_edges g1 LEFT JOIN d8_edges g2 ON g1.dst = g2.src
          |GROUP BY g1.src""".stripMargin,
      "hint_window" ->
        """SELECT /*+ ROOT(r1) */ g1.src AS a, g2.dst AS b,
          |       SUM(g2.dst) OVER (PARTITION BY g1.src) AS ws
          |FROM d8_edges g1, d8_edges g2 WHERE g1.dst = g2.src""".stripMargin,
      "hint_union_branches" ->
        """SELECT /*+ ROOT(r1) */ g1.src AS a, COUNT(*) AS n
          |FROM d8_edges g1, d8_edges g2 WHERE g1.dst = g2.src GROUP BY g1.src
          |UNION ALL
          |SELECT g2.dst AS a, COUNT(*) AS n
          |FROM d8_edges g1, d8_edges g2 WHERE g1.dst = g2.src GROUP BY g2.dst""".stripMargin,
      "hint_cte" ->
        """WITH c AS (SELECT src, dst FROM d8_edges WHERE src % 2 = 0)
          |SELECT /*+ ROOT(r1) */ c1.src AS a, COUNT(*) AS n
          |FROM c c1, c c2 WHERE c1.dst = c2.src GROUP BY c1.src""".stripMargin,
      "hint_ranked_chain" ->
        """SELECT /*+ ROOT(r0) */ r1.src AS a, r2.dst AS b,
          |       r1.rating + r2.rating AS s
          |FROM d8_rated r1, d8_rated r2 WHERE r1.dst = r2.src
          |ORDER BY s DESC LIMIT 5""".stripMargin,
      "hint_exists_leaf" ->
        """SELECT /*+ ROOT(r1) */ g1.src AS a, COUNT(*) AS n
          |FROM d8_edges g1, d8_edges g2
          |WHERE g1.dst = g2.src
          |  AND EXISTS (SELECT 1 FROM d8_edges e WHERE e.src = g1.src AND e.dst <> g1.dst)
          |  AND NOT EXISTS (SELECT 1 FROM d8_edges e WHERE e.src = g2.dst AND e.dst > 90)
          |GROUP BY g1.src""".stripMargin,
      "hint_alias_name" ->
        """SELECT /*+ ROOT(g2) */ g1.src AS a, g2.dst AS b
          |FROM d8_edges g1, d8_edges g2, d8_edges g3
          |WHERE g1.dst = g2.src AND g2.dst = g3.src AND g3.dst < 40""".stripMargin,
      "hint_unknown_name" ->
        """SELECT /*+ ROOT(no_such_rel) */ g1.src AS a, COUNT(*) AS n
          |FROM d8_edges g1, d8_edges g2 WHERE g1.dst = g2.src GROUP BY g1.src""".stripMargin,
      "hint_out_of_range" ->
        """SELECT /*+ ROOT(r9) */ g1.src AS a, COUNT(*) AS n
          |FROM d8_edges g1, d8_edges g2 WHERE g1.dst = g2.src GROUP BY g1.src""".stripMargin,
      "hint_duplicate" ->
        """SELECT /*+ ROOT(r1) */ /*+ ROOT(r0) */ g1.src AS a, g2.dst AS b
          |FROM d8_edges g1, d8_edges g2 WHERE g1.dst = g2.src AND g2.dst < 50""".stripMargin,
      "hint_case_whitespace" ->
        """SELECT /*+   rOoT (  R1  )   */ g1.src AS a, COUNT(*) AS n
          |FROM d8_edges g1, d8_edges g2 WHERE g1.dst = g2.src GROUP BY g1.src""".stripMargin,
      "hint_distinct_disj" ->
        """SELECT /*+ ROOT(r1) */ DISTINCT g1.src AS a, g2.dst AS b
          |FROM d8_edges g1, d8_edges g2
          |WHERE g1.dst = g2.src AND (g1.src < 10 OR g2.dst > 90)""".stripMargin
    ))
  }

  test("dry-run honors the hint: explain names the pinned root") {
    views()
    val q =
      """SELECT /*+ ROOT(r2) */ g1.src AS a, g2.dst AS b, g3.dst AS c
        |FROM d8_edges g1, d8_edges g2, d8_edges g3
        |WHERE g1.dst = g2.src AND g2.dst = g3.src""".stripMargin
    val dump = CqcSql.explain(spark, q)
    assert(dump.contains("r2"), s"pinned root missing from dry-run:\n$dump")
    // and the unhinted dump picks its own root without error
    val plain = CqcSql.explain(spark, q.replace("/*+ ROOT(r2) */", ""))
    assert(plain.nonEmpty)
  }
}
