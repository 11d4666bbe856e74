package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

/** Set operations through the SQL door: each branch routes through the
  * CQC pipeline independently (fast aggregates, semijoin reduction),
  * the combination is Spark's own positional set-op operator. */
class SetOpSpec extends SparkSpecBase {

  private def prep(): Unit =
    Tables.edges(spark, sfDir).createOrReplaceTempView("setop_edges")

  test("UNION ALL of two aggregate branches: per-branch fast-path routing") {
    prep()
    val sql =
      """SELECT g1.src AS src, COUNT(*) AS m
        |FROM setop_edges g1, setop_edges g2, setop_edges g3
        |WHERE g1.dst = g2.src AND g2.dst = g3.src
        |GROUP BY g1.src
        |UNION ALL
        |SELECT g1.src AS src, SUM(g2.dst) AS m
        |FROM setop_edges g1, setop_edges g2
        |WHERE g1.dst = g2.src
        |GROUP BY g1.src""".stripMargin
    val got = CqcSql.solve(spark, sql).collect().map(_.toSeq).groupBy(identity)
    val want = spark.sql(sql).collect().map(_.toSeq).groupBy(identity)
    assert(got.view.mapValues(_.length).toMap == want.view.mapValues(_.length).toMap)
    assert(want.nonEmpty)
    val dump = CqcSql.explain(spark, sql)
    assert(dump.contains("UNION ALL — 2 branches"))
    // BOTH branches must ride the factorized aggregate path — the join
    // under each GROUP BY never enumerates
    assert("factorized aggregate fast path".r.findAllIn(dump).size == 2)
  }

  test("UNION dedups across branches (Distinct over the positional union)") {
    prep()
    val sql =
      """SELECT src, dst FROM setop_edges WHERE src < 50
        |UNION
        |SELECT src, dst FROM setop_edges WHERE src < 80""".stripMargin
    val got = CqcSql.solve(spark, sql).collect().map(_.toSeq)
    val want = spark.sql(sql).collect().map(_.toSeq)
    assert(got.toSet == want.toSet && got.length == want.length && want.nonEmpty)
  }

  test("INTERSECT / EXCEPT (and ALL forms) match stock") {
    prep()
    for (op <- Seq("INTERSECT", "INTERSECT ALL", "EXCEPT", "EXCEPT ALL")) {
      val sql =
        s"""SELECT g1.src AS a, g2.dst AS b
           |FROM setop_edges g1, setop_edges g2 WHERE g1.dst = g2.src AND g1.src < 40
           |$op
           |SELECT g1.src AS a, g2.dst AS b
           |FROM setop_edges g1, setop_edges g2 WHERE g1.dst = g2.src AND g1.src < 20""".stripMargin
      val got = CqcSql.solve(spark, sql).collect().map(_.toSeq).groupBy(identity)
      val want = spark.sql(sql).collect().map(_.toSeq).groupBy(identity)
      assert(got.view.mapValues(_.length).toMap == want.view.mapValues(_.length).toMap,
        s"mismatch for $op")
    }
  }

  test("ORDER BY + LIMIT over a set operation re-applies on the combined frame") {
    prep()
    val sql =
      """SELECT src, dst FROM setop_edges WHERE src < 30
        |UNION ALL
        |SELECT dst AS src, src AS dst FROM setop_edges WHERE dst < 30
        |ORDER BY src, dst
        |LIMIT 25""".stripMargin
    val got = CqcSql.solve(spark, sql).collect().map(_.toSeq).toSeq
    val want = spark.sql(sql).collect().map(_.toSeq).toSeq
    // ORDER BY on all output columns -> fully deterministic sequence
    assert(got == want && want.length == 25)
  }

  test("aggregate OVER a union leaf: the set op recurses as a nested block") {
    prep()
    val sql =
      """SELECT u.src AS src, COUNT(*) AS n, SUM(u.dst) AS s
        |FROM (SELECT g1.src AS src, g2.dst AS dst
        |      FROM setop_edges g1, setop_edges g2 WHERE g1.dst = g2.src
        |      UNION ALL
        |      SELECT src, dst FROM setop_edges WHERE src < 40) u
        |GROUP BY u.src""".stripMargin
    val got = CqcSql.solve(spark, sql).collect().map(_.toSeq).toSet
    val want = spark.sql(sql).collect().map(_.toSeq).toSet
    assert(got == want && want.nonEmpty)
    // the union leaf routes through the set-op door, not stock fallback
    assert(CqcSql.explain(spark, sql).contains("UNION ALL — 2 branches"))
  }

  test("nested unions (three branches) combine positionally") {
    prep()
    val sql =
      """SELECT src AS a FROM setop_edges WHERE src < 10
        |UNION ALL
        |SELECT dst FROM setop_edges WHERE dst < 10
        |UNION
        |SELECT src + 1 FROM setop_edges WHERE src < 5""".stripMargin
    val got = CqcSql.solve(spark, sql).collect().map(_.toSeq)
    val want = spark.sql(sql).collect().map(_.toSeq)
    assert(got.toSet == want.toSet && got.length == want.length && want.nonEmpty)
  }
}
