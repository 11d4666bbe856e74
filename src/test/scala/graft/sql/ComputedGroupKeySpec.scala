package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

/** Computed GROUP BY keys: single-relation computed keys derive onto
  * their home leaf and ride the factorized fast path; keys spanning
  * relations stay on the (correct) generic path. */
class ComputedGroupKeySpec extends SparkSpecBase {
  private def nAggs(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size

  test("computed group key rides the message-passing fast path") {
    Tables.edges(spark, sfDir).createOrReplaceTempView("cgk_edges")
    val sql =
      """SELECT g1.src % 5 AS k, COUNT(*) AS n, SUM(g3.dst) AS s
        |FROM cgk_edges g1, cgk_edges g2, cgk_edges g3
        |WHERE g1.dst = g2.src AND g2.dst = g3.src
        |GROUP BY g1.src % 5""".stripMargin
    val df = CqcSql.solve(spark, sql)
    assert(df.collect().map(_.toSeq).toSet == spark.sql(sql).collect().map(_.toSeq).toSet)
    assert(nAggs(df) > 1, s"expected message aggregates, got ${nAggs(df)}")
  }

  test("mixed plain+computed keys and HAVING on the computed key") {
    Tables.edges(spark, sfDir).createOrReplaceTempView("cgk_edges")
    val sqls = Seq(
      """SELECT g1.src AS k1, g1.dst % 2 AS k2, COUNT(*) AS n
        |FROM cgk_edges g1, cgk_edges g2 WHERE g1.dst = g2.src
        |GROUP BY g1.src, g1.dst % 2""".stripMargin,
      """SELECT g1.src % 5 AS k, COUNT(*) AS n
        |FROM cgk_edges g1, cgk_edges g2 WHERE g1.dst = g2.src
        |GROUP BY g1.src % 5 HAVING SUM(g2.dst) > 100 AND g1.src % 5 > 0""".stripMargin)
    for (sql <- sqls) {
      val got = CqcSql.solve(spark, sql).collect().map(_.toSeq).toSet
      val want = spark.sql(sql).collect().map(_.toSeq).toSet
      assert(got == want && want.nonEmpty, s"mismatch for: $sql")
    }
  }

  test("keys spanning relations decline the fast path but stay correct") {
    Tables.edges(spark, sfDir).createOrReplaceTempView("cgk_edges")
    val sql =
      """SELECT g1.src % 3 AS k1, g2.dst % 2 AS k2, COUNT(*) AS n
        |FROM cgk_edges g1, cgk_edges g2 WHERE g1.dst = g2.src
        |GROUP BY g1.src % 3, g2.dst % 2""".stripMargin
    val df = CqcSql.solve(spark, sql)
    assert(df.collect().map(_.toSeq).toSet == spark.sql(sql).collect().map(_.toSeq).toSet)
  }
}
