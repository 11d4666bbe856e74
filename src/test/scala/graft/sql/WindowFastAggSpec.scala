package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

/** Window OVER a factorizable aggregate: the aggregate block under the
  * Window recurses through the door, so the join beneath must ride the
  * message-passing fast path (no enumeration), with the window applied
  * on the per-group frame. */
class WindowFastAggSpec extends SparkSpecBase {
  test("SUM(SUM(x)) OVER (PARTITION BY ...) routes the join through messages") {
    Tables.edges(spark, sfDir).createOrReplaceTempView("wfa_edges_s")
    val sql =
      """SELECT g1.src AS a,
        |       SUM(g3.dst) AS s,
        |       SUM(SUM(g3.dst)) OVER (PARTITION BY g1.src % 5) AS ws
        |FROM wfa_edges_s g1, wfa_edges_s g2, wfa_edges_s g3
        |WHERE g1.dst = g2.src AND g2.dst = g3.src
        |GROUP BY g1.src""".stripMargin
    // pin the SCALE shape (tiny spec inputs would gate the message path
    // onto the direct route, where the reducer semijoins rightly vanish)
    spark.conf.set("spark.graft.direct.threshold", "0")
    val df = try CqcSql.solve(spark, sql)
    finally spark.conf.unset("spark.graft.direct.threshold")
    val got = df.collect().map(_.toSeq).toSet
    val want = spark.sql(sql).collect().map(_.toSeq).toSet
    assert(got == want && want.nonEmpty)
    // the nested aggregate leaf must have taken the factorized path: the
    // physical tree carries the message columns (__sum/__cnt) and the
    // semijoin reduction, not one flat enumerate-then-aggregate
    val ep = df.queryExecution.executedPlan.toString()
    assert(ep.contains("__sum"), "expected message-passing sum columns in the plan")
    assert(ep.contains("LeftSemi"), "expected semijoin reduction under the aggregate")
  }

  test("window-over-aggregate composes with HAVING, ORDER BY/LIMIT, and multiple specs") {
    Tables.edges(spark, sfDir).createOrReplaceTempView("wfa_edges_h")
    // HAVING under the window chain
    val sql1 =
      """SELECT g1.src AS a, COUNT(*) AS n,
        |       SUM(COUNT(*)) OVER (PARTITION BY g1.src % 3) AS wn
        |FROM wfa_edges_h g1, wfa_edges_h g2
        |WHERE g1.dst = g2.src
        |GROUP BY g1.src HAVING COUNT(*) > 2""".stripMargin
    // ORDER BY + LIMIT on top of the windowed aggregate (deterministic ties)
    val sql2 =
      """SELECT g1.src AS a, SUM(g2.dst) AS s,
        |       MAX(SUM(g2.dst)) OVER (PARTITION BY g1.src % 4) AS wmax
        |FROM wfa_edges_h g1, wfa_edges_h g2
        |WHERE g1.dst = g2.src
        |GROUP BY g1.src
        |ORDER BY s DESC, a ASC LIMIT 7""".stripMargin
    // two distinct window specs over the same aggregate
    val sql3 =
      """SELECT g1.src AS a, COUNT(*) AS n,
        |       SUM(COUNT(*)) OVER (PARTITION BY g1.src % 2) AS w1,
        |       CAST(RANK() OVER (ORDER BY COUNT(*) DESC, g1.src ASC) AS BIGINT) AS w2
        |FROM wfa_edges_h g1, wfa_edges_h g2
        |WHERE g1.dst = g2.src
        |GROUP BY g1.src""".stripMargin
    for (sql <- Seq(sql1, sql2, sql3)) {
      val got = CqcSql.solve(spark, sql).collect().map(_.toSeq)
      val want = spark.sql(sql).collect().map(_.toSeq)
      assert(got.toSet == want.toSet && want.nonEmpty, s"mismatch for: $sql")
      if (sql.contains("LIMIT")) assert(got.toSeq == want.toSeq, s"order mismatch: $sql")
    }
  }
}
