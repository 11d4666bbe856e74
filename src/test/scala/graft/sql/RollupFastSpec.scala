package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

/** ROLLUP / CUBE / GROUPING SETS over joins: the door computes one
  * finest-granularity aggregate through the CQC pipeline and rolls the
  * decomposable partials up per grouping set — the Expand never
  * multiplies the join. Every result is compared against stock Spark. */
class RollupFastSpec extends SparkSpecBase {

  private def prep(): Unit =
    Tables.edges(spark, sfDir).createOrReplaceTempView("ru_edges")

  private def check(sql: String, expectFast: Boolean = true): Unit = {
    val got = CqcSql.solve(spark, sql).collect().map(_.toSeq).groupBy(identity)
    val want = spark.sql(sql).collect().map(_.toSeq).groupBy(identity)
    assert(got.view.mapValues(_.length).toMap == want.view.mapValues(_.length).toMap)
    assert(want.nonEmpty)
    if (expectFast)
      assert(CqcSql.explain(spark, sql).contains("grouping-sets rollup"))
  }

  test("ROLLUP over a 3-hop join rides the rollup fast path") {
    prep()
    // both grouping keys on ONE relation -> the inner aggregate
    // factorizes (keys spanning relations still roll up, but the inner
    // pass is the generic semijoin-reduced one)
    val sql =
      """SELECT g1.src AS a, g1.dst AS b, COUNT(*) AS n, SUM(g3.dst) AS s,
        |       MIN(g3.dst) AS lo, MAX(g3.dst) AS hi
        |FROM ru_edges g1, ru_edges g2, ru_edges g3
        |WHERE g1.dst = g2.src AND g2.dst = g3.src
        |GROUP BY ROLLUP(g1.src, g1.dst)""".stripMargin
    check(sql)
    // the INNER aggregate itself must route factorized — join not enumerated
    val dump = CqcSql.explain(spark, sql)
    assert(dump.contains("factorized aggregate fast path"))
  }

  test("ROLLUP keys spanning relations: rolls up over the generic inner pass") {
    prep()
    val sql =
      """SELECT g1.src AS a, g3.dst AS b, COUNT(*) AS n, SUM(g3.dst) AS s
        |FROM ru_edges g1, ru_edges g2, ru_edges g3
        |WHERE g1.dst = g2.src AND g2.dst = g3.src
        |GROUP BY ROLLUP(g1.src, g3.dst)""".stripMargin
    check(sql)
    // tiny spec inputs take the direct route; either way it is the
    // generic enumeration + hash aggregate, not the factorized pass
    val dump = CqcSql.explain(spark, sql)
    assert(dump.contains("enumeration") && dump.contains("+ hash aggregate"))
    assert(!dump.contains("factorized aggregate fast path"))
  }

  test("CUBE with AVG and GROUPING() projections") {
    prep()
    check(
      """SELECT g1.src AS a, g2.dst AS b, AVG(g2.dst) AS m, COUNT(*) AS n,
        |       GROUPING(g1.src) AS ga, GROUPING(g2.dst) AS gb
        |FROM ru_edges g1, ru_edges g2
        |WHERE g1.dst = g2.src
        |GROUP BY CUBE(g1.src, g2.dst)""".stripMargin)
  }

  test("GROUPING SETS including the full and the empty set") {
    prep()
    check(
      """SELECT g1.src AS a, g2.dst AS b, SUM(g1.dst) AS s
        |FROM ru_edges g1, ru_edges g2
        |WHERE g1.dst = g2.src
        |GROUP BY GROUPING SETS ((g1.src, g2.dst), (g1.src), ())""".stripMargin)
  }

  test("GROUPING SETS without the full set declines to the generic path") {
    prep()
    val sql =
      """SELECT g1.src AS a, g2.dst AS b, COUNT(*) AS n
        |FROM ru_edges g1, ru_edges g2
        |WHERE g1.dst = g2.src
        |GROUP BY GROUPING SETS ((g1.src), (g2.dst))""".stripMargin
    check(sql, expectFast = false)
    assert(!CqcSql.explain(spark, sql).contains("grouping-sets rollup"))
  }

  test("computed grouping keys and grouping_id()") {
    prep()
    check(
      """SELECT g1.src % 5 AS bucket, g2.dst % 3 AS tri, COUNT(*) AS n,
        |       GROUPING_ID() AS gid
        |FROM ru_edges g1, ru_edges g2
        |WHERE g1.dst = g2.src
        |GROUP BY ROLLUP(g1.src % 5, g2.dst % 3)""".stripMargin)
  }

  test("empty input yields zero rows for every grouping set (incl. global)") {
    prep()
    val sql =
      """SELECT g1.src AS a, COUNT(*) AS n
        |FROM ru_edges g1, ru_edges g2
        |WHERE g1.dst = g2.src AND g1.src < -1
        |GROUP BY ROLLUP(g1.src)""".stripMargin
    val got = CqcSql.solve(spark, sql).collect()
    val want = spark.sql(sql).collect()
    assert(got.isEmpty && want.isEmpty)
  }

  test("decimal SUM partials (p<=18) roll up exactly") {
    prep()
    Tables.ratedEdges(spark, sfDir).createOrReplaceTempView("ru_rated")
    check(
      """SELECT r1.src AS a, r1.dst AS b,
        |       SUM(CAST(r2.rating AS DECIMAL(12,2))) AS s, COUNT(*) AS n
        |FROM ru_rated r1, ru_rated r2
        |WHERE r1.dst = r2.src
        |GROUP BY ROLLUP(r1.src, r1.dst)""".stripMargin)
  }

  test("double SUM declines the rollup fast path but stays correct") {
    prep()
    Tables.ratedEdges(spark, sfDir).createOrReplaceTempView("ru_ratedD")
    check(
      """SELECT r1.src AS a, SUM(r2.rating) AS s
        |FROM ru_ratedD r1, ru_ratedD r2
        |WHERE r1.dst = r2.src
        |GROUP BY ROLLUP(r1.src)""".stripMargin, expectFast = false)
  }

  test("seeded fuzz: random grouping-set shapes vs stock") {
    prep()
    val rnd = new scala.util.Random(20260816151L)
    val aggPool = Seq("COUNT(*)", "SUM(g2.dst)", "MIN(g2.dst)", "MAX(g1.dst)", "AVG(g2.dst)")
    for (i <- 1 to 12) {
      val keys = rnd.nextInt(3) match {
        case 0 => Seq("g1.src")
        case 1 => Seq("g1.src", "g1.dst")   // same-relation pair (factorizable)
        case 2 => Seq("g1.src", "g2.dst")   // cross-relation pair
      }
      val form = Seq("ROLLUP", "CUBE")(rnd.nextInt(2))
      val aggs = rnd.shuffle(aggPool).take(1 + rnd.nextInt(3))
      val keySel = keys.zipWithIndex.map { case (k, j) => s"$k AS k$j" }.mkString(", ")
      val aggSel = aggs.zipWithIndex.map { case (a, j) => s"$a AS v$j" }.mkString(", ")
      val sql =
        s"""SELECT $keySel, $aggSel, GROUPING_ID() AS gid
           |FROM ru_edges g1, ru_edges g2
           |WHERE g1.dst = g2.src
           |GROUP BY $form(${keys.mkString(", ")})""".stripMargin
      val got = CqcSql.solve(spark, sql).collect().map(_.toSeq).groupBy(identity)
      val want = spark.sql(sql).collect().map(_.toSeq).groupBy(identity)
      assert(got.view.mapValues(_.length).toMap == want.view.mapValues(_.length).toMap,
        s"fuzz shape $i mismatch:\n$sql")
    }
  }

  test("HAVING over ROLLUP applies on the rolled-up frame") {
    prep()
    check(
      """SELECT g1.src AS a, g1.dst AS b, COUNT(*) AS n
        |FROM ru_edges g1, ru_edges g2
        |WHERE g1.dst = g2.src
        |GROUP BY ROLLUP(g1.src, g1.dst)
        |HAVING COUNT(*) > 3""".stripMargin)
  }

  test("HAVING on a non-selected aggregate (helper Project) over CUBE") {
    prep()
    check(
      """SELECT g1.src AS a, COUNT(*) AS n
        |FROM ru_edges g1, ru_edges g2
        |WHERE g1.dst = g2.src
        |GROUP BY CUBE(g1.src)
        |HAVING SUM(g2.dst) > 500 AND MIN(g2.dst) >= 0""".stripMargin)
  }

  test("DISTINCT aggregate over grouping sets declines but stays correct") {
    prep()
    check(
      """SELECT g1.src AS a, COUNT(DISTINCT g2.dst) AS n
        |FROM ru_edges g1, ru_edges g2
        |WHERE g1.dst = g2.src
        |GROUP BY ROLLUP(g1.src)""".stripMargin, expectFast = false)
  }
}
