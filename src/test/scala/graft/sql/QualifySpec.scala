package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame

/** QUALIFY clause through the door (r14 wave 4): the text rewrite must
  * reproduce the Snowflake/DuckDB evaluation order — windows computed
  * over the FROM/WHERE/GROUP BY result, filter on them, THEN any ORDER
  * BY/LIMIT tail — compared shape by shape against the manual
  * window-subquery rewrite stock Spark can parse. */
class QualifySpec extends SparkSpecBase {

  import spark.implicits._

  private def multiset(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap

  private def views(): Unit = {
    Seq((1L, "a", 10.0), (2L, "a", 30.0), (3L, "a", 20.0),
        (4L, "b", 5.0), (5L, "b", 50.0), (6L, "c", 7.0))
      .toDF("id", "grp", "v").createOrReplaceTempView("ql_t")
    Tables.orders(spark, sfDir).createOrReplaceTempView("ql_orders")
    Tables.customer(spark, sfDir).createOrReplaceTempView("ql_cust")
  }

  test("QUALIFY shapes match the manual window-subquery rewrite") {
    views()
    val shapes = Seq(
      // plain per-group top-1
      ("top1",
        "SELECT id, grp, v FROM ql_t QUALIFY row_number() OVER (PARTITION BY grp ORDER BY v DESC, id) = 1",
        "SELECT id, grp, v FROM (SELECT id, grp, v, row_number() OVER (PARTITION BY grp ORDER BY v DESC, id) AS rn FROM ql_t) WHERE rn = 1"),
      // window AND plain predicate mixed in one QUALIFY conjunction
      ("mixed-pred",
        "SELECT id, grp, v FROM ql_t QUALIFY rank() OVER (PARTITION BY grp ORDER BY v DESC) <= 2 AND v > 6",
        "SELECT id, grp, v FROM (SELECT id, grp, v, rank() OVER (PARTITION BY grp ORDER BY v DESC) AS rk FROM ql_t) WHERE rk <= 2 AND v > 6"),
      // QUALIFY over GROUP BY: window over the aggregate
      ("over-groupby",
        "SELECT grp, CAST(sum(v) AS DOUBLE) AS sv FROM ql_t GROUP BY grp QUALIFY row_number() OVER (ORDER BY sum(v) DESC) <= 2",
        "SELECT grp, sv FROM (SELECT grp, CAST(sum(v) AS DOUBLE) AS sv, row_number() OVER (ORDER BY sum(v) DESC) AS rn FROM ql_t GROUP BY grp) WHERE rn <= 2"),
      // a join beneath, WHERE + QUALIFY together
      ("join-where",
        """SELECT o.o_custkey AS ck, o.o_orderkey AS ok FROM ql_orders o, ql_cust c
          |WHERE o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
          |QUALIFY row_number() OVER (PARTITION BY o.o_custkey ORDER BY o.o_totalprice DESC, o.o_orderkey) <= 2""".stripMargin,
        """SELECT ck, ok FROM (
          |  SELECT o.o_custkey AS ck, o.o_orderkey AS ok,
          |         row_number() OVER (PARTITION BY o.o_custkey ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
          |  FROM ql_orders o, ql_cust c
          |  WHERE o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING') WHERE rn <= 2""".stripMargin),
      // the keyword inside a string literal must NOT trigger the rewrite
      // path's FROM-relocation incorrectly (scan is quote-aware)
      ("literal-immunity",
        "SELECT id, grp || ' QUALIFY x' AS g2 FROM ql_t QUALIFY row_number() OVER (ORDER BY id) <= 3",
        "SELECT id, g2 FROM (SELECT id, grp || ' QUALIFY x' AS g2, row_number() OVER (ORDER BY id) AS rn FROM ql_t) WHERE rn <= 3"))
    var bad = 0
    shapes.foreach { case (name, qsql, manual) =>
      try {
        val door = multiset(CqcSql.solve(spark, qsql))
        val stock = multiset(spark.sql(manual))
        if (door != stock) { System.err.println(s"[$name] MISMATCH"); bad += 1 }
        else if (door.isEmpty) { System.err.println(s"[$name] EMPTY"); bad += 1 }
      } catch { case e: Throwable =>
        System.err.println(s"[$name] THREW ${e.getClass.getSimpleName}: ${e.getMessage}")
        bad += 1
      }
    }
    assert(bad == 0, s"$bad QUALIFY shapes diverged")
  }

  test("ORDER BY + LIMIT tail applies AFTER the qualify filter") {
    views()
    // per-group top-2 gives 5 rows; LIMIT 3 must keep the 3 smallest ids
    // OF THE FILTERED set — a pre-filter limit would keep ids 1,2,3 and
    // then drop id 3 (rank 3 in grp a), yielding only 2 rows
    val out = CqcSql.solve(spark,
      """SELECT id, grp, v FROM ql_t
        |QUALIFY row_number() OVER (PARTITION BY grp ORDER BY v DESC, id) <= 2
        |ORDER BY id LIMIT 3""".stripMargin).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
  }

  test("carrier column never leaks into the output schema") {
    views()
    val df = CqcSql.solve(spark,
      "SELECT id FROM ql_t QUALIFY row_number() OVER (ORDER BY id) <= 2")
    assert(df.columns.toSeq == Seq("id"))
  }

  test("guards refuse DISTINCT and top-level set operations loudly") {
    views()
    val e1 = intercept[IllegalArgumentException] {
      CqcSql.solve(spark,
        "SELECT DISTINCT grp FROM ql_t QUALIFY row_number() OVER (ORDER BY grp) = 1")
    }
    assert(e1.getMessage.contains("DISTINCT"))
    val e2 = intercept[IllegalArgumentException] {
      CqcSql.solve(spark,
        "SELECT id FROM ql_t UNION ALL SELECT id FROM ql_t QUALIFY row_number() OVER (ORDER BY id) = 1")
    }
    assert(e2.getMessage.contains("set operation"))
  }

  test("dry-run explain reports the QUALIFY route") {
    views()
    val dump = CqcSql.explain(spark,
      "SELECT id FROM ql_t QUALIFY row_number() OVER (ORDER BY id) <= 2")
    assert(dump.contains("QUALIFY"), dump)
  }
}
