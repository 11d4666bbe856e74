package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

class DoorEdge3Spec extends SparkSpecBase {
  test("type-focused door shapes match stock (date/string/decimal comparisons, NULL join keys)") {
    Tables.orders(spark, sfDir).createOrReplaceTempView("dt_orders")
    Tables.customer(spark, sfDir).createOrReplaceTempView("dt_customer")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("dt_lineitem")
    // a view with NULL join keys: NULL must join nothing, and semijoin
    // reduction must not resurrect it
    spark.sql(
      """SELECT CASE WHEN src % 7 = 0 THEN NULL ELSE src END AS src, dst
        |FROM (SELECT DISTINCT l_orderkey % 50 AS src, l_partkey % 50 AS dst
        |      FROM dt_lineitem WHERE l_linenumber = 1)""".stripMargin)
      .createOrReplaceTempView("dt_nulledges")
    val shapes = Seq(
      "date_cmp_cross" ->
        """SELECT o1.o_orderkey AS k1, o2.o_orderkey AS k2
          |FROM dt_orders o1, dt_orders o2
          |WHERE o1.o_custkey = o2.o_custkey AND o1.o_orderkey <> o2.o_orderkey
          |  AND o1.o_orderdate < o2.o_orderdate
          |  AND o2.o_orderdate < o1.o_orderdate + INTERVAL 30 DAYS""".stripMargin,
      "string_cmp_cross" ->
        """SELECT c.c_custkey AS k, COUNT(*) AS n
          |FROM dt_customer c, dt_orders o
          |WHERE c.c_custkey = o.o_custkey AND c.c_name > o.o_orderpriority
          |GROUP BY c.c_custkey""".stripMargin,
      "decimal_cmp_cross" ->
        """SELECT COUNT(*) AS n
          |FROM dt_customer c, dt_orders o
          |WHERE c.c_custkey = o.o_custkey AND c.c_acctbal * 2 < o.o_totalprice""".stripMargin,
      "null_keys_join" ->
        """SELECT COUNT(*) AS n, COUNT(g1.src) AS nn
          |FROM dt_nulledges g1, dt_nulledges g2 WHERE g1.dst = g2.src""".stripMargin,
      "null_keys_agg" ->
        """SELECT g1.src AS k, COUNT(*) AS n, SUM(g2.dst) AS s
          |FROM dt_nulledges g1, dt_nulledges g2 WHERE g1.dst = g2.src
          |GROUP BY g1.src""".stripMargin,
      "neg_ranked" ->
        """SELECT g1.src AS a, g2.dst AS c, (g1.dst - 25) + (g2.dst - 25) AS total_rank
          |FROM (SELECT src, dst FROM dt_nulledges WHERE src IS NOT NULL) g1,
          |     (SELECT src, dst FROM dt_nulledges WHERE src IS NOT NULL) g2
          |WHERE g1.dst = g2.src
          |ORDER BY total_rank DESC, a ASC, c ASC LIMIT 8""".stripMargin,
      "ts_extract_group" ->
        """SELECT EXTRACT(MONTH FROM o.o_orderdate) AS m, COUNT(*) AS n,
          |       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS s
          |FROM dt_orders o, dt_customer c
          |WHERE o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
          |GROUP BY EXTRACT(MONTH FROM o.o_orderdate)""".stripMargin,
      "between_cross" ->
        """SELECT COUNT(*) AS n
          |FROM dt_customer c, dt_orders o
          |WHERE c.c_custkey = o.o_custkey
          |  AND o.o_totalprice BETWEEN c.c_acctbal AND c.c_acctbal * 100""".stripMargin,
      "like_in_isnull" ->
        """SELECT c.c_mktsegment AS seg, COUNT(*) AS n
          |FROM dt_customer c, dt_orders o
          |WHERE c.c_custkey = o.o_custkey
          |  AND c.c_mktsegment LIKE 'B%'
          |  AND o.o_orderpriority IN ('1-URGENT', '2-HIGH')
          |  AND o.o_orderstatus IS NOT NULL
          |GROUP BY c.c_mktsegment""".stripMargin
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
    assert(bad == 0, s"$bad type shapes failed")
  }

  test("PIVOT over a join: pivotfirst rebuild fails safe to stock, result correct") {
    Tables.edges(spark, sfDir).createOrReplaceTempView("dt_edges")
    // pivotfirst calls dataType on its children DURING transform, so the
    // door's attr renaming cannot rebuild it — guarded stock fallback
    val sql =
      """SELECT * FROM (
        |  SELECT g1.src AS a, g2.dst % 2 AS par, g2.dst AS v
        |  FROM dt_edges g1, dt_edges g2 WHERE g1.dst = g2.src)
        |PIVOT (SUM(v) AS s, COUNT(*) AS c FOR par IN (0 AS even, 1 AS odd))""".stripMargin
    val got = CqcSql.solve(spark, sql).collect().map(_.toSeq).toSet
    val want = spark.sql(sql).collect().map(_.toSeq).toSet
    assert(got == want && want.nonEmpty)
    assert(CqcSql.explain(spark, sql).contains("aggregate rebuild failed"))
  }
}
