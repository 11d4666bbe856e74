package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame

/** r16 fallback lift: UNCORRELATED subquery predicates whose outer
  * references span several leaves route through the CQC pipeline (the
  * subquery plan rides the post-enumeration Column), instead of
  * declining the whole query to stock. r17: CORRELATED spans lift too —
  * their interior OuterReferences are rebound to the enumeration's
  * variable names and ResolveSubquery re-resolves the plan against the
  * enumerated frame; only nested-leaf and peel-correlated bindings keep
  * the stock fallback. */
class SubqSpanSpec extends SparkSpecBase {

  private def views(): Unit = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("sq_customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("sq_orders")
    Tables.nation(spark, sfDir).createOrReplaceTempView("sq_nation")
  }

  private def multiset(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap

  private def agree(sql: String): Unit = {
    val cqc = multiset(CqcSql.solve(spark, sql))
    graft.CacheRegistry.unpersistAll()
    val stock = multiset(spark.sql(sql))
    assert(cqc == stock, s"route mismatch (${cqc.size} vs ${stock.size}) for:\n$sql")
    assert(cqc.nonEmpty, s"shape exercises nothing:\n$sql")
  }

  test("scalar-subquery span routes through CQC: dry run shows the lift, no stock fallback") {
    views()
    val sql =
      """SELECT c.c_custkey AS cust, o.o_orderkey AS ord
        |FROM sq_customer c, sq_orders o
        |WHERE c.c_custkey = o.o_custkey
        |  AND o.o_totalprice + c.c_acctbal >
        |      (SELECT max(o2.o_totalprice) FROM sq_orders o2)""".stripMargin
    val plan = CqcSql.explain(spark, sql)
    assert(plan.contains("lifted 1 cross-leaf subquery"), plan)
    assert(!plan.contains("stock fallback"), plan)
    agree(sql)
  }

  test("IN-subquery span and a 3-leaf span both lift and agree with stock") {
    views()
    agree(
      """SELECT c.c_custkey AS cust, o.o_orderkey AS ord
        |FROM sq_customer c, sq_orders o
        |WHERE c.c_custkey = o.o_custkey
        |  AND (o.o_orderkey + c.c_nationkey) IN
        |      (SELECT o2.o_orderkey + 3 FROM sq_orders o2 WHERE o2.o_orderkey < 50)""".stripMargin)
    val threeLeaf =
      """SELECT c.c_custkey AS cust, n.n_name AS nname, o.o_orderkey AS ord
        |FROM sq_customer c, sq_orders o, sq_nation n
        |WHERE c.c_custkey = o.o_custkey AND c.c_nationkey = n.n_nationkey
        |  AND o.o_totalprice + c.c_acctbal + n.n_nationkey >
        |      (SELECT max(o2.o_totalprice) FROM sq_orders o2)""".stripMargin
    assert(CqcSql.explain(spark, threeLeaf)
      .contains("lifted 1 cross-leaf subquery"))
    agree(threeLeaf)
  }

  test("a CORRELATED span routes through CQC (r17): dry run shows the rebound lift") {
    views()
    val sql =
      """SELECT c.c_custkey AS cust, o.o_orderkey AS ord
        |FROM sq_customer c, sq_orders o
        |WHERE c.c_custkey = o.o_custkey
        |  AND o.o_totalprice + c.c_acctbal >
        |      (SELECT max(o2.o_totalprice) FROM sq_orders o2
        |       WHERE o2.o_custkey = c.c_custkey)""".stripMargin
    val plan = CqcSql.explain(spark, sql)
    assert(plan.contains("1 correlated, interior outer refs rebound"), plan)
    assert(!plan.contains("stock fallback"), plan)
    agree(sql)
  }

  test("correlated EXISTS and IN spans lift and agree with stock") {
    views()
    // EXISTS correlated on one leaf, top-level refs on the other
    agree(
      """SELECT c.c_custkey AS cust, o.o_orderkey AS ord
        |FROM sq_customer c, sq_orders o
        |WHERE c.c_custkey = o.o_custkey
        |  AND (o.o_orderkey < 2000 AND EXISTS
        |      (SELECT 1 FROM sq_orders o2
        |       WHERE o2.o_custkey = c.c_custkey AND o2.o_orderkey < o.o_orderkey))""".stripMargin)
    // correlated IN: the values side spans the other leaf
    agree(
      """SELECT c.c_custkey AS cust, o.o_orderkey AS ord
        |FROM sq_customer c, sq_orders o
        |WHERE c.c_custkey = o.o_custkey
        |  AND o.o_orderkey IN
        |      (SELECT min(o2.o_orderkey) FROM sq_orders o2
        |       WHERE o2.o_custkey = c.c_custkey)""".stripMargin)
  }

  test("a correlated span on a NESTED leaf still falls back to stock, correctly") {
    views()
    // the orders leaf is a derived table with a join beneath: its frame
    // is re-derived and loses the analyzer's exprIds, so the rebind
    // cannot reach a stable binding — guarded stock
    val sql =
      """SELECT c.c_custkey AS cust, j.o_orderkey AS ord
        |FROM sq_customer c,
        |     (SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        |      FROM sq_orders o JOIN sq_nation n ON o.o_custkey % 25 = n.n_nationkey) j
        |WHERE c.c_custkey = j.o_custkey
        |  AND j.o_totalprice + c.c_acctbal >
        |      (SELECT max(o2.o_totalprice) FROM sq_orders o2
        |       WHERE o2.o_custkey = c.c_custkey)""".stripMargin
    assert(CqcSql.explain(spark, sql).contains("stock fallback"))
    agree(sql)
  }

  test("capture guard: a subquery-side __sqspan_ column declines to stock, correctly") {
    views()
    // if the subquery's own relation outputs a reserved-prefix column,
    // inner-scope-first resolution of the rebound names could capture
    // it — the routing gate declines such shapes to stock outright
    spark.sql("SELECT o_custkey AS __sqspan_k, o_totalprice FROM sq_orders")
      .createOrReplaceTempView("sq_prefixed")
    val sql =
      """SELECT c.c_custkey AS cust, o.o_orderkey AS ord
        |FROM sq_customer c, sq_orders o
        |WHERE c.c_custkey = o.o_custkey
        |  AND o.o_totalprice + c.c_acctbal >
        |      (SELECT max(p.o_totalprice) FROM sq_prefixed p
        |       WHERE p.__sqspan_k = c.c_custkey)""".stripMargin
    assert(CqcSql.explain(spark, sql).contains("stock fallback"))
    agree(sql)
  }

  test("span filters decline the aggregate fast paths but keep aggregation correct") {
    views()
    // GROUP BY over the lifted span: the FAQ fast path must not swallow
    // the post-enumeration filter
    agree(
      """SELECT c.c_nationkey AS nat, CAST(count(*) AS BIGINT) AS n
        |FROM sq_customer c, sq_orders o
        |WHERE c.c_custkey = o.o_custkey
        |  AND o.o_totalprice + c.c_acctbal >
        |      (SELECT max(o2.o_totalprice) FROM sq_orders o2)
        |GROUP BY c.c_nationkey""".stripMargin)
  }
}
