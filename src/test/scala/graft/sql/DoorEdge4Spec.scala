package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

/** Fourth adversarial battery: NULL-semantics join shapes — null-safe
  * equality, IS DISTINCT FROM, NOT IN over a NULL-bearing subquery,
  * set ops over NULL rows, and equalities the hypergraph cannot use as
  * edges (computed sides, <=>) leaving relations connected only by a
  * residual predicate. */
class DoorEdge4Spec extends SparkSpecBase {
  test("null-semantics door shapes match stock") {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("d4_lineitem")
    Tables.orders(spark, sfDir).createOrReplaceTempView("d4_orders")
    spark.sql(
      """SELECT CASE WHEN src % 7 = 0 THEN NULL ELSE src END AS src, dst
        |FROM (SELECT DISTINCT l_orderkey % 50 AS src, l_partkey % 50 AS dst
        |      FROM d4_lineitem WHERE l_linenumber = 1)""".stripMargin)
      .createOrReplaceTempView("d4_nulledges")
    val shapes = Seq(
      // <=> as the ONLY inter-relation condition: no hypergraph edge —
      // must not crash, must keep NULL<=>NULL matches
      "nullsafe_only" ->
        """SELECT COUNT(*) AS n, COUNT(g1.src) AS nn
          |FROM d4_nulledges g1, d4_nulledges g2 WHERE g1.src <=> g2.src""".stripMargin,
      // <=> riding on top of a real equi-join edge (residual filter)
      "nullsafe_plus_equi" ->
        """SELECT g1.dst AS k, COUNT(*) AS n
          |FROM d4_nulledges g1, d4_nulledges g2
          |WHERE g1.dst = g2.dst AND g1.src <=> g2.src
          |GROUP BY g1.dst""".stripMargin,
      "is_distinct_from" ->
        """SELECT COUNT(*) AS n
          |FROM d4_nulledges g1, d4_nulledges g2
          |WHERE g1.dst = g2.src AND g1.src IS DISTINCT FROM g2.dst""".stripMargin,
      // computed-side equality: EqualTo but not attr=attr, so no edge
      "computed_equality_only" ->
        """SELECT COUNT(*) AS n
          |FROM d4_nulledges g1, d4_nulledges g2 WHERE g1.dst + 1 = g2.src""".stripMargin,
      // NOT IN over a subquery that yields NULLs: three-valued logic —
      // one NULL in the list empties the result
      "not_in_nulls" ->
        """SELECT COUNT(*) AS n FROM d4_nulledges g1
          |WHERE g1.dst NOT IN (SELECT src FROM d4_nulledges WHERE dst < 10)""".stripMargin,
      "in_subquery_nulls" ->
        """SELECT COUNT(*) AS n FROM d4_nulledges g1
          |WHERE g1.src IN (SELECT src FROM d4_nulledges WHERE dst < 10)""".stripMargin,
      // set ops over NULL rows: Spark treats NULLs as equal for set ops
      "intersect_nulls" ->
        """SELECT src FROM d4_nulledges WHERE dst < 25
          |INTERSECT
          |SELECT src FROM d4_nulledges WHERE dst >= 10""".stripMargin,
      "except_all_nulls" ->
        """SELECT src FROM d4_nulledges
          |EXCEPT ALL
          |SELECT src FROM d4_nulledges WHERE dst < 25""".stripMargin,
      // aggregate over a join carrying a <=>-only connection
      "nullsafe_agg" ->
        """SELECT g1.src AS k, COUNT(*) AS n, SUM(g2.dst) AS s
          |FROM d4_nulledges g1, d4_nulledges g2
          |WHERE g1.src <=> g2.src GROUP BY g1.src""".stripMargin,
      // three relations: a real chain plus a <=> residual across the ends
      "chain_nullsafe_close" ->
        """SELECT COUNT(*) AS n
          |FROM d4_nulledges g1, d4_nulledges g2, d4_nulledges g3
          |WHERE g1.dst = g2.src AND g2.dst = g3.src AND g3.dst <=> g1.src""".stripMargin
    )
    var bad = 0
    for ((name, sql) <- shapes) {
      try {
        val got = CqcSql.solve(spark, sql).collect().map(_.toSeq).toSet
        val want = spark.sql(sql).collect().map(_.toSeq).toSet
        if (got != want) { println(s"MISMATCH $name: got ${got.size} want ${want.size}"); bad += 1 }
        else println(s"OK $name (${want.size} rows)")
      } catch {
        case e: Throwable => println(s"CRASH $name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}"); bad += 1
      }
    }
    assert(bad == 0, s"$bad null-semantics shapes failed")
  }

  test("computed/null-safe equalities lift to derived join edges, not cross joins") {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("d4_lineitem")
    spark.sql(
      """SELECT CASE WHEN src % 7 = 0 THEN NULL ELSE src END AS src, dst
        |FROM (SELECT DISTINCT l_orderkey % 50 AS src, l_partkey % 50 AS dst
        |      FROM d4_lineitem WHERE l_linenumber = 1)""".stripMargin)
      .createOrReplaceTempView("d4_nulledges")
    // <=>-only join: a real edge on the struct-wrapped key + fast path
    val t1 = CqcSql.explain(spark,
      """SELECT g1.src AS k, COUNT(*) AS n FROM d4_nulledges g1, d4_nulledges g2
        |WHERE g1.src <=> g2.src GROUP BY g1.src""".stripMargin)
    assert(t1.contains("lifted 1 computed/null-safe equality"), t1)
    assert(t1.contains("on [__vj0]"), t1)
    assert(t1.contains("factorized aggregate fast path"), t1)
    // computed-side equality: same lift, no cross join
    val t2 = CqcSql.explain(spark,
      """SELECT COUNT(*) AS n FROM d4_nulledges g1, d4_nulledges g2
        |WHERE g1.dst + 1 = g2.src""".stripMargin)
    assert(t2.contains("on [__vj0]"), t2)
    // and the physical plan of the <=> join has no cartesian product
    val df = CqcSql.solve(spark,
      """SELECT g1.src AS k, COUNT(*) AS n FROM d4_nulledges g1, d4_nulledges g2
        |WHERE g1.src <=> g2.src GROUP BY g1.src""".stripMargin)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), phys.take(2000))
  }
}
