package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

/** Ninth adversarial battery (r8): the cost-gated DIRECT enumeration
  * route crossed with every door feature. Each shape runs three ways —
  * direct-eligible (default threshold; the tiny spec inputs qualify),
  * forced-reduced (`spark.graft.direct.threshold = 0`), and stock
  * Spark — and all three must agree. The route is a pure plan decision:
  * any shape where the answer differs between routes is a correctness
  * bug, not a tuning issue. Shapes deliberately include the features
  * whose machinery DIFFERS between routes: comparison annotation
  * (skipped on direct), the per-relation persists (skipped), outer
  * peel + eager aggregation (recursion both above and below the gate),
  * set-op branches (each branch gated independently), CTE-inlined
  * bodies, ranked chains, ROOT hints (pin + gate compose), and the
  * rollup generic path. */
class DoorEdge9Spec extends SparkSpecBase {

  private def views(): Unit = {
    Tables.edges(spark, sfDir).createOrReplaceTempView("d9_edges")
    Tables.ratedEdges(spark, sfDir).createOrReplaceTempView("d9_rated")
  }

  private def battery(shapes: Seq[(String, String)]): Unit = {
    var bad = 0
    shapes.foreach { case (name, sql) =>
      try {
        val direct = CqcSql.solve(spark, sql).collect().map(_.toSeq)
          .groupBy(identity).view.mapValues(_.size).toMap
        graft.CacheRegistry.unpersistAll()
        spark.conf.set("spark.graft.direct.threshold", "0")
        val reduced =
          try CqcSql.solve(spark, sql).collect().map(_.toSeq)
            .groupBy(identity).view.mapValues(_.size).toMap
          finally spark.conf.unset("spark.graft.direct.threshold")
        graft.CacheRegistry.unpersistAll()
        val stock = spark.sql(sql).collect().map(_.toSeq)
          .groupBy(identity).view.mapValues(_.size).toMap
        if (direct != reduced || direct != stock) {
          System.err.println(s"[$name] MISMATCH sizes direct=${direct.size} reduced=${reduced.size} stock=${stock.size}")
          bad += 1
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[$name] THREW ${e.getClass.getSimpleName}: ${e.getMessage}")
          bad += 1
      }
    }
    assert(bad == 0, s"$bad shapes disagreed between routes")
  }

  test("direct vs reduced vs stock agree across door features") {
    views()
    battery(Seq(
      "cmp_chain_multiset" ->
        """SELECT g1.src AS a, g3.dst AS d
          |FROM d9_edges g1, d9_edges g2, d9_edges g3
          |WHERE g1.dst = g2.src AND g2.dst = g3.src AND g1.src < g3.dst""".stripMargin,
      "two_cmp_one_edge" ->
        """SELECT g1.src AS a, g2.dst AS b
          |FROM d9_edges g1, d9_edges g2
          |WHERE g1.dst = g2.src AND g1.src < g2.dst AND g1.src + 3 > g2.dst - 5""".stripMargin,
      "computed_cmp" ->
        """SELECT g1.src AS a, g2.dst AS b
          |FROM d9_edges g1, d9_edges g2
          |WHERE g1.dst = g2.src AND g1.src + g1.dst < g2.dst * 2""".stripMargin,
      "residual_or" ->
        """SELECT g1.src AS a, g2.dst AS b
          |FROM d9_edges g1, d9_edges g2
          |WHERE g1.dst = g2.src AND (g1.src < g2.dst OR g2.dst < 5)""".stripMargin,
      "degree_fold_cmp" ->
        """SELECT g1.src AS a, g2.dst AS b, c1.cnt AS n1, c2.cnt AS n2
          |FROM d9_edges g1, d9_edges g2,
          |     (SELECT src, COUNT(*) AS cnt FROM d9_edges GROUP BY src) c1,
          |     (SELECT dst, COUNT(*) AS cnt FROM d9_edges GROUP BY dst) c2
          |WHERE g1.dst = g2.src AND c1.src = g1.src AND c2.dst = g2.dst
          |  AND c1.cnt < c2.cnt""".stripMargin,
      "outer_peel_agg" ->
        """SELECT g1.src AS a, COUNT(g2.dst) AS n
          |FROM d9_edges g1 LEFT JOIN d9_edges g2 ON g1.dst = g2.src
          |GROUP BY g1.src""".stripMargin,
      "groupby_enum_spanning" ->
        """SELECT g1.src AS a, g3.dst AS b, COUNT(*) AS n
          |FROM d9_edges g1, d9_edges g2, d9_edges g3
          |WHERE g1.dst = g2.src AND g2.dst = g3.src AND g1.src < g3.dst
          |GROUP BY g1.src, g3.dst""".stripMargin,
      "rollup_generic" ->
        """SELECT g1.src AS a, g2.dst AS b, COUNT(*) AS n
          |FROM d9_edges g1, d9_edges g2
          |WHERE g1.dst = g2.src AND g1.src < g2.dst
          |GROUP BY ROLLUP(g1.src, g2.dst)""".stripMargin,
      "union_mixed_routes" ->
        """SELECT g1.src AS a, g2.dst AS b
          |FROM d9_edges g1, d9_edges g2 WHERE g1.dst = g2.src AND g1.src < g2.dst
          |UNION ALL
          |SELECT r.src AS a, r.dst AS b FROM d9_rated r WHERE r.rating > 3""".stripMargin,
      "intersect_routes" ->
        """SELECT g1.src AS a, g1.dst AS b FROM d9_edges g1, d9_edges g2
          |WHERE g1.dst = g2.src
          |INTERSECT
          |SELECT src AS a, dst AS b FROM d9_edges""".stripMargin,
      "cte_inlined_cmp" ->
        """WITH hop AS (SELECT g1.src AS a, g2.dst AS b
          |             FROM d9_edges g1, d9_edges g2 WHERE g1.dst = g2.src)
          |SELECT h1.a AS x, h2.b AS y FROM hop h1, hop h2
          |WHERE h1.b = h2.a AND h1.a < h2.b""".stripMargin,
      "ranked_chain_limit" ->
        """SELECT r1.src AS a, r2.dst AS b, r1.rating + r2.rating AS s
          |FROM d9_rated r1, d9_rated r2 WHERE r1.dst = r2.src
          |ORDER BY s DESC, a ASC, b ASC LIMIT 7""".stripMargin,
      "root_hint_with_gate" ->
        """SELECT /*+ ROOT(r1) */ g1.src AS a, g2.src AS b, g3.dst AS c
          |FROM d9_edges g1, d9_edges g2, d9_edges g3
          |WHERE g1.dst = g2.src AND g2.dst = g3.src AND g1.src < g3.dst""".stripMargin,
      "exists_leaf_subq" ->
        """SELECT g1.src AS a, g1.dst AS b FROM d9_edges g1
          |WHERE g1.dst IN (SELECT src FROM d9_edges WHERE dst < 50)
          |  AND EXISTS (SELECT 1 FROM d9_edges e WHERE e.src = g1.src AND e.dst > 2)""".stripMargin,
      "distinct_orderby" ->
        """SELECT DISTINCT g1.src AS a, g2.dst AS b
          |FROM d9_edges g1, d9_edges g2
          |WHERE g1.dst = g2.src AND g1.src < g2.dst
          |ORDER BY a, b LIMIT 20""".stripMargin,
      "window_over_join" ->
        """SELECT g1.src AS a, g2.dst AS b,
          |       SUM(g2.dst) OVER (PARTITION BY g1.src) AS w
          |FROM d9_edges g1, d9_edges g2 WHERE g1.dst = g2.src""".stripMargin,
      "having_enum" ->
        """SELECT g1.src AS a, COUNT(*) AS n
          |FROM d9_edges g1, d9_edges g2
          |WHERE g1.dst = g2.src AND g1.src < g2.dst
          |GROUP BY g1.src HAVING COUNT(*) > 2""".stripMargin,
      "nullsafe_key" ->
        """SELECT g1.src AS a, g2.dst AS b
          |FROM d9_edges g1, d9_edges g2
          |WHERE g1.dst <=> g2.src AND g1.src < g2.dst""".stripMargin
    ))
  }

  test("ROOT hint pins the tree on BOTH routes without changing results") {
    views()
    val sql =
      """SELECT g1.src AS a, g2.src AS b, g3.dst AS c
        |FROM d9_edges g1, d9_edges g2, d9_edges g3
        |WHERE g1.dst = g2.src AND g2.dst = g3.src""".stripMargin
    // direct route honors the pin (tree order changes, result does not)
    val base = CqcSql.solve(spark, sql).collect().map(_.toSeq).sortBy(_.toString)
    for (root <- Seq("r0", "r1", "r2")) {
      val pinned = CqcSql.solveWithRoot(spark, sql, root)
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(pinned.toSeq == base.toSeq, s"pin $root changed the answer")
    }
  }
}
