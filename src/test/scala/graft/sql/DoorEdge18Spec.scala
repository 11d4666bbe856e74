package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame

/** Eighteenth adversarial battery (r15): the round's new surfaces —
  * the NN-descent graph + beam search, the quality-ranked dedup
  * decision, CDC time travel / table_changes, and the distributed BPE
  * table — registered as door relations and driven through UNPIVOT
  * (new this round), QUALIFY, explicit SEMI/ANTI, recursive CTEs,
  * LATERAL, windows, and grouping sets. Every shape runs
  * direct-eligible, forced-reduced, and stock, compared as multisets;
  * empty results fail the battery. */
class DoorEdge18Spec extends SparkSpecBase {

  private def views(): Unit = {
    val d = sfDir
    graft.datapipe.Ann.knnGraphChecked(Tables.embeddings(spark, d))
      .createOrReplaceTempView("d18_knn")
    graft.datapipe.Ann.graphSearchChecked(Tables.embeddings(spark, d))
      .createOrReplaceTempView("d18_srch")
    graft.datapipe.Dedup.clustersKeepBest(Tables.documents(spark, d))
      .createOrReplaceTempView("d18_best")
    graft.SparkEntry.queries("src_merge_travel")(spark, d)
      .createOrReplaceTempView("d18_travel")
    graft.SparkEntry.queries("src_merge_changes")(spark, d)
      .createOrReplaceTempView("d18_chg")
    graft.datapipe.TextOps.bpeDistTable(Tables.documents(spark, d), 16)
      .createOrReplaceTempView("d18_bpe")
    Tables.documents(spark, d).createOrReplaceTempView("d18_docs")
    Tables.orders(spark, d).createOrReplaceTempView("d18_orders")
  }

  private def multiset(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap

  private def battery(shapes: Seq[(String, String)]): Unit = {
    var bad = 0
    shapes.foreach { case (name, sql) =>
      try {
        val direct = multiset(CqcSql.solve(spark, sql))
        graft.CacheRegistry.unpersistAll()
        spark.conf.set("spark.graft.direct.threshold", "0")
        val reduced =
          try multiset(CqcSql.solve(spark, sql))
          finally spark.conf.unset("spark.graft.direct.threshold")
        graft.CacheRegistry.unpersistAll()
        val stock = multiset(spark.sql(sql))
        if (direct != reduced || direct != stock) {
          System.err.println(s"[$name] MISMATCH sizes direct=${direct.size} reduced=${reduced.size} stock=${stock.size}")
          bad += 1
        } else if (direct.isEmpty) {
          System.err.println(s"[$name] EMPTY result — shape exercises nothing")
          bad += 1
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[$name] THREW ${e.getClass.getSimpleName}: ${e.getMessage}")
          bad += 1
      }
    }
    assert(bad == 0, s"$bad shapes disagreed between routes (or went empty)")
  }

  test("direct vs reduced vs stock agree on the r15 surfaces through the door") {
    views()
    battery(Seq(
      // UNPIVOT over a CDC-changes aggregate (the new clause on the new source)
      "unpivot_changes" ->
        """SELECT op, metric, val FROM (
          |  SELECT op, CAST(count(*) AS DOUBLE) AS n_rows,
          |         CAST(count(DISTINCT o_orderpriority) AS DOUBLE) AS n_prios
          |  FROM d18_chg GROUP BY op)
          |UNPIVOT (val FOR metric IN (n_rows, n_prios))""".stripMargin,
      // UNPIVOT under a ranked-window filter: each metric's top op
      // (windowed-subquery form — QUALIFY text would break the battery's
      // stock leg, which is the raw Spark parser)
      "unpivot_window" ->
        """SELECT op, metric, val FROM (
          |  SELECT op, metric, val,
          |         ROW_NUMBER() OVER (PARTITION BY metric
          |                            ORDER BY val DESC, op) AS rn
          |  FROM (
          |    SELECT op, CAST(count(*) AS DOUBLE) AS n_rows,
          |           CAST(sum(o_totalprice) AS DOUBLE) AS mass
          |    FROM d18_chg GROUP BY op)
          |  UNPIVOT (val FOR metric IN (n_rows, mass)))
          |WHERE rn = 1""".stripMargin,
      // SEMI: documents surviving the quality-ranked dedup decision
      "semi_keepers" ->
        """SELECT d.lang AS lang, count(*) AS n
          |FROM d18_docs d LEFT SEMI JOIN d18_best b
          |  ON d.doc_id = b.doc_id AND b.keep
          |GROUP BY d.lang""".stripMargin,
      // ANTI: orders whose key is untouched by the v1->v2 change set
      "anti_unchanged" ->
        """SELECT o.o_orderpriority AS prio, count(*) AS n
          |FROM d18_orders o LEFT ANTI JOIN d18_chg c
          |  ON o.o_orderkey = c.o_orderkey
          |GROUP BY o.o_orderpriority""".stripMargin,
      // recursive reachability over the k-NN graph from the smallest
      // query (UNION ALL — Spark's recursive CTE rejects dedup-UNION;
      // the depth bound terminates it and the final DISTINCT dedups)
      "recursive_knn" ->
        """WITH RECURSIVE reach(v, depth) AS (
          |  SELECT CAST(min(q_id) AS BIGINT), 0 FROM d18_knn
          |  UNION ALL
          |  SELECT g.nbr_id, r.depth + 1
          |  FROM reach r JOIN d18_knn g ON g.q_id = r.v
          |  WHERE r.depth < 2
          |)
          |SELECT count(DISTINCT v) AS n_reached FROM reach""".stripMargin,
      // window over the beam-search answers: per-query sim spread
      "window_search" ->
        """SELECT q_id, nbr_id,
          |       CAST(sim - MAX(sim) OVER (PARTITION BY q_id) AS DOUBLE) AS gap
          |FROM d18_srch""".stripMargin,
      // grouping sets over the change set
      "gsets_changes" ->
        """SELECT op, o_orderpriority, count(*) AS n
          |FROM d18_chg
          |GROUP BY GROUPING SETS ((op), (op, o_orderpriority), ())""".stripMargin,
      // LATERAL: each BPE merge rank paired with its best lexicographic successor
      "lateral_bpe" ->
        """SELECT b.merge_rank AS r, t.nxt AS nxt
          |FROM d18_bpe b, LATERAL (
          |  SELECT min(b2.lhs) AS nxt FROM d18_bpe b2
          |  WHERE b2.merge_rank > b.merge_rank
          |) t
          |WHERE b.merge_rank < 16""".stripMargin,
      // CTE + set op: travel snapshot vs changes, per priority
      "cte_union_travel" ->
        """WITH t AS (SELECT o_orderpriority AS p, count(*) AS n
          |           FROM d18_travel GROUP BY o_orderpriority),
          |c AS (SELECT o_orderpriority AS p, count(*) AS n
          |      FROM d18_chg GROUP BY o_orderpriority)
          |SELECT 'travel' AS side, p, n FROM t
          |UNION ALL
          |SELECT 'changes', p, n FROM c""".stripMargin,
      // join the decision frame back to the corpus on a computed key
      "computed_best" ->
        """SELECT b.cluster_id % 5 AS bucket,
          |       count(*) AS n, sum(CAST(b.keep AS INT)) AS kept
          |FROM d18_best b, d18_docs d
          |WHERE b.doc_id = d.doc_id
          |GROUP BY b.cluster_id % 5""".stripMargin))
  }
}
