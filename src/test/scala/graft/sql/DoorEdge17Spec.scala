package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame

/** Seventeenth adversarial battery (r14, wave 5): the temporal joins,
  * the epoch shuffle, and fixed-point PageRank registered as door
  * relations and driven through the door's hard features — LATERAL
  * derived tables (new this wave), recursive CTEs, explicit SEMI/ANTI,
  * windows, grouping sets, ranked chains, and correlated subqueries.
  * Every shape runs direct-eligible, forced-reduced, and stock,
  * compared as multisets; empty results fail the battery. */
class DoorEdge17Spec extends SparkSpecBase {

  private def views(): Unit = {
    val d = sfDir
    graft.SparkEntry.qAsof(spark, d).createOrReplaceTempView("d17_asof")
    graft.SparkEntry.qBandJoin(spark, d).createOrReplaceTempView("d17_band")
    graft.graphs.PageRank.pagerank(Tables.edges(spark, d))
      .createOrReplaceTempView("d17_pr")
    graft.datapipe.Shuffle.epochShuffle(Tables.documents(spark, d))
      .createOrReplaceTempView("d17_shuf")
    Tables.documents(spark, d).createOrReplaceTempView("d17_docs")
    Tables.edges(spark, d).createOrReplaceTempView("d17_edges")
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

  test("direct vs reduced vs stock agree on asof/band/pagerank/shuffle compositions") {
    views()
    battery(Seq(
      // LATERAL top-2 matched purchases per user over the as-of output
      "lateral_topk_asof" ->
        """SELECT u.user_id AS user_id, t.event_id AS event_id, t.value AS value
          |FROM (SELECT DISTINCT user_id FROM d17_asof) u, LATERAL (
          |  SELECT event_id, value FROM d17_asof a
          |  WHERE a.user_id = u.user_id AND a.view_id IS NOT NULL
          |  ORDER BY value DESC, event_id LIMIT 2
          |) t""".stripMargin,
      // LATERAL + join inside the lateral body: per language, the doc
      // the epoch shuffle placed LAST
      "lateral_last_shuffled" ->
        """SELECT g.lang AS lang, t.doc_id AS doc_id, t.pos AS pos
          |FROM (SELECT DISTINCT lang FROM d17_docs) g, LATERAL (
          |  SELECT s.doc_id, s.pos FROM d17_shuf s
          |  JOIN d17_docs x ON x.doc_id = s.doc_id
          |  WHERE x.lang = g.lang
          |  ORDER BY s.pos DESC LIMIT 1
          |) t""".stripMargin,
      // recursive CTE feeding a LATERAL probe of the pagerank frame
      "recursive_lateral_pr" ->
        """WITH RECURSIVE r AS (
          |  SELECT src, dst, 1 AS depth FROM d17_edges WHERE src = 4
          |  UNION ALL
          |  SELECT r.src, e.dst, r.depth + 1
          |  FROM r JOIN d17_edges e ON r.dst = e.src WHERE r.depth < 2
          |)
          |SELECT DISTINCT r.dst AS node, t.score AS score
          |FROM r, LATERAL (
          |  SELECT score FROM d17_pr p WHERE p.node = r.dst LIMIT 1
          |) t""".stripMargin,
      // SEMI: pagerank nodes that exist in the shuffled corpus id space
      "semi_pr_shuffle" ->
        """SELECT p.node AS node, p.score AS score
          |FROM d17_pr p LEFT SEMI JOIN d17_shuf s ON s.doc_id = p.node""".stripMargin,
      // ANTI + eager aggregate: shuffled docs outside the graph's node
      // space, counted per worker
      "anti_shuffle_pr" ->
        """SELECT s.worker AS worker, COUNT(*) AS n
          |FROM d17_shuf s LEFT ANTI JOIN d17_pr p ON p.node = s.doc_id
          |GROUP BY s.worker""".stripMargin,
      // window re-rank of the shuffle within workers
      "shuffle_worker_window" ->
        """SELECT s.worker AS worker, s.doc_id AS doc_id,
          |       ROW_NUMBER() OVER (PARTITION BY s.worker ORDER BY s.pos)
          |         AS wpos
          |FROM d17_shuf s""".stripMargin,
      // correlated scalar subquery over the as-of output: matched
      // purchases above their user's matched average
      "asof_correlated_avg" ->
        """SELECT a.event_id AS event_id, a.user_id AS user_id
          |FROM d17_asof a
          |WHERE a.view_id IS NOT NULL
          |  AND a.value > (SELECT AVG(a2.value) FROM d17_asof a2
          |                 WHERE a2.user_id = a.user_id
          |                   AND a2.view_id IS NOT NULL)""".stripMargin,
      // grouping sets across two of the new frames
      "pr_shuffle_grouping_sets" ->
        """SELECT p.node % 2 AS par, s.worker AS worker, COUNT(*) AS n
          |FROM d17_pr p JOIN d17_shuf s ON s.doc_id = p.node
          |GROUP BY GROUPING SETS ((p.node % 2), (s.worker), ())""".stripMargin,
      // ranked chain: edges ranked by destination pagerank
      "edges_by_pr_rank" ->
        """SELECT e.src AS src, e.dst AS dst, p.score AS score
          |FROM d17_edges e, d17_pr p
          |WHERE e.dst = p.node
          |ORDER BY p.score DESC, e.src, e.dst LIMIT 10""".stripMargin,
      // set op across the temporal frames: busy error minutes vs
      // high-value attributed purchases, unioned as labeled ids
      "band_asof_setop" ->
        """SELECT 'busy_error' AS kind, b.e_id AS id FROM d17_band b
          |WHERE b.n_purch >= 3
          |UNION ALL
          |SELECT 'hot_purchase' AS kind, a.event_id AS id FROM d17_asof a
          |WHERE a.view_id IS NOT NULL AND a.value > 90""".stripMargin))
  }

  test("direct vs reduced vs stock agree on pivot/url-dedup/interval compositions") {
    views()
    graft.datapipe.Domains.urlDedup(Tables.documents(spark, sfDir))
      .createOrReplaceTempView("d17b_url")
    graft.SparkEntry.qIntervalJoin(spark, sfDir)
      .createOrReplaceTempView("d17b_iv")
    battery(Seq(
      // SEMI restricted to the multi-variant canonicals
      "url_semi_multi" ->
        """SELECT u.canon_url AS canon_url, u.n_variants AS n_variants
          |FROM d17b_url u LEFT SEMI JOIN d17_docs x ON x.doc_id = u.keep_id
          |WHERE u.n_variants > 1""".stripMargin,
      // ANTI + eager aggregate: the docs URL dedup would DROP, per lang
      "url_anti_dropped" ->
        """SELECT x.lang AS lang, COUNT(*) AS n_dropped
          |FROM d17_docs x LEFT ANTI JOIN d17b_url u ON u.keep_id = x.doc_id
          |GROUP BY x.lang""".stripMargin,
      // LATERAL over the interval aggregate: first error per overlap count
      "iv_lateral_first" ->
        """SELECT b.n_overlap AS n_overlap, t.e_id AS e_id
          |FROM (SELECT DISTINCT n_overlap FROM d17b_iv) b, LATERAL (
          |  SELECT e_id FROM d17b_iv i WHERE i.n_overlap = b.n_overlap
          |  ORDER BY e_id LIMIT 1
          |) t""".stripMargin,
      // window rank of canonicals by collapse mass
      "url_window_rank" ->
        """SELECT u.canon_url AS canon_url, u.n_variants AS n_variants,
          |       ROW_NUMBER() OVER (ORDER BY u.n_variants DESC, u.canon_url)
          |         AS rk
          |FROM d17b_url u""".stripMargin,
      // hour-band count vs interval-overlap count on the same errors —
      // the two temporal aggregations disagree exactly where interval
      // length beats the fixed band
      "iv_band_compare" ->
        """SELECT i.e_id AS e_id, i.n_overlap AS n_overlap, b.n_purch AS n_purch
          |FROM d17b_iv i, d17_band b
          |WHERE b.e_id = i.e_id AND i.n_overlap <> b.n_purch""".stripMargin))
  }
}
