package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame

/** Nineteenth adversarial battery (r16): the round's new surfaces — the
  * persisted k-NN graph (file/append forms), the NB language ID, the
  * character-level span dedup, the snapshot history metadata, the
  * forward/nearest stream-stream as-of, the cross-leaf subquery lift
  * and the wide-scale decimal semiring — registered as door relations
  * and driven through QUALIFY-shaped windows, SEMI/ANTI, recursive
  * CTEs, LATERAL, grouping sets and set ops. Every shape runs
  * direct-eligible, forced-reduced, and stock, compared as multisets;
  * empty results fail the battery. */
class DoorEdge19Spec extends SparkSpecBase with DoorEdgeBase {

  private def views(): Unit = {
    val d = sfDir
    graft.SparkEntry.queries("ann_knngraph_file")(spark, d)
      .createOrReplaceTempView("d19_knnf")
    graft.SparkEntry.queries("ann_knngraph_append")(spark, d)
      .createOrReplaceTempView("d19_knna")
    graft.SparkEntry.queries("ann_graph_search_file")(spark, d)
      .createOrReplaceTempView("d19_srchf")
    graft.datapipe.TextOps.langIdNb(Tables.documents(spark, d),
        org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
      .createOrReplaceTempView("d19_nblang")
    graft.datapipe.TextOps.spanDedupChars(Tables.documents(spark, d))
      .createOrReplaceTempView("d19_span")
    graft.SparkEntry.queries("src_merge_history")(spark, d)
      .createOrReplaceTempView("d19_hist")
    graft.SparkEntry.queries("stream_asof_ss_near")(spark, d)
      .createOrReplaceTempView("d19_near")
    Tables.documents(spark, d).createOrReplaceTempView("d19_docs")
    Tables.orders(spark, d).createOrReplaceTempView("d19_orders")
    Tables.customer(spark, d).createOrReplaceTempView("d19_customer")
  }

  test("direct vs reduced vs stock agree on the r16 surfaces through the door") {
    views()
    battery(Seq(
      // file-served graph vs the append-built graph, joined per query:
      // edge-set agreement counts (the two stores differ only where the
      // frozen-even build diverges from the full build)
      "file_vs_append" ->
        """SELECT f.q_id AS q, count(*) AS n_shared
          |FROM d19_knnf f, d19_knna a
          |WHERE f.q_id = a.q_id AND f.nbr_id = a.nbr_id
          |GROUP BY f.q_id""".stripMargin,
      // windowed rank over the file-served beam search (QUALIFY shape)
      "window_searchf" ->
        """SELECT q_id, nbr_id, rn FROM (
          |  SELECT q_id, nbr_id,
          |         ROW_NUMBER() OVER (PARTITION BY q_id
          |                            ORDER BY sim DESC, nbr_id) AS rn
          |  FROM d19_srchf)
          |WHERE rn <= 2""".stripMargin,
      // NB langid vs the truth label: per-language confusion counts
      "nb_confusion" ->
        """SELECT d.lang AS truth, p.pred_lang AS pred, count(*) AS n
          |FROM d19_docs d, d19_nblang p
          |WHERE d.doc_id = p.doc_id
          |GROUP BY d.lang, p.pred_lang""".stripMargin,
      // SEMI: docs that lost characters to the char-level span dedup
      "semi_span_hit" ->
        """SELECT d.lang AS lang, count(*) AS n
          |FROM d19_docs d LEFT SEMI JOIN d19_span s
          |  ON d.doc_id = s.doc_id AND s.n_dropped > 0
          |GROUP BY d.lang""".stripMargin,
      // ANTI: docs untouched by it
      "anti_span_clean" ->
        """SELECT count(*) AS n
          |FROM d19_docs d LEFT ANTI JOIN d19_span s
          |  ON d.doc_id = s.doc_id AND s.n_dropped > 0""".stripMargin,
      // grouping sets over the history metadata
      "gsets_hist" ->
        """SELECT operation, count(*) AS n, CAST(sum(n_rows) AS BIGINT) AS rows_total
          |FROM d19_hist
          |GROUP BY GROUPING SETS ((operation), ())""".stripMargin,
      // LATERAL over the nearest stream-stream as-of: each matched
      // purchase paired with its user's cheapest matched purchase
      "lateral_near" ->
        """SELECT n.event_id AS eid, t.cheapest AS cheapest
          |FROM d19_near n, LATERAL (
          |  SELECT min(n2.value) AS cheapest FROM d19_near n2
          |  WHERE n2.user_id = n.user_id AND n2.snv_id IS NOT NULL
          |) t
          |WHERE n.snv_id IS NOT NULL""".stripMargin,
      // recursive walk over the appended graph's query edges
      "recursive_knna" ->
        """WITH RECURSIVE reach(v, depth) AS (
          |  SELECT CAST(min(q_id) AS BIGINT), 0 FROM d19_knna
          |  UNION ALL
          |  SELECT g.nbr_id, r.depth + 1
          |  FROM reach r JOIN d19_knna g ON g.q_id = r.v
          |  WHERE r.depth < 2
          |)
          |SELECT count(DISTINCT v) AS n_reached FROM reach""".stripMargin,
      // the r16 subquery-span lift INSIDE a larger door shape: grouped
      // aggregate over the lifted predicate
      "subq_span_agg" ->
        """SELECT c.c_nationkey AS nat, count(*) AS n
          |FROM d19_customer c, d19_orders o
          |WHERE c.c_custkey = o.o_custkey
          |  AND o.o_totalprice + c.c_acctbal >
          |      (SELECT max(o2.o_totalprice) * 0.5 FROM d19_orders o2)
          |GROUP BY c.c_nationkey""".stripMargin,
      // wide-scale decimal sum through the door over a real join
      "wide_decimal_sum" ->
        """SELECT c.c_nationkey AS nat,
          |       SUM(CAST(o.o_totalprice AS DECIMAL(24,8))) AS s,
          |       count(*) AS n
          |FROM d19_customer c, d19_orders o
          |WHERE c.c_custkey = o.o_custkey
          |GROUP BY c.c_nationkey""".stripMargin,
      // set op: languages seen by the vote vs by the NB classifier
      "union_langs" ->
        """SELECT pred_lang AS l FROM d19_nblang
          |INTERSECT
          |SELECT DISTINCT lang FROM d19_docs WHERE lang IS NOT NULL""".stripMargin))
  }
}
