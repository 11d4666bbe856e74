package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame

/** Twentieth adversarial battery (r17): the CORRELATED span lift in
  * exotic positions — under HAVING, inside OR branches mixed with leaf
  * predicates, EXISTS-with-nested-uncorrelated interiors, under GROUP
  * BY with computed keys, beneath QUALIFY windows, in CTE bodies, and
  * doubled (two correlated spans in one WHERE) — plus the r17 data
  * surfaces (phash, char NB langid, stream flag, hnsw serve) as door
  * relations. Every shape runs direct-eligible, forced-reduced and
  * stock, compared as multisets; empty results fail the battery. */
class DoorEdge20Spec extends SparkSpecBase with DoorEdgeBase {

  private def views(): Unit = {
    val d = sfDir
    Tables.orders(spark, d).createOrReplaceTempView("d20_orders")
    Tables.customer(spark, d).createOrReplaceTempView("d20_customer")
    Tables.nation(spark, d).createOrReplaceTempView("d20_nation")
    graft.SparkEntry.queries("mm_phash_dedup")(spark, d)
      .createOrReplaceTempView("d20_phash")
    graft.SparkEntry.queries("text_langid_nb_char")(spark, d)
      .createOrReplaceTempView("d20_nbchar")
    graft.SparkEntry.queries("ann_graph_stream_flag")(spark, d)
      .createOrReplaceTempView("d20_gflag")
    graft.SparkEntry.queries("ann_graph_search_hnsw")(spark, d)
      .createOrReplaceTempView("d20_hnsw")
    Tables.documents(spark, d).createOrReplaceTempView("d20_docs")
  }

  test("correlated spans in exotic positions agree across routes") {
    views()
    battery(Seq(
      // the entry shape, restated with the span under GROUP BY + HAVING
      "corr_span_having" ->
        """SELECT c.c_nationkey AS nat, CAST(count(*) AS BIGINT) AS n
          |FROM d20_customer c, d20_orders o
          |WHERE c.c_custkey = o.o_custkey
          |  AND o.o_totalprice * 2 >
          |      (SELECT max(o2.o_totalprice) FROM d20_orders o2
          |       WHERE o2.o_custkey = c.c_custkey)
          |GROUP BY c.c_nationkey
          |HAVING count(*) > 1""".stripMargin,
      // correlated span inside an OR with a plain leaf predicate: the
      // disjunction cannot split, the whole conjunct is one span
      "corr_span_or" ->
        """SELECT c.c_custkey AS cust, o.o_orderkey AS ord
          |FROM d20_customer c, d20_orders o
          |WHERE c.c_custkey = o.o_custkey
          |  AND (o.o_totalprice < 1000.0 OR
          |       o.o_totalprice * 2 >
          |       (SELECT max(o2.o_totalprice) FROM d20_orders o2
          |        WHERE o2.o_custkey = c.c_custkey))""".stripMargin,
      // correlated EXISTS whose interior holds a NESTED UNCORRELATED
      // subquery (the nested one's scope is its own; only the top
      // plan's outer refs rebind)
      "corr_exists_nested" ->
        """SELECT c.c_custkey AS cust, o.o_orderkey AS ord
          |FROM d20_customer c, d20_orders o
          |WHERE c.c_custkey = o.o_custkey
          |  AND (o.o_orderkey < 3000 AND EXISTS
          |      (SELECT 1 FROM d20_orders o2
          |       WHERE o2.o_custkey = c.c_custkey
          |         AND o2.o_totalprice > (SELECT min(o3.o_totalprice)
          |                                FROM d20_orders o3)
          |         AND o2.o_orderkey < o.o_orderkey))""".stripMargin,
      // TWO correlated spans in one WHERE: both lift, both rebind
      "corr_span_double" ->
        """SELECT c.c_custkey AS cust, o.o_orderkey AS ord
          |FROM d20_customer c, d20_orders o
          |WHERE c.c_custkey = o.o_custkey
          |  AND o.o_totalprice * 2 >
          |      (SELECT max(o2.o_totalprice) FROM d20_orders o2
          |       WHERE o2.o_custkey = c.c_custkey)
          |  AND o.o_orderkey + c.c_nationkey >
          |      (SELECT min(o4.o_orderkey) FROM d20_orders o4
          |       WHERE o4.o_custkey = c.c_custkey)""".stripMargin,
      // span under a computed GROUP BY key
      "corr_span_gb_computed" ->
        """SELECT c.c_custkey % 7 AS g, CAST(count(*) AS BIGINT) AS n
          |FROM d20_customer c, d20_orders o
          |WHERE c.c_custkey = o.o_custkey
          |  AND o.o_totalprice * 2 >
          |      (SELECT max(o2.o_totalprice) FROM d20_orders o2
          |       WHERE o2.o_custkey = c.c_custkey)
          |GROUP BY c.c_custkey % 7""".stripMargin,
      // span beneath a QUALIFY-shaped window over the joined frame
      "corr_span_qualify" ->
        """SELECT cust, ord FROM (
          |  SELECT c.c_custkey AS cust, o.o_orderkey AS ord,
          |         ROW_NUMBER() OVER (PARTITION BY c.c_custkey
          |                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
          |  FROM d20_customer c, d20_orders o
          |  WHERE c.c_custkey = o.o_custkey
          |    AND o.o_totalprice * 2 >
          |        (SELECT max(o2.o_totalprice) FROM d20_orders o2
          |         WHERE o2.o_custkey = c.c_custkey))
          |WHERE rn <= 2""".stripMargin,
      // span inside a CTE body, the CTE joined again above
      "corr_span_cte" ->
        """WITH picked AS (
          |  SELECT c.c_custkey AS cust, c.c_nationkey AS nat, o.o_orderkey AS ord
          |  FROM d20_customer c, d20_orders o
          |  WHERE c.c_custkey = o.o_custkey
          |    AND o.o_totalprice * 2 >
          |        (SELECT max(o2.o_totalprice) FROM d20_orders o2
          |         WHERE o2.o_custkey = c.c_custkey))
          |SELECT p.cust AS cust, n.n_name AS nname, p.ord AS ord
          |FROM picked p, d20_nation n
          |WHERE p.nat = n.n_nationkey""".stripMargin,
      // a 3-leaf correlated span: outer refs on customer AND nation,
      // top-level refs on orders
      "corr_span_3leaf" ->
        """SELECT c.c_custkey AS cust, n.n_name AS nname, o.o_orderkey AS ord
          |FROM d20_customer c, d20_orders o, d20_nation n
          |WHERE c.c_custkey = o.o_custkey AND c.c_nationkey = n.n_nationkey
          |  AND o.o_totalprice + n.n_nationkey >
          |      (SELECT max(o2.o_totalprice) FROM d20_orders o2
          |       WHERE o2.o_custkey = c.c_custkey)""".stripMargin))
  }

  test("r17 data surfaces ride the door as relations") {
    views()
    battery(Seq(
      // phash decisions joined to doc metadata, grouped by dup flag
      "phash_by_source" ->
        """SELECT d.source AS src, p.is_dup AS dup, CAST(count(*) AS BIGINT) AS n
          |FROM d20_phash p, d20_docs d
          |WHERE p.doc_id = d.doc_id
          |GROUP BY d.source, p.is_dup""".stripMargin,
      // char NB langid vs the word-truth label: confusion counts
      "nbchar_confusion" ->
        """SELECT d.lang AS truth, c.pred_lang AS pred, CAST(count(*) AS BIGINT) AS n
          |FROM d20_nbchar c, d20_docs d
          |WHERE c.doc_id = d.doc_id AND d.lang IS NOT NULL
          |GROUP BY d.lang, c.pred_lang""".stripMargin,
      // stream-flag blast radius per arrival, top by QUALIFY
      "gflag_radius" ->
        """SELECT vec_id, n FROM (
          |  SELECT vec_id, CAST(count(DISTINCT affects) AS BIGINT) AS n,
          |         ROW_NUMBER() OVER (ORDER BY count(DISTINCT affects) DESC, vec_id) AS rn
          |  FROM d20_gflag GROUP BY vec_id)
          |WHERE rn <= 5""".stripMargin,
      // hierarchical serve results joined back to the flag relation
      "hnsw_x_gflag" ->
        """SELECT h.q_id AS q, CAST(count(*) AS BIGINT) AS n
          |FROM d20_hnsw h, d20_gflag g
          |WHERE h.q_id = g.vec_id
          |GROUP BY h.q_id""".stripMargin))
  }
}
