package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame

/** Fifteenth adversarial battery (r14): explicit `LEFT SEMI JOIN` /
  * `LEFT ANTI JOIN` text syntax crossed with the door's features. The
  * EXISTS/NOT-EXISTS subquery routes were covered since r6, but Spark
  * parses the explicit join forms natively and they reach the door as
  * `Join(LeftSemi|LeftAnti)` nodes the peel had never seen — r14 peels
  * them like outers (a pure row filter re-applied on the CQC result)
  * and fences every fast path that never materializes join rows
  * (factorized aggregates, ranked chains). Each shape runs
  * direct-eligible, forced-reduced, and stock, compared as multisets;
  * empty results fail the battery (a vacuous shape exercises nothing).
  */
class DoorEdge15Spec extends SparkSpecBase {

  private def views(): Unit = {
    Tables.region(spark, sfDir).createOrReplaceTempView("d15_region")
    Tables.nation(spark, sfDir).createOrReplaceTempView("d15_nation")
    Tables.customer(spark, sfDir).createOrReplaceTempView("d15_cust")
    Tables.orders(spark, sfDir).createOrReplaceTempView("d15_orders")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("d15_line")
    Tables.ratedEdges(spark, sfDir).createOrReplaceTempView("d15_rated")
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

  test("explicit LEFT SEMI/ANTI JOIN syntax agrees across all three routes") {
    views()
    battery(Seq(
      // plain semi on a single preserved relation
      "semi_plain" ->
        """SELECT o.o_orderkey AS k, o.o_totalprice AS p
          |FROM d15_orders o LEFT SEMI JOIN d15_line l ON l.l_orderkey = o.o_orderkey
          |WHERE o.o_totalprice > 300000""".stripMargin,
      // plain anti (the Q22 shape as explicit syntax; every customer has
      // SOME order at the spec SF, so the probed side restricts to big
      // orders in the ON — 20 survivors)
      "anti_plain" ->
        """SELECT c.c_custkey AS k
          |FROM d15_cust c LEFT ANTI JOIN d15_orders o
          |  ON o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
          |WHERE c.c_acctbal > 0""".stripMargin,
      // semi probing INTO an inner CQC cluster (region-nation-customer)
      "semi_over_cluster" ->
        """SELECT r.r_name AS region, c.c_custkey AS k
          |FROM d15_region r, d15_nation n, d15_cust c
          |LEFT SEMI JOIN d15_orders o ON o.o_custkey = c.c_custkey
          |WHERE r.r_regionkey = n.n_regionkey AND n.n_nationkey = c.c_nationkey
          |  AND c.c_acctbal > 9900""".stripMargin,
      // CRITICAL fast-path fence: aggregate over a semi-filtered cluster
      // (without the r14 guard the factorized count ignores the filter)
      "semi_under_agg" ->
        """SELECT n.n_name AS nation, COUNT(*) AS n_cust
          |FROM d15_nation n, d15_cust c
          |LEFT SEMI JOIN d15_orders o ON o.o_custkey = c.c_custkey
          |WHERE n.n_nationkey = c.c_nationkey
          |GROUP BY n.n_name""".stripMargin,
      // same fence for anti + HAVING over a non-selected aggregate
      "anti_under_agg_having" ->
        """SELECT n.n_name AS nation, COUNT(*) AS n_cust
          |FROM d15_nation n, d15_cust c
          |LEFT ANTI JOIN d15_orders o
          |  ON o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
          |WHERE n.n_nationkey = c.c_nationkey
          |GROUP BY n.n_name
          |HAVING MAX(c.c_acctbal) > 1000""".stripMargin,
      // semi above a peeled LEFT OUTER whose o-column the semi condition
      // references (binding order: outers re-apply first)
      "semi_on_peeled_outer_col" ->
        """SELECT c.c_custkey AS k, o.o_orderkey AS ok
          |FROM d15_cust c LEFT JOIN d15_orders o ON o.o_custkey = c.c_custkey
          |LEFT SEMI JOIN d15_line l ON l.l_orderkey = o.o_orderkey
          |WHERE c.c_acctbal > 9500""".stripMargin,
      // anti above the peel on a preserved-side attr
      "anti_above_outer" ->
        """SELECT c.c_custkey AS k, o.o_totalprice AS p
          |FROM d15_cust c LEFT JOIN d15_orders o ON o.o_custkey = c.c_custkey
          |LEFT ANTI JOIN d15_line l ON l.l_suppkey = c.c_custkey
          |WHERE c.c_acctbal > 9800""".stripMargin,
      // probed side defined in a CTE (inlining happens before the peel)
      "semi_cte_probe" ->
        """WITH big AS (SELECT l_orderkey FROM d15_line WHERE l_quantity > 49)
          |SELECT o.o_orderkey AS k
          |FROM d15_orders o LEFT SEMI JOIN big b ON b.l_orderkey = o.o_orderkey
          |WHERE o.o_orderpriority = '1-URGENT'""".stripMargin,
      // computed condition on both sides of the semi
      "semi_computed_cond" ->
        """SELECT o.o_orderkey AS k
          |FROM d15_orders o LEFT SEMI JOIN d15_line l
          |  ON l.l_orderkey * 2 = o.o_orderkey + o.o_orderkey
          |WHERE o.o_totalprice > 350000""".stripMargin,
      // chained semi THEN anti on the same preserved cluster
      "semi_then_anti" ->
        """SELECT c.c_custkey AS k
          |FROM d15_cust c
          |LEFT SEMI JOIN d15_orders o ON o.o_custkey = c.c_custkey
          |LEFT ANTI JOIN d15_orders u
          |  ON u.o_custkey = c.c_custkey AND u.o_totalprice > 400000
          |WHERE c.c_acctbal > 0""".stripMargin,
      // window over the semi-filtered join (filter must precede ranking)
      "semi_window" ->
        """SELECT n.n_name AS nation, c.c_custkey AS k,
          |       ROW_NUMBER() OVER (PARTITION BY n.n_name
          |                          ORDER BY c.c_acctbal DESC, c.c_custkey) AS rn
          |FROM d15_nation n, d15_cust c
          |LEFT SEMI JOIN d15_orders o ON o.o_custkey = c.c_custkey
          |WHERE n.n_nationkey = c.c_nationkey AND c.c_acctbal > 9000""".stripMargin,
      // ROLLUP over the anti-filtered cluster (rollup decomposition must
      // see the filtered rows)
      "anti_rollup" ->
        """SELECT n.n_name AS nation, c.c_mktsegment AS seg, COUNT(*) AS n
          |FROM d15_nation n, d15_cust c
          |LEFT ANTI JOIN d15_orders o
          |  ON o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
          |WHERE n.n_nationkey = c.c_nationkey
          |GROUP BY ROLLUP(n.n_name, c.c_mktsegment)""".stripMargin,
      // ranked-chain fence: ORDER BY+LIMIT over a two-relation chain with
      // a semi on top must not route to the per-key prune pre-filter
      "semi_ranked_chain" ->
        """SELECT g1.src AS a, g1.rating + g2.rating AS rank_sum
          |FROM d15_rated g1, d15_rated g2
          |LEFT SEMI JOIN d15_rated g3 ON g3.src = g2.dst
          |WHERE g1.dst = g2.src
          |ORDER BY rank_sum DESC, a ASC LIMIT 7""".stripMargin,
      // probed side is itself a JOIN (nested recursion on the semi side)
      "semi_join_probe" ->
        """SELECT o.o_orderkey AS k
          |FROM d15_orders o LEFT SEMI JOIN
          |  (SELECT l.l_orderkey AS lk FROM d15_line l, d15_orders o2
          |   WHERE l.l_orderkey = o2.o_orderkey AND o2.o_totalprice > 400000) j
          |  ON j.lk = o.o_orderkey
          |WHERE o.o_orderpriority = '5-LOW'""".stripMargin,
      // ON-less semi: keep every left row iff the probed side is
      // non-empty (Spark parses the form; condition None)
      "semi_no_on" ->
        """SELECT n.n_name AS nation
          |FROM d15_nation n LEFT SEMI JOIN d15_region r
          |WHERE n.n_nationkey < 5""".stripMargin,
      // DISTINCT + semi (distinct applies after the filter)
      "semi_distinct" ->
        """SELECT DISTINCT c.c_mktsegment AS seg
          |FROM d15_cust c LEFT SEMI JOIN d15_orders o
          |  ON o.o_custkey = c.c_custkey AND o.o_totalprice > 450000""".stripMargin))
  }

  test("r14 operator outputs as door relations, crossed with semi/anti syntax") {
    import graft.datapipe._
    val docs = Tables.documents(spark, sfDir)
    docs.createOrReplaceTempView("d15_docs")
    Domains.capDocuments(docs).createOrReplaceTempView("d15_dom")
    Dedup.segmentDedupFuzzy(Dedup.plantSegmentNearDups(docs))
      .createOrReplaceTempView("d15_segfz")
    TextOps.bpeCounts(docs).createOrReplaceTempView("d15_bpe")
    TextOps.packShards(docs, realBpe = true).createOrReplaceTempView("d15_packb")
    battery(Seq(
      // the domain gate's survivors semi-probed into the corpus hub rows:
      // kept hub docs must be exactly the capped lowest ids
      "dom_semi_hub" ->
        """SELECT g.doc_id AS k, g.domain AS dom
          |FROM d15_dom g LEFT SEMI JOIN d15_docs x ON x.doc_id = g.doc_id
          |WHERE g.domain = 'hub.example'""".stripMargin,
      // anti: corpus docs the gate DROPPED (spam + over-cap hub tail),
      // aggregated per lang — the gate decision re-derived through the door
      "dom_anti_dropped" ->
        """SELECT x.lang AS lang, COUNT(*) AS n_dropped
          |FROM d15_docs x LEFT ANTI JOIN d15_dom g ON g.doc_id = x.doc_id
          |GROUP BY x.lang""".stripMargin,
      // fuzzy segment dedup crossed with BPE counts: docs that LOST
      // segments ranked by their exact token mass (window over a join)
      "segfz_bpe_window" ->
        """SELECT f.doc_id AS doc_id, b.n_bpe AS n_bpe,
          |       ROW_NUMBER() OVER (ORDER BY b.n_bpe DESC, f.doc_id) AS rn
          |FROM d15_segfz f, d15_bpe b
          |WHERE f.doc_id = b.doc_id AND f.n_kept < f.n_segs""".stripMargin,
      // BPE-keyed packing semi-probed by the fuzzy-survivor set with a
      // ROLLUP audit on top — three r14 outputs in one query
      "packb_rollup_semi" ->
        """SELECT p.lang AS lang, p.shard_id AS shard, SUM(p.n_bpe) AS toks
          |FROM d15_packb p
          |LEFT SEMI JOIN d15_segfz f ON f.doc_id = p.doc_id AND f.n_kept > 0
          |GROUP BY ROLLUP(p.lang, p.shard_id)""".stripMargin,
      // heuristic-vs-exact token comparison through a computed predicate:
      // docs where the heuristic UNDERCOUNTS the frozen tokenizer by >2x
      // (chars/4 assumes ~4-char tokens; short-word text tokenizes worse)
      "bpe_vs_heuristic_expr" ->
        """SELECT b.doc_id AS doc_id, b.n_bpe AS n_bpe, x.n_chars AS n_chars
          |FROM d15_bpe b, d15_docs x
          |WHERE b.doc_id = x.doc_id AND b.n_bpe * 2 > x.n_chars""".stripMargin))
  }
}
