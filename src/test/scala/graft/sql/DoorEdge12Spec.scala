package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame

/** Twelfth adversarial battery (r11): the LEAN INGEST-GATE INDEXES and
  * the TWO-LEVEL IVF assignment crossed with the door compositions —
  * the r10 verdict's suggested theme. The r11 rebuilds changed the
  * physical shape of the gate/IVF outputs (two-frame bucket+payload
  * indexes, coarse→fine centroid pick, the group keep policy, the
  * multiprobe stream gate); this battery feeds those outputs back
  * through the SQL door as relations, carrying the door's hard features
  * (aggregates, EXISTS/NOT-EXISTS leaves, cross-relation comparisons,
  * CTEs, ranked chains) over their non-graph schemas. Every shape runs
  * direct-eligible, forced-reduced, and stock, compared as multisets. */
class DoorEdge12Spec extends SparkSpecBase {

  private def views(): Unit = {
    import graft.datapipe._
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    docs.createOrReplaceTempView("d12_docs")
    // LEAN-index gate outputs (two-frame (band,key,corpus_id)+payload)
    Dedup.minhashStreamingFlag(docs, Dedup.minhashIndex(docs))
      .createOrReplaceTempView("d12_mhflag")
    Dedup.minhashLsh(docs).createOrReplaceTempView("d12_mhpairs")
    val eidx = Ann.embedIndex(emb)
    Ann.embedStreamingFlag(emb, eidx).createOrReplaceTempView("d12_eflag")
    Ann.embedStreamingFlagMultiprobe(emb, eidx)
      .createOrReplaceTempView("d12_eflagmp")
    // LM likelihood gate output (r11 growth entry) as a door relation
    TextOps.lmScore(docs).createOrReplaceTempView("d12_lm")
    // TWO-LEVEL IVF outputs: probe ranks + both SemDeDup keep policies
    Ann.ivfTopK(emb).createOrReplaceTempView("d12_ivf")
    Ann.semanticDedup(emb).createOrReplaceTempView("d12_sem")
    Ann.semanticDedupGroup(emb).createOrReplaceTempView("d12_semg")
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

  test("subquery predicate referencing a PEELED outer-join side routes, not crashes") {
    // r11 review fix: the nested-leaf subquery guard indexed `leaves`
    // with leafOf = -1 when the predicate's attrs live on a peeled
    // outer-join side (in no leaf) — IndexOutOfBounds out of solvePlan.
    // The -1 case must route like the pre-guard behavior and stay
    // result-identical to stock.
    import spark.implicits._
    Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("doc_id", "lang")
      .createOrReplaceTempView("d12p_docs")
    Seq((1L, 3L), (2L, 1L)).toDF("doc_id", "dup_of")
      .createOrReplaceTempView("d12p_flag")
    val sql =
      """SELECT x.doc_id AS doc_id, f.dup_of AS dup_of
        |FROM d12p_docs x LEFT JOIN d12p_flag f ON f.doc_id = x.doc_id
        |WHERE f.dup_of IN (SELECT doc_id FROM d12p_docs WHERE lang = 'en')""".stripMargin
    val door = multiset(CqcSql.solve(spark, sql))
    val stock = multiset(spark.sql(sql))
    assert(door == stock && door.nonEmpty, s"door $door vs stock $stock")
  }

  test("direct vs reduced vs stock agree on lean-gate / two-level-IVF compositions") {
    views()
    battery(Seq(
      // lexical gate flags joined back to the corpus (lean-index probe
      // output as a door relation)
      "gate_back_to_corpus" ->
        """SELECT f.doc_id AS doc_id, f.dup_of AS dup_of, x.lang AS lang
          |FROM d12_mhflag f, d12_docs x
          |WHERE f.doc_id = x.doc_id""".stripMargin,
      // both endpoints of a flagged pair resolved through the corpus —
      // a 3-relation chain over the gate output
      "flag_pair_langs" ->
        """SELECT f.band AS band, x1.lang AS l1, x2.lang AS l2
          |FROM d12_mhflag f, d12_docs x1, d12_docs x2
          |WHERE f.doc_id = x1.doc_id AND f.dup_of = x2.doc_id""".stripMargin,
      // the two SemDeDup keep policies joined per vector — the r11
      // divergence surface as a self-pair join on (vec_id, cid)
      "policy_divergence" ->
        """SELECT g.vec_id AS vec_id, g.keep AS gkeep, s.keep AS skeep
          |FROM d12_semg g, d12_sem s
          |WHERE g.vec_id = s.vec_id AND g.cid = s.cid""".stripMargin,
      // IVF neighbor ranks gated on the two-level cluster decision,
      // boolean leaf filter on the decision relation
      "ivf_kept_neighbors" ->
        """SELECT i.q_id AS q_id, i.nbr_id AS nbr_id, i.rnk AS rnk
          |FROM d12_ivf i, d12_sem s
          |WHERE i.nbr_id = s.vec_id AND s.keep""".stripMargin,
      // CROSS-RELATION comparison between probe rank sim and the
      // cluster decision sim (NULL sim on keepers filters out — stock
      // NULL semantics must agree on all three routes)
      "sim_cmp" ->
        """SELECT i.q_id AS q_id, i.nbr_id AS nbr_id, s.sim AS dup_sim
          |FROM d12_ivf i, d12_sem s
          |WHERE i.nbr_id = s.vec_id AND i.sim < s.sim""".stripMargin,
      // per-band aggregate over the embedding gate joined to decisions
      "embed_gate_agg" ->
        """SELECT e.band AS band, COUNT(*) AS n, MAX(e.sim) AS best
          |FROM d12_eflag e, d12_sem s
          |WHERE e.vec_id = s.vec_id
          |GROUP BY e.band""".stripMargin,
      // the multiprobe-only recoveries: NOT EXISTS against the exact
      // gate (anti-join leaf over the r11 stream-side multiprobe)
      "mp_only_recoveries" ->
        """SELECT m.vec_id AS vec_id, m.dup_of AS dup_of, m.band AS band
          |FROM d12_eflagmp m
          |WHERE NOT EXISTS (SELECT 1 FROM d12_eflag e
          |                  WHERE e.vec_id = m.vec_id AND e.dup_of = m.dup_of
          |                    AND e.band = m.band)""".stripMargin,
      // CTE over the group-policy survivors, self-paired per cluster
      "cid_pairs_cte" ->
        """WITH kept AS (
          |  SELECT vec_id, cid FROM d12_semg WHERE keep)
          |SELECT k1.cid AS cid, COUNT(*) AS pairs
          |FROM kept k1, kept k2
          |WHERE k1.cid = k2.cid AND k1.vec_id < k2.vec_id
          |GROUP BY k1.cid""".stripMargin,
      // ranked chain over IVF ranks joined to cluster ids (total order:
      // sim ties broken by ids)
      "ivf_rank_chain" ->
        """SELECT i.q_id AS q_id, i.nbr_id AS nbr_id, i.rnk AS rnk, s.cid AS cid
          |FROM d12_ivf i, d12_sem s
          |WHERE i.nbr_id = s.vec_id
          |ORDER BY i.sim DESC, q_id ASC, nbr_id ASC LIMIT 9""".stripMargin,
      // LSH pair relation aggregated per corpus language
      "pairs_per_lang" ->
        """SELECT x.lang AS lang, COUNT(*) AS n, MIN(p.jac) AS worst
          |FROM d12_mhpairs p, d12_docs x
          |WHERE p.d1 = x.doc_id
          |GROUP BY x.lang""".stripMargin,
      // LM gate scores aggregated per language over the corpus join —
      // a NULLABLE measure (short docs carry NULL scores) through the
      // factorized aggregate path
      "lm_per_lang" ->
        """SELECT x.lang AS lang, COUNT(*) AS n, MAX(l.lm_score) AS best,
          |       SUM(l.n_trigrams) AS tri_mass
          |FROM d12_lm l, d12_docs x
          |WHERE l.doc_id = x.doc_id
          |GROUP BY x.lang""".stripMargin,
      // EXISTS over the lexical gate (subquery-predicate leaf)
      "gate_exists" ->
        """SELECT x.doc_id AS doc_id, x.lang AS lang
          |FROM d12_docs x
          |WHERE EXISTS (SELECT 1 FROM d12_mhflag f WHERE f.doc_id = x.doc_id)""".stripMargin))
  }
}
