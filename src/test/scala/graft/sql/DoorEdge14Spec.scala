package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame

/** Fourteenth adversarial battery (r13): the SALTED two-level prune, the
  * BLOCK-SCAN prefix-sum packing, PERSISTED-CODE IVFADC serving and the
  * PLANTED fuzzy-decontam decision, fed back through the door. The r13
  * rebuilds changed the physical path of pipe_topk (salt level-1 prune)
  * and pipe_pack (distributed scan) and added disk-resident serving
  * (ann_ivfpq_file) and a non-vacuous plant (pipe_decontam_fuzzy); this
  * battery registers those outputs as door relations and drives the
  * door's hard features over them — outer peel + subquery predicates,
  * windows, ROLLUP/GROUPING SETS, ranked chains, NOT EXISTS,
  * cross-relation computed comparisons. Every shape runs
  * direct-eligible, forced-reduced, and stock, compared as multisets. */
class DoorEdge14Spec extends SparkSpecBase with org.scalatest.BeforeAndAfterAll {

  private val tempDirs = scala.collection.mutable.ArrayBuffer[String]()
  private def tempDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    tempDirs += d
    d
  }
  override def afterAll(): Unit = {
    tempDirs.foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    super.afterAll()
  }

  private def views(): Unit = {
    import graft.datapipe._
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    docs.createOrReplaceTempView("d14_docs")
    // SALTED two-level prune output (the pipe_topk r13 plan)
    graft.SparkEntry.queries("pipe_topk")(spark, sfDir)
      .createOrReplaceTempView("d14_topk")
    // BLOCK-SCAN packing at the default width AND a tiny width (the
    // multi-block reassembly path) — the door must see them as equal
    TextOps.packShards(docs).createOrReplaceTempView("d14_pack")
    TextOps.packShards(docs, 8).createOrReplaceTempView("d14_pack8")
    // PERSISTED-CODE IVFADC serving: index written to parquet, ranks
    // served from the disk-resident codes
    val pqDir = tempDir("d14_ivfpq_index")
    Ann.ivfpqIndex(emb).write(pqDir)
    Ann.ivfpqServe(
      emb.where(col("vec_id") % Ann.queryMod === 0)
        .select(col("vec_id").as("q_id"), col("embedding")),
      Ann.IvfpqIndex.read(spark, pqDir))
      .createOrReplaceTempView("d14_ivfpqf")
    // PLANTED fuzzy decontam decision (known-nonzero at every SF)
    Decontam.flagFuzzyDocuments(Decontam.plantNearDups(docs))
      .createOrReplaceTempView("d14_dfz")
    // NB classifier scores (r13 late growth)
    TextOps.nbScore(docs, col("doc_id") % 10 === 0)
      .createOrReplaceTempView("d14_nb")
    // APPENDED-index gate flags (the incremental-ingest deployment form)
    val mhDir = tempDir("d14_mh_append")
    Dedup.minhashIndex(docs.where(col("doc_id") % 2 === 0)).write(mhDir)
    Dedup.MinhashIndex.append(mhDir, docs.where(col("doc_id") % 2 === 1))
    Dedup.minhashStreamingFlag(docs.where(col("doc_id") % 10 === 0),
        Dedup.MinhashIndex.read(spark, mhDir))
      .createOrReplaceTempView("d14_mhap")
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

  test("direct vs reduced vs stock agree on salted-prune/pack-scan/persisted-serving compositions") {
    views()
    battery(Seq(
      // block-width PARITY through the door: every doc's shard under the
      // default width equals its shard under width 8 — counted per lang
      // (a zero-divergence claim made non-vacuously: counts must equal
      // the per-lang doc totals on all three routes)
      "pack_block_parity" ->
        """SELECT p.lang AS lang, COUNT(*) AS n_same
          |FROM d14_pack p, d14_pack8 q
          |WHERE p.doc_id = q.doc_id AND p.shard_id = q.shard_id
          |GROUP BY p.lang""".stripMargin,
      // ROLLUP over the packed corpus: per-(lang, shard) token mass with
      // per-lang and grand totals — the grouping-sets path over the
      // prefix-sum output
      "pack_rollup_mass" ->
        """SELECT p.lang AS lang, p.shard_id AS shard, SUM(p.n_bpe) AS toks, COUNT(*) AS n
          |FROM d14_pack p, d14_docs x
          |WHERE p.doc_id = x.doc_id
          |GROUP BY ROLLUP(p.lang, p.shard_id)""".stripMargin,
      // the salted prune's output re-ranked through the door's WINDOW
      // path: rank within lang must be 1..3 with the same total order
      "topk_rerank_window" ->
        """SELECT t.lang AS lang, t.doc_id AS doc_id,
          |       ROW_NUMBER() OVER (PARTITION BY t.lang
          |                          ORDER BY t.score DESC, t.doc_id) AS rn
          |FROM d14_topk t, d14_docs x
          |WHERE t.doc_id = x.doc_id""".stripMargin,
      // OUTER peel of the salted prune onto the corpus + IN-subquery on
      // the peeled side (the r11 crash class over an r13 output)
      "peel_subq_topk" ->
        """SELECT x.doc_id AS doc_id, t.score AS score
          |FROM d14_docs x LEFT JOIN d14_topk t ON t.doc_id = x.doc_id
          |WHERE t.lang IN (SELECT lang FROM d14_docs WHERE doc_id < 50)""".stripMargin,
      // cross-relation COMPUTED comparison: quality-top docs whose BPE
      // mass exceeds their score-scaled bound (double x bigint expr)
      "topk_pack_expr_cmp" ->
        """SELECT t.doc_id AS doc_id, t.score AS score, p.n_bpe AS n_bpe
          |FROM d14_topk t, d14_pack p
          |WHERE t.doc_id = p.doc_id AND p.n_bpe > t.score * 20""".stripMargin,
      // persisted-code serving ranks as a ranked chain: resolve each
      // neighbor's packed shard, order by the ADC estimate with id
      // tie-breaks
      "ivfpqf_rank_chain" ->
        """SELECT f.q_id AS q_id, f.nbr_id AS nbr_id, f.rnk AS rnk
          |FROM d14_ivfpqf f, d14_docs x
          |WHERE f.nbr_id = x.doc_id
          |ORDER BY f.asim DESC, q_id ASC, nbr_id ASC LIMIT 9""".stripMargin,
      // NOT EXISTS between the disk-served ranks and the salted prune:
      // served neighbors that are NOT quality-top docs
      "served_not_top" ->
        """SELECT f.q_id AS q_id, f.nbr_id AS nbr_id
          |FROM d14_ivfpqf f
          |WHERE NOT EXISTS (SELECT 1 FROM d14_topk t WHERE t.doc_id = f.nbr_id)""".stripMargin,
      // GROUPING SETS over the PLANTED decontam decision x corpus lang
      // with a correlated EXISTS underneath — the r13 cross-generator
      // class over r13 relations
      "dfz_gsets_exists" ->
        """SELECT x.lang AS lang, f.first_probe AS probe, COUNT(*) AS n
          |FROM d14_dfz f, d14_docs x
          |WHERE f.doc_id = x.doc_id
          |  AND EXISTS (SELECT 1 FROM d14_docs z WHERE z.doc_id = f.first_probe)
          |GROUP BY GROUPING SETS ((x.lang, f.first_probe), (x.lang), ())""".stripMargin,
      // planted copies resolved to their source probes: a self-join of
      // the corpus THROUGH the decision frame (id arithmetic in the
      // join predicate)
      "plant_source_join" ->
        """SELECT f.doc_id AS copy_id, s.doc_id AS src_id, f.best_jac AS jac
          |FROM d14_dfz f, d14_docs s
          |WHERE s.doc_id = f.first_probe AND f.doc_id = s.doc_id + 1""".stripMargin,
      // aggregate over the decision frame with HAVING on a non-selected
      // aggregate: langs by flag count where the worst jaccard clears
      // the plant's structural bound
      "dfz_having_agg" ->
        """SELECT x.lang AS lang, COUNT(*) AS n
          |FROM d14_dfz f, d14_docs x
          |WHERE f.doc_id = x.doc_id
          |GROUP BY x.lang
          |HAVING MAX(f.best_jac) > 0.5""".stripMargin,
      // NB classifier scores per lang, windowed: rank docs by the gate
      // score within language — classifier output through the door's
      // window path, NULL scores dropped identically on all routes
      "nb_rank_window" ->
        """SELECT x.lang AS lang, n.doc_id AS doc_id,
          |       ROW_NUMBER() OVER (PARTITION BY x.lang
          |                          ORDER BY n.nb_score DESC, n.doc_id) AS rn
          |FROM d14_nb n, d14_docs x
          |WHERE n.doc_id = x.doc_id AND n.nb_score IS NOT NULL""".stripMargin,
      // curated-slice mean vs crawl mean per source: CASE grouping key
      // over the classifier decision (the gate's discrimination, as SQL)
      "nb_source_split" ->
        """SELECT x.source AS source,
          |       CASE WHEN n.doc_id % 10 = 0 THEN 'curated' ELSE 'crawl' END AS split,
          |       COUNT(*) AS n_docs, MAX(n.nb_score) AS best
          |FROM d14_nb n, d14_docs x
          |WHERE n.doc_id = x.doc_id AND n.nb_score IS NOT NULL
          |GROUP BY x.source, CASE WHEN n.doc_id % 10 = 0 THEN 'curated' ELSE 'crawl' END""".stripMargin,
      // appended-index gate flags resolved through the corpus with an
      // EXISTS into the topk relation — incremental-ingest output meets
      // the subquery path
      "mhap_exists_topk" ->
        """SELECT f.doc_id AS doc_id, f.dup_of AS dup_of, f.band AS band
          |FROM d14_mhap f, d14_docs x
          |WHERE f.doc_id = x.doc_id
          |  AND EXISTS (SELECT 1 FROM d14_docs z WHERE z.doc_id = f.dup_of)""".stripMargin))
  }

  test("pack shard totals respect the budget through the door (every route)") {
    views()
    // the greedy rule's invariant, checked through the door: no shard's
    // token mass (except possibly each language's LAST shard) exceeds
    // budget + the largest doc in it; concretely every shard has
    // pre-doc running mass < budget, so SUM(n_bpe) per (lang, shard)
    // stays below budget + MAX(n_bpe) on every route
    val sql =
      s"""SELECT p.lang AS lang, p.shard_id AS shard,
         |       SUM(p.n_bpe) AS toks, MAX(p.n_bpe) AS biggest
         |FROM d14_pack p, d14_docs x
         |WHERE p.doc_id = x.doc_id
         |GROUP BY p.lang, p.shard_id""".stripMargin
    val rows = CqcSql.solve(spark, sql).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (toks, biggest) = (r.getAs[Long]("toks"), r.getAs[Long]("biggest"))
      assert(toks < graft.datapipe.TextOps.shardBudget + biggest,
        s"shard ${r.getAs[Long]("shard")} of ${r.getAs[String]("lang")} overflows: $toks")
    }
    val stock = multiset(spark.sql(sql))
    assert(multiset(CqcSql.solve(spark, sql)) == stock)
  }
}
