package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame

/** Thirteenth adversarial battery (r12): the MAP-SIDE ARGMIN assignment,
  * the FILE-BACKED ingest gates, and the TRAIN/SCORE LM shape crossed
  * with the door. The r12 rebuilds changed the physical path of IVF
  * assignment (slim groupBy-max_by collapse + payload re-join, live
  * coarse restriction) and added parquet-backed deployment forms of the
  * gates and the LM model; this battery registers those outputs as door
  * relations and drives the door's hard features over them — outer peel
  * + subquery predicates (the r11 crash class), windows, ROLLUP, ranked
  * chains, NOT EXISTS, cross-relation decimal comparisons. Every shape
  * runs direct-eligible, forced-reduced, and stock, compared as
  * multisets. */
class DoorEdge13Spec extends SparkSpecBase with org.scalatest.BeforeAndAfterAll {

  // index/model parquet dirs created by views() — deleted once in
  // afterAll (r12 advice: repeated runs were accumulating /tmp artifacts)
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
    docs.createOrReplaceTempView("d13_docs")
    // FILE-BACKED gate outputs: index bucket-written to parquet, probe
    // reads it back (the cluster deployment shape, r12 entries)
    val mhDir = tempDir("d13_mh_index")
    Dedup.minhashIndex(docs).write(mhDir)
    Dedup.minhashStreamingFlag(docs.where(col("doc_id") % 10 === 0),
      Dedup.MinhashIndex.read(spark, mhDir))
      .createOrReplaceTempView("d13_mhfile")
    val ebDir = tempDir("d13_eb_index")
    Ann.embedIndex(emb).write(ebDir)
    Ann.embedStreamingFlag(emb.where(col("vec_id") % 10 === 0),
      Ann.EmbedIndex.read(spark, ebDir))
      .createOrReplaceTempView("d13_ebfile")
    // TRAIN/SCORE LM shape (CCNet deployment): curated slice trains,
    // whole corpus scored — fresh and via the parquet round-trip model
    val refSlice = docs.where(col("doc_id") % 10 === 0)
    TextOps.lmScore(docs, refSlice).createOrReplaceTempView("d13_lm")
    val lmDir = tempDir("d13_lm_model")
    TextOps.lmModel(refSlice).write(lmDir)
    TextOps.lmScoreWith(docs, TextOps.LmModel.read(spark, lmDir))
      .createOrReplaceTempView("d13_lmrt")
    // MAP-SIDE-ARGMIN assignment outputs: two-round IVF probe ranks and
    // both SemDeDup keep policies
    Ann.ivfTopK(emb, rounds = 2).createOrReplaceTempView("d13_ivf2")
    Ann.semanticDedup(emb).createOrReplaceTempView("d13_sem")
    Ann.semanticDedupGroup(emb).createOrReplaceTempView("d13_semg")
    // r12 growth outputs: IVFADC ranks and the fuzzy decontam decision
    Ann.ivfpqTopK(emb).createOrReplaceTempView("d13_ivfpq")
    Decontam.flagFuzzyDocuments(docs).createOrReplaceTempView("d13_dfz")
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

  test("correlated subquery on a PEELED side routes stock, not a binding crash") {
    // r12 fuzz find (CqcSqlPropertySpec subquery-peel generator, seed
    // 120211): a scalar subquery CORRELATED on the peeled outer-join
    // attr — its OuterReference nodes live inside the PlanExpression's
    // plan, unreachable by the attr-rename transform, so against the
    // renamed peeled frame they failed binding (ATTRIBUTE_NOT_FOUND out
    // of BindReferences). Must route to stock (traced fallback) and
    // match stock rows exactly. Pinned deterministically here because
    // fuzz seeds may rotate.
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
      .createOrReplaceTempView("d13p_edges")
    Seq((2L, 5L, 9L), (3L, 1L, 4L)).toDF("src", "dst", "w")
      .createOrReplaceTempView("d13p_rated")
    val sql =
      """SELECT g1.src AS s1, g2.dst AS d2, r.w AS w
        |FROM d13p_edges g1, (SELECT a.src AS src, b.dst AS dst
        |                     FROM d13p_edges a JOIN d13p_edges b ON a.dst = b.src) g2
        |LEFT OUTER JOIN d13p_rated r ON g2.dst = r.src
        |WHERE g1.dst = g2.src
        |  AND r.w <= (SELECT MAX(z.dst) + 6 FROM d13p_edges z WHERE z.src = r.src)""".stripMargin
    val door = multiset(CqcSql.solve(spark, sql))
    val stock = multiset(spark.sql(sql))
    assert(door == stock && door.nonEmpty, s"door $door vs stock $stock")
  }

  test("direct vs reduced vs stock agree on argmin/file-gate/LM-ref compositions") {
    views()
    battery(Seq(
      // file-backed lexical gate resolved through the corpus, per-band
      // aggregate with HAVING over the disk-probed flags
      "file_mh_gate_agg" ->
        """SELECT f.band AS band, COUNT(*) AS n, MIN(f.doc_id) AS first_doc
          |FROM d13_mhfile f, d13_docs x
          |WHERE f.doc_id = x.doc_id
          |GROUP BY f.band
          |HAVING COUNT(*) >= 1""".stripMargin,
      // the r11 crash class over an r12 output: OUTER peel of the
      // file-backed gate + IN-subquery predicate on the peeled side
      "peel_subq_file_gate" ->
        """SELECT x.doc_id AS doc_id, f.dup_of AS dup_of
          |FROM d13_docs x LEFT JOIN d13_mhfile f ON f.doc_id = x.doc_id
          |WHERE f.dup_of IN (SELECT doc_id FROM d13_docs WHERE lang = 'en')""".stripMargin,
      // file-backed embedding gate flags joined to the argmin cluster
      // decision, aggregated by the BOOLEAN keep verdict (group key over
      // a non-graph type; the two dedup algorithms disagree freely)
      "file_embed_keep_agg" ->
        """SELECT s.keep AS keep, COUNT(*) AS n, MAX(e.sim) AS best
          |FROM d13_ebfile e, d13_sem s
          |WHERE e.vec_id = s.vec_id
          |GROUP BY s.keep""".stripMargin,
      // fresh vs round-tripped LM model as TWO relations: decimal-exact
      // score equality is a cross-relation comparison (NULL scores on
      // short docs must drop identically on all three routes)
      "lm_rt_parity" ->
        """SELECT l.doc_id AS doc_id, l.lm_score AS fresh, r.lm_score AS rt
          |FROM d13_lm l, d13_lmrt r
          |WHERE l.doc_id = r.doc_id AND l.lm_score <= r.lm_score""".stripMargin,
      // LM scores of the TRAINING slice vs out-of-slice docs per lang:
      // aggregate over a join with a computed leaf filter
      "lm_slice_vs_crawl" ->
        """SELECT x.lang AS lang, COUNT(*) AS n, MAX(l.lm_score) AS best
          |FROM d13_lm l, d13_docs x
          |WHERE l.doc_id = x.doc_id AND x.doc_id % 10 <> 0
          |GROUP BY x.lang""".stripMargin,
      // window over the LM gate joined to the corpus: per-lang rank of
      // scores (ties broken by doc id) — the door's window path over an
      // r12-shaped relation
      "lm_rank_window" ->
        """SELECT x.lang AS lang, l.doc_id AS doc_id,
          |       ROW_NUMBER() OVER (PARTITION BY x.lang
          |                          ORDER BY l.lm_score DESC, l.doc_id) AS rn
          |FROM d13_lm l, d13_docs x
          |WHERE l.doc_id = x.doc_id AND l.lm_score IS NOT NULL""".stripMargin,
      // ROLLUP over (band, lang) of the file-backed embed gate flags —
      // grand total + per-band subtotals must agree across routes
      "file_gate_rollup" ->
        """SELECT e.band AS band, x.lang AS lang, COUNT(*) AS n
          |FROM d13_ebfile e, d13_docs x
          |WHERE e.vec_id = x.doc_id
          |GROUP BY ROLLUP(e.band, x.lang)""".stripMargin,
      // survivors of the GROUP keep policy with no 2-round IVF neighbor
      // entry: NOT EXISTS anti-join between two argmin-rewrite outputs
      "kept_no_neighbor" ->
        """SELECT g.vec_id AS vec_id, g.cid AS cid
          |FROM d13_semg g
          |WHERE g.keep
          |  AND NOT EXISTS (SELECT 1 FROM d13_ivf2 i WHERE i.nbr_id = g.vec_id)""".stripMargin,
      // ranked chain: 2-round IVF ranks joined to the per-vector cluster
      // decision, total order with id tie-breaks
      "ivf2_rank_chain" ->
        """SELECT i.q_id AS q_id, i.nbr_id AS nbr_id, i.rnk AS rnk, s.cid AS cid
          |FROM d13_ivf2 i, d13_sem s
          |WHERE i.nbr_id = s.vec_id
          |ORDER BY i.sim DESC, q_id ASC, nbr_id ASC LIMIT 9""".stripMargin,
      // CTE over both keep policies: per-cluster divergence counts —
      // the argmin rewrite must leave policy disagreement identical
      "policy_divergence_cte" ->
        """WITH dv AS (
          |  SELECT g.cid AS cid, g.vec_id AS vec_id
          |  FROM d13_semg g, d13_sem s
          |  WHERE g.vec_id = s.vec_id AND g.cid = s.cid AND g.keep <> s.keep)
          |SELECT cid, COUNT(*) AS n FROM dv GROUP BY cid""".stripMargin,
      // correlated EXISTS from the corpus into the file-backed gate
      "corpus_gate_exists" ->
        """SELECT x.doc_id AS doc_id, x.lang AS lang
          |FROM d13_docs x
          |WHERE EXISTS (SELECT 1 FROM d13_mhfile f WHERE f.doc_id = x.doc_id)""".stripMargin,
      // cross-relation comparison: 2-round IVF probe sim vs the cluster
      // decision sim (NULL sims on keepers must drop identically on all
      // three routes — the d12 sim_cmp shape over the ARGMIN-REWRITE
      // rounds=2 output)
      "ivf2_sim_cmp" ->
        """SELECT i.q_id AS q_id, i.nbr_id AS nbr_id, s.sim AS dup_sim
          |FROM d13_ivf2 i, d13_sem s
          |WHERE i.nbr_id = s.vec_id AND i.sim < s.sim""".stripMargin,
      // IVFADC ranks resolved to each neighbor's cluster decision,
      // ranked chain over the ADC estimate (decimal doubles as the
      // rank key)
      "ivfpq_rank_semcid" ->
        """SELECT p.q_id AS q_id, p.nbr_id AS nbr_id, p.rnk AS rnk, s.cid AS cid
          |FROM d13_ivfpq p, d13_sem s
          |WHERE p.nbr_id = s.vec_id
          |ORDER BY p.asim DESC, q_id ASC, nbr_id ASC LIMIT 9""".stripMargin,
      // fuzzy decontam decisions resolved through the corpus (aggregate
      // over a join with a nullable-free decision frame)
      "fuzzy_flag_langs" ->
        """SELECT x.lang AS lang, COUNT(*) AS n, MAX(f.best_jac) AS worst
          |FROM d13_dfz f, d13_docs x
          |WHERE f.doc_id = x.doc_id
          |GROUP BY x.lang""".stripMargin))
  }
}
