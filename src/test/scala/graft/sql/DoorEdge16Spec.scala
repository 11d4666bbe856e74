package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame

/** Sixteenth adversarial battery (r14, second wave): the round's late
  * growth surfaces — temperature language mixing, the count-min sketch,
  * SQ8 dequantized serving, the Bloom cross-refresh gate, and the
  * domain gate — registered as door relations and driven through the
  * door's hard features, including the r14 explicit SEMI/ANTI join
  * syntax, outer peel + eager aggregates, ROLLUP, windows, ranked
  * chains, and subquery predicates. Every shape runs direct-eligible,
  * forced-reduced, and stock, compared as multisets; empty results
  * fail the battery. */
class DoorEdge16Spec extends SparkSpecBase {

  private def views(): Unit = {
    import graft.datapipe._
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    docs.createOrReplaceTempView("d16_docs")
    TextOps.mixByLanguage(docs).createOrReplaceTempView("d16_mixlang")
    Sketches.cmsDomainCounts(docs).createOrReplaceTempView("d16_cms")
    Ann.sq8TopK(emb).createOrReplaceTempView("d16_sq8")
    Dedup.bloomFlagDocuments(docs).createOrReplaceTempView("d16_bloom")
    docs.select(col("doc_id"), Domains.domainOf.as("domain"), col("lang"))
      .createOrReplaceTempView("d16_dom")
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

  test("direct vs reduced vs stock agree on mixlang/cms/sq8/bloom/domain compositions") {
    views()
    battery(Seq(
      // SEMI over the sketch: domains whose CMS row overcounted, kept
      // only if a document actually carries them (the r14 semi peel
      // over a non-trivial probe side)
      "cms_semi_domains" ->
        """SELECT c.domain AS domain, c.est AS est
          |FROM d16_cms c LEFT SEMI JOIN d16_dom d ON d.domain = c.domain
          |WHERE c.est >= c.n""".stripMargin,
      // ANTI over the Bloom gate: never-seen docs per language with an
      // eager aggregate above the anti filter
      "bloom_anti_unseen" ->
        """SELECT x.lang AS lang, COUNT(*) AS n_unseen
          |FROM d16_docs x LEFT ANTI JOIN d16_bloom b ON b.doc_id = x.doc_id
          |GROUP BY x.lang""".stripMargin,
      // ROLLUP over the temperature mix joined back to the corpus:
      // per-(lang, source) doc counts weighted by the mix rate
      "mixlang_rollup" ->
        """SELECT m.lang AS lang, x.source AS source,
          |       COUNT(*) AS n, SUM(m.docs_out) AS mass
          |FROM d16_mixlang m, d16_docs x
          |WHERE m.lang = x.lang
          |GROUP BY ROLLUP(m.lang, x.source)""".stripMargin,
      // WINDOW re-rank of the SQ8 serving output: the door's window
      // path must reproduce the stored rank exactly
      "sq8_window_rerank" ->
        """SELECT s.q_id AS q_id, s.nbr_id AS nbr_id, s.rnk AS stored,
          |       ROW_NUMBER() OVER (PARTITION BY s.q_id
          |                          ORDER BY s.asim DESC, s.nbr_id) AS rerank
          |FROM d16_sq8 s""".stripMargin,
      // OUTER peel + inner eager agg: every doc with its bloom verdict,
      // counted per (lang, flagged) cell
      "bloom_outer_cells" ->
        """SELECT x.lang AS lang, b.maybe_seen AS flagged, COUNT(*) AS n
          |FROM d16_docs x LEFT JOIN d16_bloom b ON b.doc_id = x.doc_id
          |GROUP BY x.lang, b.maybe_seen""".stripMargin,
      // subquery predicate over the sketch: docs whose domain the CMS
      // measured as a singleton
      "cms_subq_singletons" ->
        """SELECT d.lang AS lang, COUNT(*) AS n
          |FROM d16_dom d
          |WHERE d.domain IN (SELECT domain FROM d16_cms WHERE n = 1)
          |GROUP BY d.lang""".stripMargin,
      // ranked chain: SQ8 hits joined to document metadata (vec and doc
      // id spaces coincide in the testdata), top-10 by similarity
      "sq8_ranked_chain" ->
        """SELECT s.q_id AS q_id, s.nbr_id AS nbr_id, x.lang AS lang
          |FROM d16_sq8 s, d16_docs x
          |WHERE s.nbr_id = x.doc_id
          |ORDER BY s.asim DESC, s.q_id ASC, s.nbr_id ASC LIMIT 10""".stripMargin,
      // computed comparison over the mix rates: languages more than 10%
      // from the uniform fixed point, crossed with the domain census
      "mixlang_computed_cmp" ->
        """SELECT m.lang AS lang, c.n AS domain_n
          |FROM d16_mixlang m, d16_dom d, d16_cms c
          |WHERE m.lang = d.lang AND d.domain = c.domain
          |  AND (m.w > 1.1 OR m.w < 0.9)
          |  AND c.n > 100""".stripMargin,
      // semi + anti CROSS: languages that survive the mix gate AND have
      // more than 50 never-seen docs — both r14 peels in one tree, with
      // a HAVING above the anti join making the subquery genuinely
      // selective (only the head language clears 50 unseen at sf0.001;
      // the r14 review killed the previous provably-empty-subquery form)
      "semi_anti_cross" ->
        """SELECT m.lang AS lang, m.docs_out AS kept
          |FROM d16_mixlang m
          |LEFT SEMI JOIN d16_docs x ON x.lang = m.lang
          |WHERE m.lang IN (SELECT x2.lang FROM d16_docs x2
          |                 LEFT ANTI JOIN d16_bloom b ON b.doc_id = x2.doc_id
          |                 GROUP BY x2.lang HAVING COUNT(*) > 50)""".stripMargin))
  }
}
