package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables
import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame

/** Eleventh adversarial battery (r9): the DIRECT route crossed with
  * DATAPIPE and STREAMING(batch-form) compositions — the r8 verdict's
  * suggested theme. Real pipelines feed operator OUTPUTS back through
  * the SQL door (a dedup decision joined to its corpus, chunk adjacency
  * self-joins, sessionized events against dimensions): these derived
  * relations are small after filtering, so they are exactly the inputs
  * the cost gate routes direct — and they carry the door's hard
  * features (computed-expression equalities, cross-relation
  * comparisons, aggregates, EXISTS leaves, CTEs) over NON-GRAPH schemas
  * (strings, doubles, timestamps). Every shape runs direct-eligible,
  * forced-reduced, and stock, compared as multisets. */
class DoorEdge11Spec extends SparkSpecBase {

  private def views(): Unit = {
    import graft.datapipe._
    val docs = Tables.documents(spark, sfDir)
    docs.createOrReplaceTempView("d11_docs")
    // datapipe operator outputs as door relations
    TextOps.quality(docs).createOrReplaceTempView("d11_quality")
    TextOps.langId(docs).createOrReplaceTempView("d11_lang")
    TextOps.chunk(docs).createOrReplaceTempView("d11_chunk")
    TextOps.tokenCounts(docs).createOrReplaceTempView("d11_tokens")
    Dedup.exact(docs).createOrReplaceTempView("d11_dedup")
    // streaming entries' batch forms (the parity surface the streaming
    // specs pin) as door relations
    EventStreams.sessionize(Tables.events(spark, sfDir))
      .createOrReplaceTempView("d11_sessions")
    EventStreams.windowedAgg(Tables.events(spark, sfDir))
      .createOrReplaceTempView("d11_windows")
    Tables.customer(spark, sfDir).createOrReplaceTempView("d11_customer")
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

  test("direct vs reduced vs stock agree on datapipe/streaming compositions") {
    views()
    battery(Seq(
      // dedup keepers joined back to the corpus
      "dedup_keepers" ->
        """SELECT d.keep_id AS keep_id, d.n_copies AS n_copies, x.lang AS lang
          |FROM d11_dedup d, d11_docs x
          |WHERE d.keep_id = x.doc_id""".stripMargin,
      // chunk adjacency: computed-expression equality on chunk_id
      "chunk_adjacency" ->
        """SELECT c1.doc_id AS doc_id, c1.chunk_id AS i, c2.n_words AS next_words
          |FROM d11_chunk c1, d11_chunk c2
          |WHERE c1.doc_id = c2.doc_id AND c1.chunk_id + 1 = c2.chunk_id""".stripMargin,
      // CROSS-RELATION comparison between two operator outputs
      "tokens_vs_quality_cmp" ->
        """SELECT q.doc_id AS doc_id, q.n_tokens AS n_tokens, t.n_bpe AS n_bpe
          |FROM d11_quality q, d11_tokens t
          |WHERE q.doc_id = t.doc_id AND t.n_bpe > q.n_tokens""".stripMargin,
      // aggregate over a dedup-gated three-way join (fast-path shape)
      "dedup_gated_agg" ->
        """SELECT x.lang AS lang, COUNT(*) AS n, MAX(q.score) AS best
          |FROM d11_dedup d, d11_docs x, d11_quality q
          |WHERE d.keep_id = x.doc_id AND x.doc_id = q.doc_id
          |GROUP BY x.lang""".stripMargin,
      // sessionized events joined to the customer dimension + filter
      "sessions_x_customer" ->
        """SELECT s.user_id AS user_id, c.c_mktsegment AS seg, s.n_events AS n
          |FROM d11_sessions s, d11_customer c
          |WHERE s.user_id = c.c_custkey AND s.n_events >= 2""".stripMargin,
      // windowed aggregates self-join: same window, ordered event types
      "window_selfjoin" ->
        """SELECT a.ws_ms AS ws, a.event_type AS t1, b.event_type AS t2,
          |       a.n_events AS n1, b.val_sum AS v2
          |FROM d11_windows a, d11_windows b
          |WHERE a.ws_ms = b.ws_ms AND a.event_type < b.event_type""".stripMargin,
      // duplicate groups (n_copies > 1) chained through quality + langid
      "dup_three_way" ->
        """SELECT d.keep_id AS keep_id, q.score AS score, l.pred_lang AS pl
          |FROM d11_dedup d, d11_quality q, d11_lang l
          |WHERE d.keep_id = q.doc_id AND q.doc_id = l.doc_id
          |  AND d.n_copies >= 1""".stripMargin,
      // ranked-chain shape over session lengths (ORDER BY + LIMIT)
      "session_topk" ->
        """SELECT s.user_id AS user_id, s.n_events AS n, c.c_acctbal AS bal
          |FROM d11_sessions s, d11_customer c
          |WHERE s.user_id = c.c_custkey
          |ORDER BY n DESC, user_id ASC, bal ASC LIMIT 7""".stripMargin,
      // EXISTS over the chunk table (subquery-predicate leaf routing)
      "exists_chunked" ->
        """SELECT q.doc_id AS doc_id, q.n_tokens AS n_tokens
          |FROM d11_quality q
          |WHERE EXISTS (SELECT 1 FROM d11_chunk c
          |              WHERE c.doc_id = q.doc_id AND c.chunk_id >= 2)""".stripMargin,
      // CTE-wrapped composition: kept corpus re-joined on language
      "cte_gated_mix" ->
        """WITH kept AS (
          |  SELECT x.doc_id AS doc_id, x.lang AS lang, q.n_tokens AS n_tokens
          |  FROM d11_dedup d, d11_docs x, d11_quality q
          |  WHERE d.keep_id = x.doc_id AND x.doc_id = q.doc_id)
          |SELECT k1.lang AS lang, COUNT(*) AS pairs
          |FROM kept k1, kept k2
          |WHERE k1.lang = k2.lang AND k1.doc_id < k2.doc_id
          |GROUP BY k1.lang""".stripMargin))
  }
}
