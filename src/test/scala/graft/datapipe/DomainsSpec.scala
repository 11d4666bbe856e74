package graft.datapipe

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Domain/URL gate (r14): blocklist anti-join + per-domain document cap,
  * with the over-cap (hot) domains pruned by the salted two-level form
  * rather than a single hot-key window. */
class DomainsSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = graft.sources.Tables.documents(spark, sfDir)

  test("split-prune gate equals the naive one-window rank form") {
    val got = Domains.capDocuments(docs)
    // naive semantics straight off the scaladoc: blocklist filter, then
    // row_number over domain, keep rn <= cap — the single-window plan
    // the operator exists to avoid at scale
    val naive = docs.select(col("doc_id"), Domains.domainOf.as("domain"))
      .where(!col("domain").isin(Domains.defaultBlocklist: _*))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("domain").orderBy("doc_id")))
      .where(col("__rn") <= Domains.defaultCap)
      .select("doc_id", "domain")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("planted hot domain is capped, blocklisted domain is gone, tail passes") {
    val kept = Domains.capDocuments(docs).collect()
    val byDomain = kept.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // the synthetic derivation PLANTS a 25%-of-corpus hub domain; the
    // gate must cut it to exactly the cap, keeping the LOWEST doc_ids
    assert(byDomain(Domains.hubDomain) === Domains.defaultCap)
    val hubIds = kept.filter(_.getString(1) == Domains.hubDomain)
      .map(_.getLong(0)).sorted
    assert(hubIds.toSeq === (0 until Domains.defaultCap).map(_.toLong * Domains.hotMod))
    // the spam farm (also 25% of the corpus) is blocklisted outright
    assert(!byDomain.contains(Domains.spamDomain))
    // long-tail domains are under cap and pass through COMPLETE: every
    // tail doc of the input survives
    val tailIn = docs.select(col("doc_id"))
      .where(col("doc_id") % Domains.hotMod >= 2).as[Long].collect().toSet
    val tailOut = kept.filter(r => r.getString(1) != Domains.hubDomain)
      .map(_.getLong(0)).toSet
    assert(tailOut === tailIn)
    assert(byDomain.filter(_._1 != Domains.hubDomain).values.max <= Domains.defaultCap)
  }

  test("cap survives k=1 and a cap above the hot-domain mass (no-op)") {
    val bl = Seq.empty[String].toDF("domain")
    val one = Domains.domainCap(docs, Domains.domainOf, 1, bl)
    // one doc per domain, and it is each domain's min doc_id
    val perDomain = one.groupBy("domain")
      .agg(count(lit(1)).as("n"), min("doc_id").as("mn"), max("doc_id").as("mx"))
      .collect()
    assert(perDomain.forall(_.getLong(1) == 1L))
    assert(perDomain.forall(r => r.getLong(2) == r.getLong(3)))
    val n = docs.count()
    val huge = Domains.domainCap(docs, Domains.domainOf, n.toInt + 1, bl)
    assert(huge.count() === n)
  }

  test("gate keeps the full document schema for pipeline fusion") {
    val gated = Domains.gate(docs)
    assert(gated.columns.sorted.toSeq === docs.columns.sorted.toSeq)
    // fused prep runs end-to-end on the gated corpus
    assert(Prep.prepare(docs, domainGate = true).count() > 0)
  }

  test("fully-fused build: gated corpus is a strict subset, BPE budgets hold") {
    val full = Prep.build(docs, domainGate = true, realBpe = true)
      .agg(sum("n_docs"), sum("toks")).head()
    val base = Prep.build(docs).agg(sum("n_docs"), sum("toks")).head()
    // the domain gate can only DROP documents ahead of the gates
    assert(full.getLong(0) < base.getLong(0))
    // and the exact tokenizer counts differ from the len/4 heuristic
    assert(full.getLong(1) !== base.getLong(1))
  }

  test("canonicalUrl: each decoration strips; distinct canonicals stay distinct") {
    import spark.implicits._
    val got = Seq(
      "HTTPS://Hub.Example:443/p/5/",          // case + port + trailing slash
      "https://hub.example/p/5?utm_source=x&utm_campaign=y", // ALL utm strip
      "https://hub.example/p/5#frag",          // fragment
      "https://hub.example/p/5",               // already canonical
      "https://hub.example/p/6",               // different path
      "https://other.example/p/5"              // different host
    ).toDF("url").select(Domains.canonicalUrl(col("url")).as("c"))
      .as[String].collect().toSeq
    assert(got.take(4).toSet == Set("https://hub.example/p/5"))
    assert(got(4) == "https://hub.example/p/6")
    assert(got(5) == "https://other.example/p/5")
    // a REAL query param survives the utm strip WELL-FORMED, whichever
    // side of the tracking params it sits on (the amp-repair path) —
    // and stays canonically distinct from the bare URL
    val kept = Seq(
      "https://hub.example/p/5?id=7&utm_source=x",
      "https://hub.example/p/5?utm_source=x&id=7",
      "https://hub.example/p/5?utm_source=x&id=7&utm_campaign=y#frag")
      .toDF("url").select(Domains.canonicalUrl(col("url")).as("c"))
      .as[String].collect().toSeq
    assert(kept.toSet == Set("https://hub.example/p/5?id=7"))
  }

  test("urlDedup collapses decorated variants onto one kept doc, never a window") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val out = Domains.urlDedup(docs)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // synthetic contract: doc_id div 3 shares a canonical target when the
    // host also matches, so SOME canonical has >1 variant and the keeper
    // is the group minimum
    assert(rows.exists(_.getAs[Long]("n_variants") > 1))
    val total = rows.map(_.getAs[Long]("n_variants")).sum
    assert(total == docs.count()) // partition of the corpus, nothing lost
    // scale shape: one partial aggregate, no window
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Window"), plan)
  }
}
