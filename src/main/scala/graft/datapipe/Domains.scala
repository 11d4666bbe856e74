package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Source-level domain/URL gating (r14) — the C4/RefinedWeb-style filter
 * that runs BEFORE any per-document quality decision: drop documents
 * from blocklisted domains, and cap how many documents any single domain
 * may contribute (real web corpora are hub-dominated: a handful of
 * domains contribute an outsized share of pages, and an uncapped crawl
 * lets one template farm swamp the training mix).
 *
 * Scale shape (the whole point of the operator):
 *  - the BLOCKLIST is a curated, driver-sized relation → broadcast
 *    anti-join; the corpus never shuffles for it.
 *  - the CAP decision frame is DOMAIN-CARDINALITY-sized: a map-side-
 *    combinable `groupBy(domain).count()` census (same class as
 *    [[Sketches.heavyHitters]]'s phase-2 exact count — and deliberately
 *    NOT its Misra-Gries candidate pass, whose recall guarantee is for
 *    frequencies above N/m: a FIXED per-domain cap sits far below N/m at
 *    corpus scale, so MG could silently miss over-cap domains; the exact
 *    census after partial aggregation is one slim exchange of
 *    (domain, count) pairs).
 *  - only the over-cap domains' documents pay a rank prune, and it is
 *    the salted two-level prune ([[graft.topk.RankJoin.prunePerKeySalted]]),
 *    NOT a raw `row_number() OVER (PARTITION BY domain)` — an over-cap
 *    domain is by construction a hot key, and the one-window form would
 *    land its entire row set on one reducer (the single-reducer class
 *    closed in r13). Documents of under-cap domains pass through on a
 *    broadcast anti-join with ZERO shuffle — at 100 TB that is almost
 *    the whole corpus.
 *
 * Cap semantics: keep each domain's `cap` LOWEST doc_ids (deterministic,
 * engine-portable; production would order by fetch priority or quality —
 * any total order slots in). Reference scope check: the reference engine
 * (hkustDB/SparkSQLPlus) has no corpus operators at all — this section
 * is graft's LLM-pipeline surface, designed from the C4/Gopher/
 * RefinedWeb data-curation literature.
 */
object Domains {

  /** Synthetic-corpus domain derivation: the test tables carry no URL
    * column, so the driver entries derive a deterministic domain from
    * (doc_id, source) with a REALISTIC skew profile — two hot domains
    * (a legitimate hub and a spam farm, 25% of the corpus each) and a
    * long tail of small domains. A real corpus swaps this projection
    * for `parse_url(url, 'HOST')`; everything downstream is unchanged. */
  val hotMod = 4
  val tailSlots = 211
  val hubDomain = "hub.example"
  val spamDomain = "spam.example"

  def domainOf: Column =
    // NULL-safe source (r14 review fix): a NULL source must not produce
    // a NULL domain — Spark's left_anti keeps NULL-key rows while SQL's
    // NOT IN drops them, so a NULL domain would diverge the engines
    when(col("doc_id") % hotMod === 0, lit(hubDomain))
      .when(col("doc_id") % hotMod === 1, lit(spamDomain))
      .otherwise(concat(lit("d"), pmod(col("doc_id"), lit(tailSlots.toLong)),
        lit("."), coalesce(col("source"), lit("")), lit(".example")))

  /** DuckDB mirror of [[domainOf]]. */
  val domainOfSql: String =
    s"""CASE WHEN doc_id % $hotMod = 0 THEN '$hubDomain'
       |     WHEN doc_id % $hotMod = 1 THEN '$spamDomain'
       |     ELSE 'd' || CAST(doc_id % $tailSlots AS VARCHAR) || '.' || coalesce(source, '') || '.example'
       |END""".stripMargin.replace("\n", " ")

  /** Driver-entry parameters: the spam farm is blocklisted, every other
    * domain contributes at most [[defaultCap]] documents. */
  val defaultCap = 10
  val defaultBlocklist: Seq[String] = Seq(spamDomain)

  /**
   * The gate: `docs` with a `domain` column attached, minus blocklisted
   * domains, capped at `cap` docs (lowest doc_id) per remaining domain.
   * Output keeps all input columns plus `domain`.
   *
   * `blocklist` is a 1-column (`domain`) curated relation — broadcast
   * by construction (a blocklist is human-maintained, thousands of rows
   * at most).
   */
  def domainCap(docs: DataFrame, domain: Column, cap: Int,
                blocklist: DataFrame): DataFrame = {
    require(cap >= 1, "domain cap must keep at least one document")
    val dd = docs.withColumn("domain", domain)
    val allowed = dd.join(broadcast(blocklist.select(col("domain"))),
      Seq("domain"), "left_anti")
    // exact census, map-side combined: the exchange carries one
    // (domain, count) pair per domain per partition, never documents
    val over = allowed.groupBy(col("domain")).count()
      .where(col("count") > cap).select(col("domain"))
    // under-cap domains (the overwhelming majority of a real crawl)
    // pass through on a broadcast anti-join — zero shuffle of their rows
    val pass = allowed.join(broadcast(over), Seq("domain"), "left_anti")
    // over-cap domains pay the salted two-level prune; doc_id is unique,
    // so the order is total and the two-level result is identical to the
    // one-window form (TopkSaltSpec's argument)
    val hot = allowed.join(broadcast(over), Seq("domain"), "left_semi")
    val kept = graft.topk.RankJoin.prunePerKeySalted(
      hot, Seq("domain"), Seq(col("doc_id").asc), cap, saltOn = col("doc_id"))
    pass.unionByName(kept)
  }

  /** The default-parameter gate (synthetic domains, spam blocklisted,
    * cap [[defaultCap]]): the corpus frame that survives, original
    * columns intact — composes in FRONT of [[Prep.keptCorpus]]'s quality
    * gates (cheapest filter first: a blocked or over-cap document should
    * never be scored). */
  def gate(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    domainCap(docs, domainOf, defaultCap, defaultBlocklist.toDF("domain"))
      .drop("domain")
  }

  /** The composed driver entry: synthetic domains, spam blocklisted,
    * cap [[defaultCap]] — one slim row per kept document. */
  def capDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    domainCap(docs, domainOf, defaultCap, defaultBlocklist.toDF("domain"))
      .select(col("doc_id"), col("domain"))
  }

  /** DuckDB mirror of [[capDocuments]]: the one-window rank form — the
    * semantics the salted split-prune is proven equal to. */
  val capDocumentsSql: String =
    s"""SELECT doc_id, domain FROM (
       |  SELECT doc_id, domain,
       |         row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS __rn
       |  FROM (SELECT doc_id, $domainOfSql AS domain FROM documents)
       |  WHERE domain NOT IN (${defaultBlocklist.map(d => s"'$d'").mkString(", ")})
       |) WHERE __rn <= $defaultCap""".stripMargin

  // ----------------------------------------------------- URL canonical dedup

  /** Synthetic URL with a REALISTIC decoration profile: mixed-case
    * authority, explicit default port, and per-row variants (trailing
    * slash / pure-tracking query / fragment) over a shared canonical target
    * (`doc_id div 3` → up to 3 differently-decorated copies of one
    * logical URL). A real corpus replaces this projection with its url
    * column; everything downstream is unchanged. */
  def urlOf: Column = {
    // host derives ENTIRELY from the GROUP id (doc_id div 3) — the
    // three docs of a group share host + path and differ only in
    // decoration, so the canonical actually collides in EVERY host
    // class (a per-doc component like `source` would keep tail-group
    // canonicals distinct and never exercise the collapse there —
    // r14 review find)
    val g = expr("doc_id div 3L")
    val host = when(g % hotMod === 0, lit(hubDomain))
      .when(g % hotMod === 1, lit(spamDomain))
      .otherwise(concat(lit("d"), pmod(g, lit(tailSlots.toLong)), lit(".example")))
    concat(lit("HTTPS://"),
      when(col("doc_id") % 2 === 0, upper(host)).otherwise(host),
      lit(":443/p/"), g,
      // decorations cover the whole canonicalization chain, including
      // MULTI-utm queries, a REAL param behind tracking params (the
      // amp-repair path), and a fragment behind a query
      when(col("doc_id") % 4 === 0, lit("/"))
        .when(col("doc_id") % 4 === 1, lit("?utm_source=x&utm_campaign=y"))
        .when(col("doc_id") % 4 === 2, lit("?utm_source=x&id=7#frag"))
        .otherwise(lit("")))
  }

  /** DuckDB mirror of [[urlOf]]. */
  val urlOfSql: String = {
    val hostSql =
      s"""CASE WHEN (doc_id // 3) % $hotMod = 0 THEN '$hubDomain'
         |     WHEN (doc_id // 3) % $hotMod = 1 THEN '$spamDomain'
         |     ELSE 'd' || CAST((doc_id // 3) % $tailSlots AS VARCHAR) || '.example'
         |END""".stripMargin.replace("\n", " ")
    s"""'HTTPS://' || CASE WHEN doc_id % 2 = 0 THEN upper($hostSql)
       |                   ELSE $hostSql END
       | || ':443/p/' || CAST(doc_id // 3 AS VARCHAR)
       | || CASE WHEN doc_id % 4 = 0 THEN '/'
       |         WHEN doc_id % 4 = 1 THEN '?utm_source=x&utm_campaign=y'
       |         WHEN doc_id % 4 = 2 THEN '?utm_source=x&id=7#frag'
       |         ELSE '' END""".stripMargin.replace("\n", " ")
  }

  /**
   * C4-style URL canonicalization: lowercase the scheme+authority,
   * strip the default https port, the fragment, ALL tracking (`utm_*`)
   * params, and a trailing slash; if the stripped params left a real
   * param dangling behind `&`, repair it to `?`. Cross-engine
   * multi-match care (the r14 review find): Spark's `regexp_replace`
   * replaces ALL matches while DuckDB's default replaces the FIRST —
   * the utm strip (legitimately multi-match) carries the `'g'` flag in
   * the DuckDB mirror, and every other pattern is anchored so it can
   * match at most once in both engines. Pure projection — no shuffle.
   */
  def canonicalUrl(url: Column): Column = {
    val auth = lower(regexp_extract(url, "^([^/]*//[^/]*)", 1))
    val rest = regexp_replace(url, "^[^/]*//[^/]*", "")
    val noPort = regexp_replace(auth, ":443$", "")
    val noFrag = regexp_replace(rest, "#.*$", "")
    val noUtm = regexp_replace(noFrag, "[?&]utm_[^&#]*", "")
    // '?utm_a=1&id=7' strips to '&id=7' — the surviving first param
    // must be repaired to '?' (anchored + [^?&] ⇒ at most one match)
    val fixAmp = regexp_replace(noUtm, "^([^?&]*)&", "$1?")
    val noSlash = regexp_replace(fixAmp, "/$", "")
    concat(noPort, noSlash)
  }

  /** DuckDB mirror of [[canonicalUrl]] applied to `$x` (backreference
    * syntax is `\\1` there vs Spark's `$1`; the utm strip carries `'g'`
    * to match Spark's replace-all). */
  def canonicalUrlSql(x: String): String =
    s"""regexp_replace(lower(regexp_extract($x, '^([^/]*//[^/]*)', 1)), ':443$$', '')
       | || regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |      regexp_replace($x, '^[^/]*//[^/]*', ''),
       |      '#.*$$', ''), '[?&]utm_[^&#]*', '', 'g'),
       |      '^([^?&]*)&', '\\1?'), '/$$', '')""".stripMargin
      .replace("\n", " ")

  /**
   * URL-level exact dedup (the C4 crawl stage BEFORE any text look):
   * group by canonical URL, keep the lowest doc_id — one partial
   * min(struct) aggregate, never a window. Emits one row per canonical
   * URL: the kept doc and how many decorated variants collapsed into
   * it (the dedup evidence a crawl report wants).
   */
  def urlDedup(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), canonicalUrl(urlOf).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_variants"))

  /** DuckDB mirror of [[urlDedup]]. */
  val urlDedupSql: String =
    s"""WITH u AS (SELECT doc_id, ${canonicalUrlSql(s"($urlOfSql)")} AS canon_url
       |           FROM documents)
       |SELECT canon_url, min(doc_id) AS keep_id,
       |       CAST(count(*) AS BIGINT) AS n_variants
       |FROM u GROUP BY canon_url""".stripMargin

  /** [[capDocuments]]'s gate as a `documents`-shadowing CTE prefix (the
    * [[Decontam.plantNearDupsCte]] pattern) — lets any composed oracle
    * run over the domain-gated corpus without changing its own text. */
  val gateCte: String =
    s"""documents AS (
       |  SELECT doc_id, text, lang, source, n_chars FROM (
       |    SELECT d.*,
       |           row_number() OVER (PARTITION BY $domainOfSql
       |                              ORDER BY doc_id) AS __rn
       |    FROM main.documents d
       |    WHERE ($domainOfSql) NOT IN (${defaultBlocklist.map(x => s"'$x'").mkString(", ")})
       |  ) WHERE __rn <= $defaultCap
       |)""".stripMargin
}
