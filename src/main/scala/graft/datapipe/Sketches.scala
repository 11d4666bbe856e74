package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Sketch-based approximate aggregates — the operators a corpus-scale
 * profiling pass actually runs, where exact answers would shuffle the
 * full key set:
 *
 *  - HLL++ distinct counting (`approx_count_distinct`): the sketch is a
 *    fixed-size register array, mergeable and map-side combinable, so
 *    vocabulary cardinality over 100 TB costs one scan + a tiny merge
 *    tree — the exact COUNT(DISTINCT) shuffles every distinct token.
 *    Hash-based with commutative register-max merge: repeated runs give
 *    identical estimates regardless of partitioning.
 *  - quantile summaries (`percentile_approx`, Greenwald-Khanna): bounded
 *    per-partition state with a mergeable summary; rank error is bounded
 *    by n/accuracy for ANY merge order, not by the data size.
 *
 * The raw estimates cannot be DuckDB-hash-verified (different sketch
 * implementations give different — equally valid — estimates), so the
 * driver-facing `*Checked` forms emit the EXACT companion columns plus a
 * deterministic within-bounds flag computed in-query against the
 * sketch's accuracy contract; the oracle reproduces the exact columns
 * and expects the flags to be true. SketchesSpec additionally pins the
 * contract on the raw estimates.
 */
object Sketches {

  /** HLL++ relative standard deviation (default Spark rsd is 0.05). */
  val hllRsd = 0.02

  /** Approximate vs exact distinct-token cardinality per language —
    * the raw profiling output (spec-pinned). */
  def tokenCardinality(docs: DataFrame): DataFrame =
    docs.select(col("lang"), explode(TextOps.words(col("text"))).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("lang"))
      .agg(
        approx_count_distinct(col("term"), hllRsd).as("approx_terms"),
        countDistinct(col("term")).as("exact_terms"))

  /** Driver-gate form: exact cardinality next to an `hll_ok` flag —
    * |approx - exact| / exact <= 3*rsd. The estimate is hash-based and
    * order-independent, so the flag is stable across runs and
    * partitionings; at 3 standard deviations it is an honest accuracy
    * contract, not a tautology. */
  def tokenCardinalityChecked(docs: DataFrame): DataFrame =
    tokenCardinality(docs)
      .select(col("lang"), col("exact_terms"),
        (abs(col("approx_terms").cast("double") - col("exact_terms")) <=
          lit(3 * hllRsd) * col("exact_terms")).as("hll_ok"))

  /** Oracle: the exact side in DuckDB (same single-space tokenization),
    * flags expected true. */
  val tokenCardinalityCheckedSql: String =
    """SELECT lang, CAST(count(DISTINCT term) AS BIGINT) AS exact_terms,
      |       true AS hll_ok
      |FROM (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
      |WHERE len(term) > 0
      |GROUP BY lang""".stripMargin

  /** lgConfigK for the Datasketches HLL union path: 2^12 registers →
    * rsd ≈ 1.04 / sqrt(4096) ≈ 1.63%. */
  val hllLgK = 12
  private val hllUnionRsd = 1.04 / math.sqrt((1 << hllLgK).toDouble)

  /** The MERGEABLE-sketch pattern made explicit (the 100 TB profiling
    * shape): each shard builds its own HLL sketch of the per-language
    * term set independently (`hll_sketch_agg` — here shards are doc_id
    * parity; on a cluster they are partitions or ingest days), and only
    * the fixed-size sketches meet in the merge (`hll_union_agg`). The
    * raw term sets never co-shuffle — the merge payload is
    * shards x 2^lgK bytes, independent of corpus size. */
  def shardedCardinality(docs: DataFrame): DataFrame = {
    val terms = docs.select(col("lang"), (col("doc_id") % 2).as("shard"),
        explode(TextOps.words(col("text"))).as("term"))
      .where(length(col("term")) > 0)
    val perShard = terms.groupBy(col("lang"), col("shard"))
      .agg(hll_sketch_agg(col("term"), lit(hllLgK)).as("sk"))
    perShard.groupBy(col("lang"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .as("approx_terms"))
  }

  /** Driver-gate form: merged-sketch estimate next to the exact distinct
    * count and a 3-sigma within-bounds flag (same contract style as
    * [[tokenCardinalityChecked]]). */
  def shardedCardinalityChecked(docs: DataFrame): DataFrame = {
    val exact = docs.select(col("lang"), explode(TextOps.words(col("text"))).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("lang")).agg(countDistinct(col("term")).as("exact_terms"))
    shardedCardinality(docs).join(exact, "lang")
      .select(col("lang"), col("exact_terms"),
        (abs(col("approx_terms").cast("double") - col("exact_terms")) <=
          lit(3 * hllUnionRsd) * col("exact_terms")).as("hll_union_ok"))
  }

  val shardedCardinalityCheckedSql: String =
    """SELECT lang, CAST(count(DISTINCT term) AS BIGINT) AS exact_terms,
      |       true AS hll_union_ok
      |FROM (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
      |WHERE len(term) > 0
      |GROUP BY lang""".stripMargin

  /** GK summary accuracy: rank error is bounded by n/accuracy. */
  val gkAccuracy = 10000

  /** Per-event-type value quantiles (p50/p95/p99) via mergeable
    * Greenwald-Khanna summaries, next to min/max as sanity bounds —
    * the raw profiling output (spec-pinned). */
  def valueQuantiles(events: DataFrame, accuracy: Int = gkAccuracy): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        percentile_approx(col("value"),
          array(lit(0.5), lit(0.95), lit(0.99)), lit(accuracy)).as("q"),
        count(lit(1)).as("n"),
        min(col("value")).as("v_min"),
        max(col("value")).as("v_max"))
      .select(col("event_type"), col("n"),
        col("q").getItem(0).as("p50"),
        col("q").getItem(1).as("p95"),
        col("q").getItem(2).as("p99"),
        col("v_min"), col("v_max"))

  /** Driver-gate form: each estimated quantile p of target rank q*n is
    * verified IN-QUERY against the exact rank contract —
    * `count(v < p) <= (q+eps)*n` and `count(v <= p) >= (q-eps)*n` with
    * eps = 1/accuracy. The GK guarantee holds for every merge order, so
    * the flags are deterministic; the second pass computing exact ranks
    * is a broadcast join of the tiny per-type summaries back to the
    * facts — verification machinery, not part of the production
    * profile. */
  def valueQuantilesChecked(events: DataFrame, accuracy: Int = gkAccuracy): DataFrame = {
    val eps = 1.0 / accuracy
    val q = valueQuantiles(events, accuracy)
      .select(col("event_type").as("qt"), col("n"), col("v_min"), col("v_max"),
        col("p50"), col("p95"), col("p99"))
    def okFlag(p: String, target: Double) =
      (sum(when(col("value") < col(p), 1L).otherwise(0L)) <=
        (lit(target) + lit(eps)) * col("n").cast("double")) &&
        (sum(when(col("value") <= col(p), 1L).otherwise(0L)) >=
          (lit(target) - lit(eps)) * col("n").cast("double"))
    events.join(broadcast(q), col("event_type") === col("qt"))
      .groupBy(col("event_type"), col("n"), col("v_min"), col("v_max"))
      .agg(
        okFlag("p50", 0.5).as("p50_ok"),
        okFlag("p95", 0.95).as("p95_ok"),
        okFlag("p99", 0.99).as("p99_ok"))
      .select(col("event_type"), col("n"), col("v_min"), col("v_max"),
        col("p50_ok"), col("p95_ok"), col("p99_ok"))
  }

  /** Oracle: exact per-type counts and bounds, flags expected true. */
  val valueQuantilesCheckedSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       min(value) AS v_min, max(value) AS v_max,
      |       true AS p50_ok, true AS p95_ok, true AS p99_ok
      |FROM events
      |GROUP BY event_type""".stripMargin

  /** Heavy-hitter candidate capacity: the Misra-Gries guarantee is that
    * every term with global frequency > N/m survives the candidate pass,
    * so `m` must exceed 1/fraction (4000 > 1/0.0005). */
  val mgCapacity = 4000

  /**
   * Frequency heavy hitters over the token stream: every term occurring
   * in at least `fraction` of all tokens, with its EXACT count — the
   * corpus-profiling op behind stopword lists and tokenizer audits.
   *
   * Two-phase at scale: (1) a per-partition Misra-Gries pass
   * (`mapPartitions`, bounded at [[mgCapacity]] counters — genuinely
   * imperative per-partition state, the documented reason to drop below
   * Catalyst) emits a candidate set; the union of partition candidates
   * provably contains every global heavy hitter with frequency > N/m.
   * (2) candidates broadcast back and ONLY their occurrences are
   * counted exactly — the full token key set never shuffles, which at
   * 100 TB is the difference between a candidate-sized aggregate and a
   * vocabulary-sized one. Output is exact, so the DuckDB oracle
   * reproduces it directly.
   */
  def heavyHitters(docs: DataFrame, fraction: Double = 0.0005): DataFrame = {
    require(mgCapacity > 1 / fraction,
      s"Misra-Gries capacity $mgCapacity cannot guarantee fraction $fraction")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(explode(TextOps.words(col("text"))).as("term"))
      .where(length(col("term")) > 0)
    val candidates = toks.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap[String, Long]()
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters(t) = c + 1
          case None if counters.size < mgCapacity => counters(t) = 1L
          case None =>
            // decrement-all: drops every counter by one (the classic
            // Misra-Gries step); survivors keep their slot
            val dead = scala.collection.mutable.ArrayBuffer[String]()
            counters.keysIterator.foreach { k =>
              val c = counters(k) - 1
              if (c == 0) dead += k else counters(k) = c
            }
            dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("term").distinct()
    val tot = toks.agg(count(lit(1)).as("n_tokens"))
    toks.join(broadcast(candidates), Seq("term"), "left_semi")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .where(col("cnt").cast("double") >= lit(fraction) * col("n_tokens").cast("double"))
      .select(col("term"), col("cnt"))
  }

  /** Oracle: the exact heavy-hitter set in DuckDB. */
  val heavyHittersSql: String =
    """WITH toks AS (SELECT term FROM (SELECT unnest(string_split(text, ' ')) AS term
      |                                FROM documents) WHERE len(term) > 0)
      |SELECT term, CAST(count(*) AS BIGINT) AS cnt
      |FROM toks GROUP BY term
      |HAVING CAST(count(*) AS DOUBLE) >= 0.0005 * (SELECT CAST(count(*) AS DOUBLE) FROM toks)""".stripMargin

  // ------------------------------------------------- count-min sketch

  /** CMS geometry: depth x width cells. Overestimate error is bounded by
    * 2N/width with probability 1 - 2^-depth (Cormode-Muthukrishnan); at
    * corpus scale width is sized to the tolerated absolute error — the
    * sketch stays depth*width cells REGARDLESS of key cardinality, which
    * is the point vs the exact census when the key space is unbounded
    * (URLs, n-grams) rather than domain-sized. */
  val cmsDepth = 4
  val cmsWidth = 1024

  /** Cell index of `h` (a 60-bit key hash) in sketch row `r` — affine
    * permutations under the committed [[Dedup.mhA]]/[[Dedup.mhB]]
    * constants, like the Bloom gate's positions: a library CMS's
    * internal hashing would be oracle-opaque. */
  private def cmsCell(r: Int, h: org.apache.spark.sql.Column) =
    (lit(Dedup.mhA(r)) * (h % Dedup.mhP) + lit(Dedup.mhB(r))) % Dedup.mhP % cmsWidth

  private def cmsCellSql(r: Int, h: String) =
    s"((${Dedup.mhA(r)} * ($h % ${Dedup.mhP}) + ${Dedup.mhB(r)}) % ${Dedup.mhP}) % $cmsWidth"

  /**
   * COUNT-MIN SKETCH of a keyed occurrence stream — the mergeable
   * frequency summary (Cormode-Muthukrishnan 2005): each occurrence
   * increments one cell per row; a key's estimate is the MIN over its
   * [[cmsDepth]] cells, which can only OVERCOUNT (collisions add, never
   * subtract) — `est >= true` is a theorem, verified per key in the
   * driver entry below.
   *
   * Scale shape: the build is one map-side-combinable groupBy over
   * (row, cell) — at most depth*width result rows from any input size,
   * and partial aggregation collapses each partition to <= depth*width
   * cells before the shuffle. Sketches MERGE by cell-wise addition
   * (cms(A ∪ B) = cms(A) + cms(B), spec-pinned), so per-shard sketches
   * union without a rebuild — same contract as [[shardedCardinality]].
   *
   * `occurrences` must expose a string `key` column, one row per
   * occurrence. Output: (row, cell, c).
   */
  def cmsBuild(occurrences: DataFrame): DataFrame = {
    val h = TextOps.h60(col("key"))
    occurrences
      .select(explode(array((0 until cmsDepth).map(r =>
        struct(lit(r).as("row"), cmsCell(r, h).as("cell"))): _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-query the sketch for every distinct key in `keys` (string
    * `key` column): min over the key's depth cells. The sketch is
    * depth*width-bounded → broadcast; the probe never shuffles the
    * key frame beyond its own distinct. The join is LEFT (r14 review
    * fix): the sketch frame materializes only INCREMENTED cells, so a
    * key absent from the build stream — the point of querying an
    * unbounded key space — hits empty cells that have no row; the
    * canonical CMS estimator mins over those zeros (usually est=0 for
    * a never-seen key), it does not skip them (an inner join would
    * either drop the key or min only its collided cells). */
  def cmsEstimate(keys: DataFrame, sketch: DataFrame): DataFrame = {
    val h = TextOps.h60(col("key"))
    keys.select(col("key")).distinct()
      .select(col("key"), explode(array((0 until cmsDepth).map(r =>
        struct(lit(r).as("row"), cmsCell(r, h).as("cell"))): _*)).as("rc"))
      .select(col("key"), col("rc.row").as("row"), col("rc.cell").as("cell"))
      .join(broadcast(sketch), Seq("row", "cell"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** Driver entry: CMS over the per-document DOMAIN stream, estimates
    * joined against the exact census — `over_est` (est >= exact) is the
    * theorem column, `is_exact` shows where collisions actually landed
    * at this geometry. */
  def cmsDomainCounts(docs: DataFrame): DataFrame = {
    val keyed = docs.select(Domains.domainOf.as("key"))
    val sketch = cmsBuild(keyed)
    val census = keyed.groupBy(col("key")).agg(count(lit(1)).as("n"))
    cmsEstimate(keyed, sketch)
      .join(census, Seq("key"))
      .select(col("key").as("domain"), col("n"), col("est"),
        (col("est") >= col("n")).as("over_est"),
        (col("est") === col("n")).as("is_exact"))
  }

  /** DuckDB mirror of [[cmsDomainCounts]] — positions zipped via
    * parallel unnest, same affine cell maths. */
  val cmsDomainCountsSql: String = {
    val h = TextOps.h60Sql("key")
    val cells = (0 until cmsDepth).map(r => cmsCellSql(r, "h")).mkString("[", ", ", "]")
    s"""WITH d AS (SELECT ${Domains.domainOfSql} AS key FROM documents),
       |hk AS (SELECT key, $h AS h FROM d),
       |pos AS (
       |  SELECT key, unnest(range(0, $cmsDepth)) AS row, unnest($cells) AS cell
       |  FROM hk
       |),
       |sk AS (SELECT row, cell, count(*) AS c FROM pos GROUP BY 1, 2),
       |est AS (
       |  SELECT p.key, min(coalesce(s.c, 0)) AS est
       |  FROM (SELECT DISTINCT key, row, cell FROM pos) p
       |  LEFT JOIN sk s ON s.row = p.row AND s.cell = p.cell
       |  GROUP BY 1
       |),
       |census AS (SELECT key, count(*) AS n FROM d GROUP BY 1)
       |SELECT c.key AS domain, c.n, e.est,
       |       e.est >= c.n AS over_est, e.est = c.n AS is_exact
       |FROM census c JOIN est e ON e.key = c.key""".stripMargin
  }
}
