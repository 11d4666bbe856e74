package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextOps.{h60, h60Sql}

/**
 * Deterministic training-epoch shuffle: assign every document a global
 * permutation position for epoch `e` — the "tokenize and shuffle" step
 * every LLM training pipeline runs between corpus prep and sharding.
 * Ordering by a keyed hash of (epoch, doc_id) gives a uniform
 * pseudo-random permutation that is REPRODUCIBLE (re-running epoch 3
 * yields byte-identical order, on any cluster layout, after any
 * restart) yet decorrelated across epochs — the property a seeded
 * in-memory Fisher-Yates cannot provide at corpus scale and a
 * `rand()`-sort cannot provide at all (Spark re-evaluates
 * nondeterministic expressions on task retry, silently duplicating or
 * dropping rows).
 *
 * The global rank is a DISTRIBUTED two-level scan (the [[TextOps
 * .packShards]] discipline applied to ranking): hashing is uniform by
 * construction, so blocking the 60-bit key space into `blocks` equal
 * ranges bounds every level-1 window partition at ~n/blocks rows
 * REGARDLESS of doc_id distribution — there is no such thing as a hot
 * key. Level 2 prefix-sums the per-block counts on a ≤`blocks`-row slim
 * frame (the only global window, constant-bounded) and the exclusive
 * offsets broadcast back. Position = block offset + in-block rank,
 * bit-identical to the sequential rank because block ranges respect key
 * order. Size `blocks` so n/blocks rows fit one task comfortably
 * (default 2^16 puts ~1.5 GB of ids per task at 10^11 docs).
 *
 * `worker = pos mod workers` deals the permutation round-robin onto W
 * data-loader workers: each worker's slice is evenly sized (±1) and
 * itself in permuted order. A writer materializes the epoch with
 * `repartition(worker) + sortWithinPartitions(pos)` — one exchange.
 */
object Shuffle {

  /** 60-bit keyspace width of one block (exact long arithmetic). */
  private def blockWidth(blocks: Int): Long = (1L << 60) / blocks

  def epochShuffle(docs: DataFrame, epoch: Int = 1, workers: Int = 8,
                   blocks: Int = 1 << 16): DataFrame = {
    require(workers >= 1, s"positive worker count required, got $workers")
    // the offsets frame broadcasts: one row per block, so the bound is
    // a broadcast-size contract (2^22 slim rows ≈ 64 MB), not a maths one
    require(blocks >= 1 && blocks <= (1 << 22), s"blocks out of range: $blocks")
    // NULL-safe key: a NULL doc_id must hash to a real key — a NULL
    // block id would silently DROP the row at the offsets join, and a
    // shuffle must be a permutation of its input, never a filter
    val keyed = docs.select(col("doc_id"),
      h60(concat(lit(s"ep$epoch:"),
        coalesce(col("doc_id").cast("string"), lit("")))).as("__key"))
      .withColumn("__blk", expr(s"__key div ${blockWidth(blocks)}L"))
    // level 1: rank within the hash-bounded block
    val w1 = Window.partitionBy(col("__blk")).orderBy(col("__key"), col("doc_id"))
    val local = keyed.withColumn("__rn", row_number().over(w1))
    // level 2: exclusive prefix of per-block counts — the only global
    // window, over a frame bounded by the block COUNT, not the corpus
    val w2 = Window.orderBy(col("__blk")).rowsBetween(Window.unboundedPreceding, -1)
    val offs = keyed.groupBy(col("__blk")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(w2), lit(0L)))
      .select(col("__blk"), col("__off"))
    local.join(broadcast(offs), Seq("__blk"))
      .withColumn("pos", (col("__off") + col("__rn") - lit(1)).cast("long"))
      .select(col("doc_id"), col("pos"),
        pmod(col("pos"), lit(workers.toLong)).as("worker"))
  }

  /** The identical permutation as ANSI SQL (the oracle only has to be
    * correct, so it ranks with one global window). The NULL-doc_id
    * coalesce mirrors the Spark side above: DuckDB's || propagates NULL,
    * which would rank a NULL-id row NULLS-LAST instead of at
    * h60('ep:')'s position (r14 advice). */
  def epochShuffleSql(epoch: Int = 1, workers: Int = 8): String = {
    val key = h60Sql(s"'ep$epoch:' || coalesce(CAST(doc_id AS VARCHAR), '')")
    s"""WITH k AS (SELECT doc_id, $key AS key FROM documents)
       |SELECT doc_id,
       |       CAST(row_number() OVER (ORDER BY key, doc_id) - 1 AS BIGINT) AS pos,
       |       CAST((row_number() OVER (ORDER BY key, doc_id) - 1) % $workers AS BIGINT)
       |         AS worker
       |FROM k""".stripMargin
  }
}
