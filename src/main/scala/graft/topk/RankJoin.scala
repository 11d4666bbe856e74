package graft.topk

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Ranked (top-k) joins: `ORDER BY f(left) + g(right) LIMIT k` over an
 * equi-join, WITHOUT materializing the full join (reference:
 * sqlplus-core convert/TopK.scala ranked enumeration).
 *
 * Spark-first realization: because the rank function is monotone in each
 * side's contribution, any result among the global top-k must combine a
 * per-join-key top-k row of the left with a per-join-key top-k row of the
 * right. So we semijoin-reduce both sides, keep only k rows per join key
 * per side (window row_number — shuffles once on the join key, the same
 * partitioning the join then reuses), join, and take the global top-k.
 * Intermediates are bounded by k * |distinct keys| instead of the full
 * join size — the property that matters at 100 TB.
 */
object RankJoin {

  /** Keep the top `k` rows per `keys` group ordered by `order`. */
  def prunePerKey(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") <= k).drop("__rn")
  }

  /** Salt fan-out for [[prunePerKeySalted]]'s first-level prune. */
  val pruneSalts = 32

  /**
   * Skew-safe two-level per-key top-k — use instead of [[prunePerKey]]
   * whenever `keys` has LOW cardinality over a corpus-scale frame (e.g.
   * `lang` over 10^11 documents: real corpora are English-dominated, so a
   * single `row_number() OVER (PARTITION BY lang)` scan lands the dominant
   * language's entire row set on ONE reducer task). Level 1 prunes per
   * `(keys, crc32(saltOn) % salts)` — the dominant key's mass partial-prunes
   * across `salts` parallel tasks; level 2 re-prunes per `keys` over the
   * ≤ salts·k survivors, a trivially small frame.
   *
   * Result-identical to the one-window form whenever `order` is a TOTAL
   * order of the rows (deterministic tie-break): every global top-k row of a
   * key group is also top-k within whatever salt bucket it hashes to, so the
   * level-1 survivors are a superset of the answer and level 2 selects
   * exactly the same rows.
   */
  def prunePerKeySalted(df: DataFrame, keys: Seq[String], order: Seq[Column],
                        k: Int, saltOn: Column, salts: Int = pruneSalts): DataFrame = {
    // coalesce before hashing: crc32(NULL) is NULL, so without it every
    // NULL-saltOn row would land in ONE level-1 bucket — still correct
    // (each row is in exactly one bucket) but silently single-reducer
    // for a nullable salt column (r13 advice fix)
    val salted = df.withColumn("__salt",
      pmod(crc32(coalesce(saltOn.cast("string"), lit(""))), lit(salts.toLong)))
    val local = prunePerKey(salted, keys :+ "__salt", order, k).drop("__salt")
    prunePerKey(local, keys, order, k)
  }

  /**
   * Top-k of `left` natural-join `right`, ranked by `leftRank + rightRank`
   * descending, ties broken by `tieCols` ascending (total ordering =>
   * deterministic result set).
   */
  def topK(
      left: DataFrame,
      right: DataFrame,
      leftRank: String,
      rightRank: String,
      k: Int,
      tieCols: Seq[String]): DataFrame = {
    val keys = (left.columns.toSet intersect right.columns.toSet).toSeq.sorted
    require(keys.nonEmpty, "rank join requires shared join columns")
    // dangling rows must go before pruning, else a pruned-in row may not
    // join; persist both sides — each feeds the opposite semijoin and its
    // own prune (tracked: release via CacheRegistry.unpersistAll())
    val lp0 = graft.CacheRegistry.persistTracked(left)
    val rp0 = graft.CacheRegistry.persistTracked(right)
    val lr = lp0.join(rp0.select(keys.map(col): _*), keys, "left_semi")
    val rr = rp0.join(lp0.select(keys.map(col): _*), keys, "left_semi")
    val lp = prunePerKey(lr, keys, col(leftRank).desc +: tieCols.filter(left.columns.contains).map(col(_).asc), k)
    val rp = prunePerKey(rr, keys, col(rightRank).desc +: tieCols.filter(right.columns.contains).map(col(_).asc), k)
    val joined = lp.join(rp, keys, "inner")
      .withColumn("total_rank", col(leftRank) + col(rightRank))
    joined.orderBy(col("total_rank").desc +: tieCols.map(col(_).asc): _*).limit(k)
  }

  /**
   * Top-k over a CHAIN of natural joins ranked by the sum of one rank
   * column per relation (reference convert/TopK.scala L3 shape) — the
   * iterative rank join: after semijoin-reducing the whole chain, fold
   * left-to-right keeping only the top k rows of cumulative rank per
   * NEXT join key at every step. Any global top-k row must be assembled
   * from a per-key top-k prefix (rank is monotone in each summand), so
   * intermediates stay bounded at k * |distinct keys| for every step of
   * the chain — never the full join.
   */
  /** Columns of the accumulated prefix that ANY remaining relation joins
   * on. The per-step prune must partition by ALL of these, not just the
   * adjacent join key: two prefix rows have identical extension sets
   * (same join eligibility AND same future rank summands) iff they agree
   * on every column a future relation touches. Partitioning by a subset
   * (the adjacent key alone) is exact only for true path chains; a later
   * relation joining back to an early column (triangle, star) would make
   * the prune drop true top-k rows. */
  private def futurePruneKeys(accCols: Seq[String], remaining: Seq[DataFrame]): Seq[String] = {
    val future = remaining.flatMap(_.columns).toSet
    accCols.filter(future.contains).sorted
  }

  def topKChain(
      rels: Seq[DataFrame],
      rankCols: Seq[String],
      k: Int,
      tieCols: Seq[String]): DataFrame = {
    require(rels.size >= 2 && rels.size == rankCols.size)
    // full semijoin reduction along the chain (dangling rows would steal
    // prune slots); persist: each side feeds two passes (tracked)
    val reduced = rels.map(graft.CacheRegistry.persistTracked).toBuffer
    for (i <- 0 until reduced.size - 1) {
      val keys = (reduced(i).columns.toSet intersect reduced(i + 1).columns.toSet).toSeq.sorted
      reduced(i + 1) = reduced(i + 1).join(reduced(i).select(keys.map(col): _*), keys, "left_semi")
    }
    for (i <- (reduced.size - 2) to 0 by -1) {
      val keys = (reduced(i).columns.toSet intersect reduced(i + 1).columns.toSet).toSeq.sorted
      reduced(i) = reduced(i).join(reduced(i + 1).select(keys.map(col): _*), keys, "left_semi")
    }

    var acc = reduced.head.withColumn("__cum", col(rankCols.head))
    for (i <- 1 until reduced.size) {
      val next = reduced(i)
      val keys = (acc.columns.toSet intersect next.columns.toSet).toSeq.sorted
      require(keys.nonEmpty, "chain relations must share join columns")
      val pk = futurePruneKeys(acc.columns, reduced.toSeq.drop(i))
      val ties = tieCols.filter(acc.columns.contains).map(col(_).asc)
      acc = prunePerKey(acc, pk, col("__cum").desc +: ties, k)
        .join(next, keys, "inner")
        .withColumn("__cum", col("__cum") + col(rankCols(i)))
    }
    acc.withColumnRenamed("__cum", "total_rank")
      .orderBy(col("total_rank").desc +: tieCols.map(col(_).asc): _*).limit(k)
  }

  /**
   * Tie-agnostic exact variant of [[topKChain]] (the SQL door's form):
   * per-key pruning uses `rank()` over cumulative rank ONLY, keeping
   * every row that ties at the k-th boundary. Any global top-k row must
   * sit in its key's top-k by cumulative rank (extensions add the same
   * future summands to equal cums), so keeping boundary ties makes the
   * prune EXACT for arbitrary final tie-break specs — the caller's
   * `tieOrder` applies once, at the end. Intermediates stay bounded at
   * (k + boundary ties) rows per key.
   */
  def topKChainExact(
      rels: Seq[DataFrame],
      rankCols: Seq[String],
      k: Int,
      tieOrder: Seq[Column]): DataFrame = {
    require(rels.size >= 2 && rels.size == rankCols.size)
    val reduced = rels.map(graft.CacheRegistry.persistTracked).toBuffer
    for (i <- 0 until reduced.size - 1) {
      val keys = (reduced(i).columns.toSet intersect reduced(i + 1).columns.toSet).toSeq.sorted
      reduced(i + 1) = reduced(i + 1).join(reduced(i).select(keys.map(col): _*), keys, "left_semi")
    }
    for (i <- (reduced.size - 2) to 0 by -1) {
      val keys = (reduced(i).columns.toSet intersect reduced(i + 1).columns.toSet).toSeq.sorted
      reduced(i) = reduced(i).join(reduced(i + 1).select(keys.map(col): _*), keys, "left_semi")
    }
    var acc = reduced.head.withColumn("__cum", col(rankCols.head))
    for (i <- 1 until reduced.size) {
      val next = reduced(i)
      val keys = (acc.columns.toSet intersect next.columns.toSet).toSeq.sorted
      require(keys.nonEmpty, "chain relations must share join columns")
      val pk = futurePruneKeys(acc.columns, reduced.toSeq.drop(i))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(pk.map(col): _*).orderBy(col("__cum").desc)
      acc = acc.withColumn("__rnk", rank().over(w)).where(col("__rnk") <= k).drop("__rnk")
        .join(next, keys, "inner")
        .withColumn("__cum", col("__cum") + col(rankCols(i)))
    }
    acc.withColumnRenamed("__cum", "total_rank")
      .orderBy(col("total_rank").desc +: tieOrder: _*).limit(k)
  }

  /**
   * Any-k ranked enumeration, page form (reference convert/TopK.scala's
   * ranked enumeration, re-expressed for a batch engine): return results
   * ranked `offset+1 .. offset+batch` of the chain join, WITHOUT
   * materializing the full join. The iterator-style any-k of the
   * reference becomes pagination here because Spark consumers pull
   * DataFrames, not tuples: each page re-runs the chain with the per-key
   * prune bound at `offset+batch` — intermediates stay bounded at
   * (offset+batch)·|keys| rows, so "give me the next 10" never pays for
   * more than the 10 it returns plus the prefix it must rank under.
   * Total ordering (rank desc, then `tieCols` asc — which must form a
   * key) makes every page deterministic and pages non-overlapping.
   */
  def anyKPage(
      rels: Seq[DataFrame],
      rankCols: Seq[String],
      offset: Int,
      batch: Int,
      tieCols: Seq[String]): DataFrame = {
    require(offset >= 0 && batch > 0)
    val top = topKChain(rels, rankCols, offset + batch, tieCols)
    // the window input is at most offset+batch rows (post-limit), so the
    // single-partition global sort is bounded, not a scale hazard
    val w = Window.orderBy(col("total_rank").desc +: tieCols.map(col(_).asc): _*)
    top.withColumn("__rn", row_number().over(w))
      .where(col("__rn") > offset).drop("__rn")
  }
}
