package graft.wcoj

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Leapfrog Trie Join over hypercube-partitioned binary relations — the
 * worst-case-optimal join path for cyclic graph patterns (reference:
 * sqlplus-lib wcoj/LeapfrogTrieJoinIterator.scala with the HyperCube
 * shuffle in helper/ImplicitConversions.scala:338-397).
 *
 * Spark-first realization of the custom-operator escape hatch: the one
 * place the brief's preference order reaches (d) `mapPartitions`, because
 * a multiway intersection genuinely cannot be expressed as binary joins
 * without losing the AGM bound. Each edge tuple is replicated to the
 * hypercube cells consistent with its two bound coordinates
 * (`side^(n-2)` cells for n variables); each cell runs classic LFTJ over
 * sorted in-memory tries. Cell size is |E| * side^(n-2) / side^n =
 * |E|/side² expected — sized to fit an executor, independent of skew in
 * the join RESULT. Every output binding determines all n coordinates, so
 * it is produced by exactly one cell: no cross-cell dedup needed.
 */
/** One hypercube-replicated tuple: cell id, pattern index, values in trie
  * order (public: Catalyst codegen instantiates it). */
case class CubeRow(pid: Int, rel: Int, k1: Long, k2: Long)

object Lftj {

  /** Deterministic coordinate hash (no modulo-alignment artifacts). */
  private def coord(k: Long, side: Int): Int =
    Math.floorMod((k * 0x9E3779B97F4A7C15L) >>> 17, side.toLong).toInt

  /**
   * Shared input validation for both WCOJ doors ([[enumerate]] and
   * [[graft.plans.LftjExec.enumerate]]). Rejects up front the two shapes
   * that would otherwise SILENTLY lose bindings:
   *  - a self-loop pattern (u, u): only one hypercube coordinate is bound
   *    while replication still enumerates side^(n-2) free cells, so one
   *    dimension is never varied and tuples miss cells (the L self-loop
   *    shape is handled separately in [[Wcoj]]);
   *  - a varOrder variable covered by no pattern: recurse() would hit an
   *    empty participant set and return 0 rows, masking a caller mistake.
   */
  private[graft] def validate(
      patterns: Seq[(String, String)], varOrder: Seq[String]): Unit = {
    val vars = varOrder.toSet
    require(varOrder.length >= 2, "need at least two variables")
    patterns.foreach { case (u, v) =>
      require(vars.contains(u) && vars.contains(v),
        s"pattern ($u,$v) uses a variable outside varOrder $varOrder")
      require(u != v,
        s"self-loop pattern ($u,$u) unsupported here: pre-filter edges on " +
          "src = dst instead (see Wcoj's L-shape handling)")
    }
    varOrder.foreach { v =>
      require(patterns.exists(p => p._1 == v || p._2 == v),
        s"variable $v is bound by no pattern — the join would be empty/cartesian")
    }
  }

  /**
   * Enumerate all bindings of `varOrder` such that every `patterns(r)`
   * (u, v) — meaning an edge u->v — exists in `edges(src, dst)`.
   * Returns one column per variable, in `varOrder`.
   */
  def enumerate(
      edges: DataFrame,
      patterns: Seq[(String, String)],
      varOrder: Seq[String],
      cubeSide: Int = 4): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    validate(patterns, varOrder)
    val n = varOrder.length
    val varIdx = varOrder.zipWithIndex.toMap
    val side = cubeSide

    // (pattern index, earlier-var position, later-var position, swapped?,
    //  number of free cells each tuple replicates to)
    val pats = patterns.zipWithIndex.map { case ((u, v), r) =>
      val (iu, iv) = (varIdx(u), varIdx(v))
      val (i, j, swapped) = if (iu < iv) (iu, iv, false) else (iv, iu, true)
      (r, i, j, swapped, math.pow(side, n - 2).toInt)
    }

    val Array(c1, c2) = edges.columns
    val e = edges.select(col(c1).cast("long"), col(c2).cast("long")).as[(Long, Long)]

    // hypercube replication: fix the two bound coordinates, enumerate the rest
    val rows = e.mapPartitions { it =>
      it.flatMap { case (x, y) =>
        pats.iterator.flatMap { case (r, i, j, swapped, nCells) =>
          val (k1, k2) = if (swapped) (y, x) else (x, y)
          val ci = coord(k1, side)
          val cj = coord(k2, side)
          (0 until nCells).iterator.map { code =>
            var pid = 0
            var rem = code
            var d = 0
            var mul = 1
            while (d < n) {
              val c =
                if (d == i) ci
                else if (d == j) cj
                else { val cc = rem % side; rem /= side; cc }
              pid += c * mul
              mul *= side
              d += 1
            }
            CubeRow(pid, r, k1, k2)
          }
        }
      }
    }

    val nRels = patterns.length
    val bindings = rows
      .groupByKey(_.pid)
      .flatMapGroups { (_, it) =>
        // build sorted tries per pattern
        val bufs = Array.fill(nRels)(new ArrayBuffer[(Long, Long)]())
        it.foreach(r => bufs(r.rel) += ((r.k1, r.k2)))
        val tries = bufs.map(_.sortInPlace().toArray)
        if (tries.exists(_.isEmpty)) Iterator.empty
        else lftj(tries, pats.map { case (_, i, j, _, _) => (i, j) }.toArray, n)
      }

    bindings.toDF("b").select(
      varOrder.zipWithIndex.map { case (v, i) => col("b").getItem(i).as(v) }: _*)
  }

  /** Count-only variant (partial counts per cell, one global sum). */
  def count(
      edges: DataFrame,
      patterns: Seq[(String, String)],
      varOrder: Seq[String],
      cubeSide: Int = 4): DataFrame =
    enumerate(edges, patterns, varOrder, cubeSide)
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))

  /**
   * Classic in-memory LFTJ: for each variable level in order, leapfrog-
   * intersect the sorted candidate ranges of every pattern involving that
   * variable, narrowing ranges as bindings accumulate. Shared by the
   * mapPartitions path above and the [[graft.plans.LftjExec]] physical
   * operator.
   */
  private[graft] def lftj(
      tries: Array[Array[(Long, Long)]],
      pats: Array[(Int, Int)], // (earlier var, later var) per pattern
      n: Int): Iterator[Array[Long]] = {
    val out = new ArrayBuffer[Array[Long]]()
    val bind = new Array[Long](n)
    // current [lo, hi) range per pattern
    val lo = tries.map(_ => 0)
    val hi = tries.indices.map(r => tries(r).length).toArray

    // first index in [from, until) of t with t(i)._1 >= key (k1 search)
    def lower1(t: Array[(Long, Long)], from: Int, until: Int, key: Long): Int = {
      var a = from; var b = until
      while (a < b) { val m = (a + b) >>> 1; if (t(m)._1 < key) a = m + 1 else b = m }
      a
    }
    def lower2(t: Array[(Long, Long)], from: Int, until: Int, key: Long): Int = {
      var a = from; var b = until
      while (a < b) { val m = (a + b) >>> 1; if (t(m)._2 < key) a = m + 1 else b = m }
      a
    }

    def recurse(level: Int): Unit = {
      if (level == n) { out += bind.clone(); return }
      // patterns whose earlier var is `level`: candidates are k1 over range
      // patterns whose later var is `level`: k1 fixed earlier, candidates k2
      val first = tries.indices.filter(r => pats(r)._1 == level)
      val second = tries.indices.filter(r => pats(r)._2 == level)
      val parts = first.map(r => (r, true)) ++ second.map(r => (r, false))
      if (parts.isEmpty) return // pattern set must bind every variable

      // leapfrog intersection over the participating sorted sequences
      def valueAt(r: Int, isK1: Boolean, pos: Int): Long =
        if (isK1) tries(r)(pos)._1 else tries(r)(pos)._2
      val pos = parts.map { case (r, _) => lo(r) }.toArray

      var exhausted = false
      while (!exhausted) {
        // compute the max head; advance everyone to >= it until all equal
        var target = Long.MinValue
        var idx = 0
        while (idx < parts.length && !exhausted) {
          val (r, isK1) = parts(idx)
          if (pos(idx) >= hi(r)) exhausted = true
          else {
            val v = valueAt(r, isK1, pos(idx))
            if (v > target) target = v
          }
          idx += 1
        }
        if (!exhausted) {
          var allEqual = true
          idx = 0
          while (idx < parts.length && !exhausted) {
            val (r, isK1) = parts(idx)
            val v = valueAt(r, isK1, pos(idx))
            if (v < target) {
              allEqual = false
              pos(idx) =
                if (isK1) lower1(tries(r), pos(idx), hi(r), target)
                else lower2(tries(r), pos(idx), hi(r), target)
              if (pos(idx) >= hi(r)) exhausted = true
            }
            idx += 1
          }
          if (!exhausted && allEqual) {
            bind(level) = target
            // narrow ranges of `first` patterns to k1 == target, recurse
            val saved = parts.map { case (r, _) => (r, lo(r), hi(r)) }
            parts.zipWithIndex.foreach { case ((r, isK1), pi) =>
              if (isK1) {
                lo(r) = pos(pi)
                hi(r) = lower1(tries(r), pos(pi), saved.find(_._1 == r).get._3, target + 1)
              }
            }
            recurse(level + 1)
            saved.foreach { case (r, l, h) => lo(r) = l; hi(r) = h }
            // advance every participant past `target`
            idx = 0
            while (idx < parts.length && !exhausted) {
              val (r, isK1) = parts(idx)
              pos(idx) =
                if (isK1) lower1(tries(r), pos(idx), hi(r), target + 1)
                else lower2(tries(r), pos(idx), hi(r), target + 1)
              if (pos(idx) >= hi(r)) exhausted = true
              idx += 1
            }
          }
        }
      }
    }

    recurse(0)
    out.iterator
  }
}
