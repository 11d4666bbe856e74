package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Fixed-point PageRank (Page et al. 1999) over an edge relation —
 * iterative graph analytics as a single declarative plan: each of the
 * `iters` rounds is one shuffle on the destination key (map-side
 * combinable integer sum) plus a broadcast-sized out-degree join, the
 * Pregel dataflow written as DataFrame ops so Catalyst/AQE own
 * partitioning and skew handling. Lineage grows linearly in `iters`;
 * past ~10 rounds callers should localCheckpoint between rounds (the
 * [[graft.datapipe.Dedup]] connected-components precedent) — the
 * entry's fixed 3 rounds don't need it.
 *
 * Arithmetic is SCALED INTEGER fixed-point, not floating:
 * `score ∈ [0, 10^12]`, damping 0.85 applied as `(15·base + 85·mass)
 * div 100` — every operation is a BIGINT floor-div/sum, so the result
 * is bit-identical across engines BY CONSTRUCTION (a double PageRank's
 * per-node sums would depend on aggregation order, the nondeterminism
 * class the oracle framework bans). Dangling-node mass is dropped (the
 * standard simplification); scores therefore sum to slightly under
 * 10^12 and under-counting is uniform, so ranking is unaffected.
 */
object PageRank {

  // 10^12: a node's incoming mass is bounded by the TOTAL mass, which
  // the fixed point keeps ≤ scale (it only ever loses dangling/rounding
  // mass), so the largest intermediate is 85 · scale ≈ 8.5e13 ≪ 2^63 —
  // the bound is per-node mass, NOT 85·n·scale (that would overflow
  // beyond ~10^5 nodes and is not what the arithmetic computes)
  val scale = 1000000000000L

  def pagerank(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters out of range: $iters")
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // 1-row cardinality frame, combined by broadcast cross join — keeps
    // the plan lazy instead of a driver-side count()
    val nn = nodes.agg(count(lit(1)).as("__n"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__od"))
    val s0 = nodes.crossJoin(broadcast(nn))
      .select(col("node"), expr(s"${scale}L div __n").as("score"))
    (1 to iters).foldLeft(s0) { (scores, _) =>
      val mass = scores.join(e, col("node") === col("src"))
        .join(outdeg, "src")
        .select(col("dst"), expr("score div __od").as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__m"))
      nodes.join(mass, col("node") === col("dst"), "left")
        .crossJoin(broadcast(nn))
        .select(col("node"),
          expr(s"(15L * (${scale}L div __n) + 85L * coalesce(__m, 0L)) div 100L")
            .as("score"))
    }
  }

  /** The identical fixed-point iteration as chained ANSI-SQL CTEs,
    * generated from the same parameters so the two sides cannot drift. */
  def pagerankSql(edgesSql: String, iters: Int = 3): String = {
    val steps = (1 to iters).map { i =>
      s"""m$i AS (
         |  SELECT e.dst, sum(s.score // od.__od) AS m
         |  FROM s${i - 1} s JOIN e ON s.node = e.src JOIN od ON e.src = od.src
         |  GROUP BY e.dst
         |), s$i AS (
         |  SELECT n.node,
         |         (15 * ($scale // nn.n) + 85 * COALESCE(m$i.m, 0)) // 100 AS score
         |  FROM nodes n CROSS JOIN nn LEFT JOIN m$i ON n.node = m$i.dst
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS ($edgesSql),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |od AS (SELECT src, count(*) AS __od FROM e GROUP BY src),
       |s0 AS (SELECT node, $scale // nn.n AS score FROM nodes CROSS JOIN nn),
       |$steps
       |SELECT node, CAST(score AS BIGINT) AS score FROM s$iters""".stripMargin
  }
}
