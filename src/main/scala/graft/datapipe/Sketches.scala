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
 *    Hash-based and order-independent: repeated runs give identical
 *    estimates.
 *  - quantile summaries (`percentile_approx`, Greenwald-Khanna): bounded
 *    per-partition state with a mergeable summary; error is bounded by
 *    the accuracy parameter, not the data size.
 *
 * These cannot be DuckDB-hash-verified (different sketch
 * implementations give different — equally valid — estimates), so the
 * driver records a rows-only check; SketchesSpec pins the accuracy
 * contract against exact answers instead.
 */
object Sketches {

  /** HLL++ relative standard deviation (default Spark rsd is 0.05). */
  val hllRsd = 0.02

  /** Approximate vs exact distinct-token cardinality per language. The
    * exact column rides along here (test scale) to make the estimate's
    * error observable; a production profile would drop it. */
  def tokenCardinality(docs: DataFrame): DataFrame =
    docs.select(col("lang"), explode(TextOps.words(col("text"))).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("lang"))
      .agg(
        approx_count_distinct(col("term"), hllRsd).as("approx_terms"),
        countDistinct(col("term")).as("exact_terms"))

  /** Per-event-type value quantiles (p50/p95/p99) via mergeable
    * Greenwald-Khanna summaries, next to min/max as sanity bounds. */
  def valueQuantiles(events: DataFrame, accuracy: Int = 10000): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        percentile_approx(col("value"),
          array(lit(0.5), lit(0.95), lit(0.99)), lit(accuracy)).as("q"),
        min(col("value")).as("v_min"),
        max(col("value")).as("v_max"))
      .select(col("event_type"),
        col("q").getItem(0).as("p50"),
        col("q").getItem(1).as("p95"),
        col("q").getItem(2).as("p99"),
        col("v_min"), col("v_max"))
}
