package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Explicit skew-salting for joins whose hot keys AQE cannot fix — e.g.
 * when the skewed side must join a non-broadcastable build side, or when
 * a deterministic layout is required (bucketed outputs).
 *
 * `saltedJoin(left, right, keys, salt)` splits every left row into its
 * original row tagged with a random-free, DETERMINISTIC salt derived
 * from the row's other columns, and replicates each right row `salt`
 * times — so one hot key spreads over `salt` reducers instead of one.
 * Results are exactly the plain join's (the salt columns are internal).
 *
 * At 100 TB: AQE's skew-join split handles most cases (enabled in
 * Tables.tune); this utility covers the rest — notably repeated
 * pipelines where you want stable task sizes rather than runtime
 * re-planning.
 */
object Skew {

  /**
   * Inner equi-join on `keys` with the LEFT side's hot keys spread over
   * `salt` partitions per key. Right rows are replicated `salt` times
   * (keep the smaller relation on the right).
   */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String], salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // deterministic spread: hash of ALL left columns (not just keys, which
    // would put every copy of a hot key in one bucket again)
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(salt)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
