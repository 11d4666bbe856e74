package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for the iterative operators (graph builds, beam
  * walks, CC propagation, BPE rounds), with the reliability trade
  * stated ONCE (r18 — VERDICT item 7).
  *
  * `localCheckpoint` stores the truncated lineage in EXECUTOR-LOCAL
  * storage: no distributed-filesystem round-trip, but the checkpoint
  * dies with its executor — on a real cluster an executor loss makes
  * every frame checkpointed there unrecoverable mid-query, and the
  * whole walk/build restarts. In this repo's local[(N)] bench the
  * executor IS the driver process, so the trade costs nothing and
  * stays the default.
  *
  * Set `spark.graft.checkpoint.dir=<fs path>` (a dynamic SQLConf; any
  * HDFS/S3/posix path visible to every executor) to switch EVERY
  * iterative operator to reliable checkpoints: each truncation then
  * writes to and re-reads from that directory, surviving executor
  * loss — the right choice for multi-hour 100 TB jobs where re-running
  * a build dwarfs the checkpoint I/O. Default unchanged locally.
  */
object Checkpoints {
  val dirKey = "spark.graft.checkpoint.dir"

  /** Truncate `df`'s lineage: reliable checkpoint when [[dirKey]] is
    * set, executor-local otherwise. `eager` as in Dataset.checkpoint. */
  def truncate(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(dirKey).filter(_.nonEmpty) match {
      case Some(d) =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }
}
