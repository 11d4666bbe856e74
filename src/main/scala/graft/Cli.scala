package graft

import org.apache.spark.sql.SparkSession

/**
 * Minimal CLI front end (the reference ships sqlplus-cli: a script file
 * of CREATE TABLE DDL + a query, executed end-to-end). Usage:
 *
 *   runMain graft.Cli <script.sql> [maxRows] [--dry-run]
 *
 * The script is semicolon-separated; every statement but the last runs
 * as stock Spark SQL (DDL: CREATE TABLE ... USING parquet LOCATION,
 * temp views, ...), the final SELECT goes through the CQC door
 * ([[graft.sql.CqcSql.script]]). Results print to stdout. With
 * `--dry-run` the final query is PLANNED, not run: the chosen join
 * tree, bound carriers, and routed fast path print instead (the
 * reference CLI's dry-run/compile artifact at the semantic level).
 */
object Cli {
  def main(args: Array[String]): Unit = {
    val dryRun = args.contains("--dry-run")
    val rest = args.filterNot(_ == "--dry-run")
    require(rest.nonEmpty, "usage: graft.Cli <script.sql> [maxRows] [--dry-run]")
    val text = {
      val src = scala.io.Source.fromFile(rest(0))
      try src.mkString finally src.close()
    }
    // reuse an existing session (tests, notebooks) and leave it running;
    // stop only a session this main created itself
    val preExisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (dryRun) println(graft.sql.CqcSql.explainScript(spark, text))
    else graft.sql.CqcSql.script(spark, text)
      .show(rest.lift(1).map(_.toInt).getOrElse(20), truncate = false)
    if (!preExisting) spark.stop()
  }
}
