import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Profiling aid (test tree only): warm a SparkEntry query twice, then
  * time a third run counting Spark jobs/stages/tasks — the signal that
  * separates "work" from "scheduling breadth" on local[32] (BASELINE.md
  * r8 direct-route analysis was produced with this).
  *
  *   sbt "Test/runMain Prof sql_ref_q5 [sfDir]"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.collectFirst { case a if a.startsWith("thr=") => a.stripPrefix("thr=") }
      .foreach(v => spark.conf.set("spark.graft.direct.threshold", v))
    val rest = args.filterNot(_.startsWith("thr="))
    val name = rest.headOption.getOrElse("sql_ref_q5")
    val d = rest.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries(name)
    graft.CacheRegistry.unpersistAll(); fn(spark, d).count()
    graft.CacheRegistry.unpersistAll(); fn(spark, d).count()
    @volatile var jobs = 0; @volatile var stages = 0; @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks }
    })
    graft.CacheRegistry.unpersistAll()
    val t0 = System.nanoTime()
    val n = fn(spark, d).count()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"PROF $name rows=$n time=$dt%.2f jobs=$jobs stages=$stages tasks=$tasks")
    spark.stop()
  }
}
