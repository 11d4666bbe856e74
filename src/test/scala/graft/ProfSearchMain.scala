package graft

import org.apache.spark.sql.SparkSession

/** Phase-split profiling for the graph-ANN tier (test tree only):
  * times graph build / beam walk / exact companion separately so a
  * regression in one phase can't hide behind the others.
  *
  *   sbt "Test/runMain graft.ProfSearch [sfDir]"
  */
object ProfSearch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = graft.sources.Tables.embeddings(spark, d)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // per-job timing: which jobs inside a phase actually carry the time
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = scala.collection.concurrent.TrieMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts(j.jobId) = System.nanoTime()
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { t0 =>
          val dt = (System.nanoTime() - t0) / 1e9
          if (dt > 0.5) println(f"  JOB ${j.jobId} took $dt%.2f s")
        }
    })
    // warm session
    emb.count()
    CacheRegistry.unpersistAll()
    t("knnGraph")(graft.datapipe.Ann.knnGraph(emb).count()) // auto-sized planes, the shipped path (r16)
    CacheRegistry.unpersistAll()
    // (the step-level inline replica that found the r15 plan-analysis
    // stall was removed once fixed — it would silently diverge from the
    // real implementation; the phase splits + the >0.5s job listener
    // above are the durable diagnostic)
    CacheRegistry.unpersistAll()
    t("graphSearch")(graft.datapipe.Ann.graphSearch(emb).count())
    CacheRegistry.unpersistAll()
    t("graphSearchChecked")(graft.datapipe.Ann.graphSearchChecked(emb).count())
    spark.stop()
  }
}
