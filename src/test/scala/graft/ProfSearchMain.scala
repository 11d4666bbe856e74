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
    t("knnGraph")(graft.datapipe.Ann.knnGraph(emb, planes = graft.datapipe.Ann.knnPlanes).count())
    CacheRegistry.unpersistAll()
    // inline replica of graphSearch with per-phase timers
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      import graft.datapipe.Ann
      import org.apache.spark.sql.DataFrame
      val g = Ann.knnGraph(emb, planes = Ann.knnPlanes)
      val und = CacheRegistry.persistTracked(
        g.select(col("vec_id").as("src"), col("nbr_id").as("dst"))
          .unionByName(g.select(col("nbr_id").as("src"), col("vec_id").as("dst")))
          .distinct())
      t("und.count")(und.count())
      val ep = CacheRegistry.persistTracked(
        emb.select(col("vec_id"), col("embedding")))
      val e = ep.select(col("vec_id").as("cand"), col("embedding").as("__ce"))
      val q = ep.where(col("vec_id") % Ann.queryMod === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val entry = ep.agg(min(col("vec_id")).as("cand"))
      def scoreRank(c: DataFrame): DataFrame = {
        val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand").asc)
        c.join(q, Seq("q_id"))
          .join(e, Seq("cand"))
          .select(col("q_id"), col("cand"), Ann.cosine(col("q_emb"), col("__ce")).as("cos"))
          .withColumn("rnk", row_number().over(w))
      }
      val bandSeeds = (0 until Ann.knnBands).map { band =>
        val bk = Ann.buckets(ep, Ann.knnPlanes, planeBase = band * Ann.knnPlanes)
        bk.where(col("vec_id") % Ann.queryMod === 0)
          .select(col("vec_id").as("q_id"), col("bucket"))
          .join(bk.select(col("vec_id").as("cand"), col("bucket")), Seq("bucket"))
          .select(col("q_id"), col("cand"))
      }.reduce(_ unionByName _)
      val cands0 = CacheRegistry.persistTracked(
        bandSeeds.unionByName(q.select(col("q_id")).crossJoin(entry)).distinct())
      var beam = t("beam0")(
        scoreRank(cands0).where(col("rnk") <= Ann.searchBeam)
          .select(col("q_id"), col("cand")).localCheckpoint(true))
      var visited = cands0.select(col("q_id"), col("cand"))
      for (i <- 1 to Ann.searchSteps) {
        val expand = beam.join(und, beam("cand") === und("src"))
          .select(beam("q_id"), col("dst").as("cand"))
        val cands = beam.unionByName(expand).distinct()
        visited = visited.unionByName(cands)
        beam = t(s"step$i")(
          scoreRank(cands).where(col("rnk") <= Ann.searchBeam)
            .select(col("q_id"), col("cand")).localCheckpoint(true))
      }
      t("final")(
        scoreRank(visited.distinct().where(col("cand") =!= col("q_id")))
          .where(col("rnk") <= Ann.topK).count())
    }
    CacheRegistry.unpersistAll()
    t("graphSearchChecked")(graft.datapipe.Ann.graphSearchChecked(emb).count())
    spark.stop()
  }
}
