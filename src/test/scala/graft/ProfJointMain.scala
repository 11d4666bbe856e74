import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Measurement harness for the r8-verdict "joint-groupBy degree
  * subqueries" lever (test tree only): run the sql_ref_q5 body on the
  * REDUCED route (threshold=0) in its shipped form (four separate
  * degree subqueries; src-count and dst-count cache-dedup to two
  * aggregate builds) and in a hand-written JOINT form (one union-explode
  * aggregate computing cnt_src and cnt_dst per key; all four leaves
  * filter/project the same derived relation, so the CacheManager dedups
  * them to ONE build). Counts warm jobs/stages — the quantity BASELINE.md
  * r8 identified as the reduced-route floor.
  *
  *   sbt "Test/runMain ProfJoint [sfDir]"
  */
object ProfJoint {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.direct.threshold", "0") // reduced route
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    val preds =
      """WHERE g1.dst = g2.src AND g2.dst = g3.src AND g1.src = c1.src
        |    AND g3.dst = c2.src AND c1.cnt < c2.cnt
        |    AND g4.dst = g2.src AND g2.dst = g5.src AND g4.src = c3.dst
        |    AND g5.dst = c4.dst AND c3.cnt < c4.cnt""".stripMargin
    val shipped =
      s"""SELECT g2.src, g2.dst
         |FROM Graph AS g1, Graph AS g2, Graph AS g3, Graph AS g4, Graph AS g5,
         |    (SELECT src, COUNT(*) AS cnt FROM Graph GROUP BY src) AS c1,
         |    (SELECT src, COUNT(*) AS cnt FROM Graph GROUP BY src) AS c2,
         |    (SELECT dst, COUNT(*) AS cnt FROM Graph GROUP BY dst) AS c3,
         |    (SELECT dst, COUNT(*) AS cnt FROM Graph GROUP BY dst) AS c4
         |$preds""".stripMargin
    val jointDeg =
      """(SELECT key, COUNT(CASE WHEN side = 0 THEN 1 END) AS cnt_src,
        |        COUNT(CASE WHEN side = 1 THEN 1 END) AS cnt_dst
        | FROM (SELECT src AS key, 0 AS side FROM Graph
        |       UNION ALL SELECT dst AS key, 1 AS side FROM Graph)
        | GROUP BY key)""".stripMargin
    val joint =
      s"""SELECT g2.src, g2.dst
         |FROM Graph AS g1, Graph AS g2, Graph AS g3, Graph AS g4, Graph AS g5,
         |    (SELECT key AS src, cnt_src AS cnt FROM $jointDeg j1 WHERE cnt_src > 0) AS c1,
         |    (SELECT key AS src, cnt_src AS cnt FROM $jointDeg j2 WHERE cnt_src > 0) AS c2,
         |    (SELECT key AS dst, cnt_dst AS cnt FROM $jointDeg j3 WHERE cnt_dst > 0) AS c3,
         |    (SELECT key AS dst, cnt_dst AS cnt FROM $jointDeg j4 WHERE cnt_dst > 0) AS c4
         |$preds""".stripMargin

    // Graph view: the same fixed-size example graph sql_ref_q5 uses
    graft.sources.Tables.edgesRef(spark, d).persist().createOrReplaceTempView("Graph")
    spark.table("Graph").count()

    def measure(label: String, sql: String): Long = {
      def run(): Long = {
        graft.CacheRegistry.unpersistAll()
        graft.sql.CqcSql.solve(spark, sql).count()
      }
      run(); run() // warm codegen + caches twice, like Prof
      @volatile var jobs = 0; @volatile var stages = 0
      val l = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      val n = run()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(l)
      println(f"PROFJOINT $label rows=$n time=$dt%.2f jobs=$jobs stages=$stages")
      n
    }
    val a = measure("shipped", shipped)
    val b = measure("joint", joint)
    println(s"PROFJOINT rows_equal=${a == b}")
    spark.stop()
  }
}
