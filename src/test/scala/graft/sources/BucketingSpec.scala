package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpecBase {

  private def cleanLocation(table: String): Unit = {
    // in-memory catalog forgets tables across JVMs but the files remain
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val dir = new java.io.File(s"/tmp/graft_spec_warehouse/$table")
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(dir)
    }
  }

  test("same-bucketed tables join with zero shuffle exchanges") {
    cleanLocation("bk_edges_a")
    cleanLocation("bk_deg")
    val e = Tables.edges(spark, sfDir)
    Tables.writeBucketed(e, "bk_edges_a", 4, Seq("src"))
    Tables.writeBucketed(e.groupBy("src").agg(count(lit(1)).as("deg")),
      "bk_deg", 4, Seq("src"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bk_edges_a").join(spark.table("bk_deg"), "src")
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"), s"expected co-located join, got:\n$plan")
      assert(j.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed groupBy on the bucket key avoids a shuffle") {
    val agg = spark.table("bk_edges_a").groupBy("src").agg(count(lit(1)))
    val plan = agg.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"expected shuffle-free agg, got:\n$plan")
  }
}
