package graft.plans

import graft.SparkSpecBase
import graft.sources.Tables

/** Runtime bloom-filter injection — the 100 TB complement to the static
  * semijoin reduction: on a selective dim⋈fact join Spark builds a bloom
  * filter from the filtered creation side and applies it on the probe
  * side's SCAN, cutting shuffle input before the join (Catalyst
  * InjectRuntimeFilter). The default thresholds
  * (creationSideThreshold=10MB, applicationSideScanSizeThreshold=10GB)
  * are sized for production scans and never trigger at spec SF — this
  * spec scales them to the spec data so the 100 TB plan shape is pinned
  * here, not discovered in production. */
class RuntimeFilterSpec extends SparkSpecBase {

  private val confs = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
    "spark.sql.autoBroadcastJoinThreshold")

  private def withConfs(vals: Seq[(String, String)])(f: => Unit): Unit = {
    val saved = confs.map(k => k -> spark.conf.getOption(k))
    try { vals.foreach { case (k, v) => spark.conf.set(k, v) }; f }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def planOf(): String = {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir).where("o_orderpriority = '1-URGENT'")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderpriority").count()
      .queryExecution.optimizedPlan.toString
  }

  test("default thresholds: no injection at spec SF (scan too small to pay for a filter)") {
    withConfs(Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      assert(!planOf().contains("bloom_filter_agg"))
    }
  }

  test("at scale-representative thresholds the probe scan gets a bloom filter") {
    withConfs(Seq(
      // at 100 TB the fact scan is far over 10GB and the filtered dim far
      // under 10MB; scaled to spec SF by zeroing the scan threshold
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val plan = planOf()
      assert(plan.contains("bloom_filter_agg"), plan.take(2000))
      assert(plan.contains("might_contain"), plan.take(2000))
      // the filter must sit on the PROBE (lineitem) side, keyed on the join key
      assert(plan.contains("might_contain") && plan.contains("l_orderkey"), plan.take(2000))
    }
  }
}
