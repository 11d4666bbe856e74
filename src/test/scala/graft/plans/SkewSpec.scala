package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    // one pathologically hot key (90% of rows) plus a long tail
    val left = ((1 to 900).map(i => (7L, s"row$i")) ++
      (1 to 100).map(i => (i.toLong + 100, s"tail$i"))).toDF("k", "payload")
    val right = Seq((7L, "hot"), (101L, "t1"), (150L, "t2")).toDF("k", "tag")
    val got = Skew.saltedJoin(left, right, Seq("k"), salt = 8)
      .collect().map(_.toSeq).toSet
    val want = left.join(right, "k").collect().map(_.toSeq).toSet
    assert(got == want && want.nonEmpty)
  }

  test("salt spreads a hot key across multiple partitions") {
    val left = (1 to 1000).map(i => (7L, i)).toDF("k", "v")
    val spread = left.withColumn("__salt", pmod(hash(col("k"), col("v")), lit(8)))
      .select("__salt").distinct().count()
    assert(spread > 1)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // the runtime complement to the static salted join: one hot key makes
    // one shuffle partition dominate; AQE's OptimizeSkewedJoin must split
    // it into advisory-sized sub-partitions — the 100 TB lever for skew
    // discovered only at run time
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = ((1 to 60000).map(i => (7L, s"payload_${i}_$i")) ++
        (1 to 1000).map(i => (i.toLong + 100, "tail"))).toDF("k", "p")
      val right = ((7L, "hot") +: (1 to 1000).map(i => (i.toLong + 100, "x"))).toDF("k", "tag")
      val j = left.join(right, "k")
      // collect() executes THIS queryExecution (count() would plan a new
      // one), so AQE finalizes the plan we then inspect
      assert(j.collect().length == 61000)
      val plan = j.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"expected a runtime-split skewed join:\n${plan.take(3000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
