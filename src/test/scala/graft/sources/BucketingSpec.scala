package graft.sources

import graft.SparkSpecBase

/** Co-located joins via bucketing: both sides bucketed by the join key
  * into the same bucket count must join WITHOUT a shuffle exchange —
  * the cluster-scale strategy for the pipeline's biggest repeated join
  * (a partitioned write prunes, a bucketed write co-locates). */
class BucketingSpec extends SparkSpecBase {

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    import spark.implicits._
    val a = (1 to 1000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "va")
    val b = (1 to 800).map(i => (i.toLong % 97, i.toLong * 2)).toDF("k", "vb")
    Tables.writeBucketed(a, "buck_a", "k", 8)
    Tables.writeBucketed(b, "buck_b", "k", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a non-broadcast join: the co-location claim is about the
    // shuffle a sort-merge/shuffled-hash join would otherwise need
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("buck_a").join(spark.table("buck_b"), "k")
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected an exchange-free co-located join:\n$plan")
      val want = a.join(b, "k").count()
      assert(j.count() == want && want > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS buck_a")
      spark.sql("DROP TABLE IF EXISTS buck_b")
    }
  }

  test("mismatched bucket counts still join correctly (exchange re-appears)") {
    import spark.implicits._
    val a = (1 to 300).map(i => (i.toLong % 31, i.toLong)).toDF("k", "va")
    val b = (1 to 200).map(i => (i.toLong % 31, i.toLong * 3)).toDF("k", "vb")
    Tables.writeBucketed(a, "buck_c", "k", 8)
    Tables.writeBucketed(b, "buck_d", "k", 4)
    try {
      val j = spark.table("buck_c").join(spark.table("buck_d"), "k")
      assert(j.count() == a.join(b, "k").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS buck_c")
      spark.sql("DROP TABLE IF EXISTS buck_d")
    }
  }
}
