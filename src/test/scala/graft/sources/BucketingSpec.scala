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

  test("CQC semijoin reduction composes with bucketing: no shuffle in the reducer") {
    import spark.implicits._
    val a = (1 to 1000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "va")
    val b = (1 to 800).map(i => (i.toLong % 97, i.toLong * 2)).toDF("k", "vb")
    Tables.writeBucketed(a, "buck_ca", "k", 8)
    Tables.writeBucketed(b, "buck_cb", "k", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // a full Yannakakis pass (semijoins both directions + the
      // enumeration join) over co-located leaves: every join keys on
      // the bucket column, so the whole pipeline is exchange-free —
      // at 100 TB this is the difference between 3 shuffles of the
      // fact table and zero
      val result = graft.cqc.Yannakakis.solve(Seq(
        graft.cqc.Rel("ra", spark.table("buck_ca")),
        graft.cqc.Rel("rb", spark.table("buck_cb"))))
      val want = a.join(b, "k").count()
      assert(result.count() == want && want > 0) // materialize: AQE finalizes
      val plan = result.queryExecution.executedPlan.toString()
      // the enumeration join sits ABOVE the cached reduced relations —
      // assert it consumes them without a shuffle (the string below the
      // first InMemoryRelation includes AQE "Initial Plan" sections with
      // planned-but-eliminated exchanges, so cut there)
      val top = plan.linesIterator.takeWhile(!_.contains("InMemoryRelation")).mkString("\n")
      assert(!top.contains("Exchange hashpartitioning"),
        s"expected an exchange-free enumeration join:\n$top")
      // and the semijoin stages underneath really read co-located buckets
      assert(plan.contains("SelectedBucketsCount: 8 out of 8"), plan.take(2000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      graft.CacheRegistry.unpersistAll()
      spark.sql("DROP TABLE IF EXISTS buck_ca")
      spark.sql("DROP TABLE IF EXISTS buck_cb")
    }
  }

  test("predicate pushdown survives the SQL door to the parquet scan") {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("buck_li")
    Tables.orders(spark, sfDir).createOrReplaceTempView("buck_ord")
    val df = graft.sql.CqcSql.solve(spark,
      """SELECT l.l_orderkey AS k, o.o_orderdate AS d
        |FROM buck_li l, buck_ord o
        |WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity < 10""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [") && plan.contains("LessThan(l_quantity"),
      plan.take(3000))
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
