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
}
