package graft.topk

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RankJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("topK equals full-join-then-global-sort oracle") {
    val e = Seq(
      ("a", "b", 5.0), ("a", "c", 3.0), ("b", "c", 4.0), ("b", "d", 9.0),
      ("c", "d", 1.0), ("c", "a", 7.0), ("d", "a", 2.0), ("d", "b", 6.0))
    val left = e.toDF("node1", "node2", "rating1")
    val right = e.toDF("node2", "node3", "rating2")
    val k = 3
    val got = RankJoin.topK(left, right, "rating1", "rating2", k,
        Seq("node1", "node2", "node3"))
      .select("node1", "node2", "node3", "total_rank")
      .collect().map(_.toSeq)
    val want = left.join(right, "node2")
      .withColumn("total_rank", col("rating1") + col("rating2"))
      .orderBy(col("total_rank").desc, col("node1"), col("node2"), col("node3"))
      .limit(k)
      .select("node1", "node2", "node3", "total_rank")
      .collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq && want.nonEmpty)
  }
}
