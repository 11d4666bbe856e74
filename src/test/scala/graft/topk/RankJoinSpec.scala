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

  test("anyKPage pages are disjoint, ordered, and tile the full ranking") {
    val e = Seq(
      ("a", "b", 5.0), ("a", "c", 3.0), ("b", "c", 4.0), ("b", "d", 9.0),
      ("c", "d", 1.0), ("c", "a", 7.0), ("d", "a", 2.0), ("d", "b", 6.0))
    val r1 = e.toDF("n1", "n2", "w1")
    val r2 = e.toDF("n2", "n3", "w2")
    val rels = Seq(r1, r2)
    val ties = Seq("n1", "n2", "n3")
    val full = r1.join(r2, "n2")
      .withColumn("total_rank", col("w1") + col("w2"))
      .orderBy(col("total_rank").desc, col("n1"), col("n2"), col("n3"))
      .select("n1", "n2", "n3", "total_rank")
      .collect().map(_.toSeq).toSeq
    val pages = Seq(0, 3, 6).map { off =>
      RankJoin.anyKPage(rels, Seq("w1", "w2"), off, 3, ties)
        .orderBy(col("total_rank").desc, col("n1"), col("n2"), col("n3"))
        .select("n1", "n2", "n3", "total_rank")
        .collect().map(_.toSeq).toSeq
    }
    assert(pages.flatten == full.take(9)) // consecutive pages == ranked prefix
  }

  test("topKChain over 3 relations equals the full-join oracle") {
    val e = Seq(
      ("a", "b", 5.0), ("a", "c", 3.0), ("b", "c", 4.0), ("b", "d", 9.0),
      ("c", "d", 1.0), ("c", "a", 7.0), ("d", "a", 2.0), ("d", "b", 6.0))
    val r1 = e.toDF("n1", "n2", "w1")
    val r2 = e.toDF("n2", "n3", "w2")
    val r3 = e.toDF("n3", "n4", "w3")
    val k = 5
    val got = RankJoin.topKChain(Seq(r1, r2, r3), Seq("w1", "w2", "w3"), k,
        Seq("n1", "n2", "n3", "n4"))
      .select("n1", "n2", "n3", "n4", "total_rank").collect().map(_.toSeq)
    val want = r1.join(r2, "n2").join(r3, "n3")
      .withColumn("total_rank", col("w1") + col("w2") + col("w3"))
      .orderBy(col("total_rank").desc, col("n1"), col("n2"), col("n3"), col("n4"))
      .limit(k)
      .select("n1", "n2", "n3", "n4", "total_rank").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq && want.nonEmpty)
  }
}
