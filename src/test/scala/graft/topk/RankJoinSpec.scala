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

  test("topKChainExact is exact on a cyclic (triangle) chain — advisor counterexample") {
    // R(a,b), S(b,c), T(c,a): the LAST relation joins back to R's `a`.
    // Pruning R's rows per adjacent key `b` alone would keep only the
    // cum-best (a1,b0,100) and drop (a2,b0,1) — but only a2 closes the
    // triangle via T, so the true top-1 (total 1001) would vanish.
    val r = Seq(("a1", "b0", 100.0), ("a2", "b0", 1.0)).toDF("a", "b", "wr")
    val s = Seq(("b0", "c0", 0.0)).toDF("b", "c", "ws")
    val t = Seq(("c0", "a2", 1000.0)).toDF("c", "a", "wt")
    val got = RankJoin.topKChainExact(Seq(r, s, t), Seq("wr", "ws", "wt"), 1, Seq(col("a").asc))
      .select("a", "b", "c", "total_rank").collect().map(_.toSeq)
    assert(got.toSeq == Seq(Seq("a2", "b0", "c0", 1001.0)))
  }

  test("topKChain is exact on a cyclic (triangle) chain vs full-join oracle") {
    val e = Seq(
      ("a", "b", 5.0), ("a", "c", 3.0), ("b", "c", 4.0), ("b", "d", 9.0),
      ("c", "d", 1.0), ("c", "a", 7.0), ("d", "a", 2.0), ("d", "b", 6.0))
    val r1 = e.toDF("n1", "n2", "w1")
    val r2 = e.toDF("n2", "n3", "w2")
    val r3 = e.toDF("n3", "n1", "w3") // closes the cycle back to n1
    val k = 3
    val got = RankJoin.topKChain(Seq(r1, r2, r3), Seq("w1", "w2", "w3"), k,
        Seq("n1", "n2", "n3"))
      .select("n1", "n2", "n3", "total_rank").collect().map(_.toSeq)
    val want = r1.join(r2, "n2").join(r3, Seq("n3", "n1"))
      .withColumn("total_rank", col("w1") + col("w2") + col("w3"))
      .orderBy(col("total_rank").desc, col("n1"), col("n2"), col("n3"))
      .limit(k)
      .select("n1", "n2", "n3", "total_rank").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq && want.nonEmpty)
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
