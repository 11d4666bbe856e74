package graft.cqc

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Seeded property tests: CQC solve on random path queries with random
 * comparisons must equal join-then-filter, and the chain rank join must
 * equal full-join-then-sort-limit — across random inputs.
 */
class YannakakisPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.chooseNum(5, 30).flatMap { n =>
      Gen.listOfN(n, for {
        s <- Gen.chooseNum(0L, 5L)
        d <- Gen.chooseNum(0L, 5L)
      } yield (s, d))
    }

  test("aggregate family over random chains equals the enumerated oracle") {
    var seed = Seed(121733L)
    for (i <- 1 to 8) {
      val es = edgeGen.apply(Gen.Parameters.default, seed).get
      seed = seed.next
      val e = es.distinct.toDF("x", "y")
      val n = 2 + i % 3 // 2-4 relations
      val vars = (0 to n).map(j => s"v$j")
      val rels = (0 until n).map(j => Rel(s"g$j", e.toDF(vars(j), vars(j + 1))))
      var naive = e.toDF(vars(0), vars(1))
      for (j <- 1 until n) naive = naive.join(e.toDF(vars(j), vars(j + 1)), vars(j))
      val g = vars(0)
      val v = vars(n) // last var: lives only in the last relation

      val gotC = Yannakakis.aggOverJoin(rels, Seq(g), Seq(v))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val wantC = naive.groupBy(g)
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"),
          org.apache.spark.sql.functions.sum(col(v)).as(s"sum_$v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(gotC == wantC, s"agg case $i edges=$es")

      val gotE = Yannakakis.extremaOverJoin(rels, Seq(g), v)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val wantE = naive.groupBy(g)
        .agg(org.apache.spark.sql.functions.min(col(v)).as("mn"),
          org.apache.spark.sql.functions.max(col(v)).as("mx"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(gotE == wantE, s"extrema case $i edges=$es")
    }
  }

  test("solve(path-3 + random comparison) equals naive join+filter") {
    var seed = Seed(121853L)
    val ops = Seq("<", "<=", ">", ">=")
    for (i <- 1 to 10) {
      val es = edgeGen.apply(Gen.Parameters.default, seed).get
      seed = seed.next
      val op = ops(i % ops.length)
      val e = es.distinct.toDF("x", "y")
      val got = Yannakakis.solve(
        Seq(Rel("g1", e.toDF("a", "b")), Rel("g2", e.toDF("b", "c")),
          Rel("g3", e.toDF("c", "d"))),
        Seq(Cmp("a", op, "d")))
        .select("a", "b", "c", "d").collect().map(_.toSeq).toSet
      val want = e.toDF("a", "b").join(e.toDF("b", "c"), "b").join(e.toDF("c", "d"), "c")
        .where(expr(s"a $op d"))
        .select("a", "b", "c", "d").collect().map(_.toSeq).toSet
      assert(got == want, s"case $i op=$op edges=$es")
    }
  }

  test("chain rank join equals full-join oracle on random rated graphs") {
    val ratedGen: Gen[List[(Long, Long, Double)]] =
      Gen.chooseNum(5, 25).flatMap { n =>
        Gen.listOfN(n, for {
          s <- Gen.chooseNum(0L, 4L)
          d <- Gen.chooseNum(0L, 4L)
          w <- Gen.chooseNum(1, 50)
        } yield (s, d, w.toDouble))
      }
    var seed = Seed(121993L)
    for (i <- 1 to 8) {
      val es = ratedGen.apply(Gen.Parameters.default, seed).get
        .groupBy(t => (t._1, t._2)).map(_._2.head).toList // one rating per edge
      seed = seed.next
      val k = 1 + i % 5
      val r1 = es.toDF("n1", "n2", "w1")
      val r2 = es.toDF("n2", "n3", "w2")
      val got = graft.topk.RankJoin.topKChain(Seq(r1, r2), Seq("w1", "w2"), k,
          Seq("n1", "n2", "n3"))
        .select("n1", "n2", "n3", "total_rank").collect().map(_.toSeq)
      val want = r1.join(r2, "n2")
        .withColumn("total_rank", col("w1") + col("w2"))
        .orderBy(col("total_rank").desc, col("n1"), col("n2"), col("n3"))
        .limit(k)
        .select("n1", "n2", "n3", "total_rank").collect().map(_.toSeq)
      assert(got.toSeq == want.toSeq, s"case $i k=$k edges=$es")
    }
  }
}
