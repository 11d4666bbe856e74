package graft.wcoj

import graft.SparkSpecBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Property test: on arbitrary small directed graphs (self-loops and all),
 * the hypercube LFTJ enumeration must equal the binary-join enumeration
 * for the triangle pattern — for every cube side. Drives ScalaCheck
 * generators directly (fixed seed, 15 cases) since the scalatest bridge
 * artifact is not on the classpath.
 */
class LftjPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.chooseNum(1, 40).flatMap { n =>
      Gen.listOfN(n, for {
        s <- Gen.chooseNum(0L, 7L)
        d <- Gen.chooseNum(0L, 7L)
      } yield (s, d))
    }

  test("LFTJ triangle enumeration equals binary joins on random graphs") {
    var seed = Seed(122081L)
    for (i <- 1 to 15) {
      val es = edgeGen.apply(Gen.Parameters.default, seed)
        .getOrElse(fail(s"generator returned nothing at case $i"))
      seed = seed.next
      val side = 1 + i % 3
      val edges = es.distinct.toDF("src", "dst")
      val got = Lftj.enumerate(edges,
          Seq(("a", "b"), ("b", "c"), ("c", "a")), Seq("a", "b", "c"), cubeSide = side)
        .collect().map(_.toSeq).toSet
      val want = Wcoj.triangles(edges)
        .select("a", "b", "c").collect().map(_.toSeq).toSet
      assert(got == want, s"case $i (side=$side, edges=$es)")
    }
  }
}
