package graft.graphs

import graft.SparkSpecBase

/** Fixed-point PageRank contracts: hand-computable iterations, the
  * 2-cycle fixed point, hub dominance, and mass conservation bounds. */
class PageRankSpec extends SparkSpecBase {

  import spark.implicits._
  private val S = PageRank.scale

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.pagerank(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("one iteration of a single edge matches the hand arithmetic") {
    // nodes {1, 2}, base = S/2; node 1 has no in-edges, node 2 receives
    // all of node 1's mass
    val got = run(Seq((1L, 2L)), 1)
    val base = S / 2
    assert(got(1L) == 15L * base / 100)
    assert(got(2L) == (15L * base + 85L * base) / 100)
  }

  test("a 2-cycle is the exact fixed point at every depth") {
    for (iters <- Seq(1, 3, 5)) {
      val got = run(Seq((1L, 2L), (2L, 1L)), iters)
      assert(got == Map(1L -> S / 2, 2L -> S / 2), s"iters=$iters")
    }
  }

  test("star-graph center dominates every leaf") {
    val leaves = (2L to 9L)
    val got = run(leaves.map(l => (l, 1L)) ++ Seq((1L, 2L)), 3)
    assert(leaves.forall(l => got(1L) > got(l)))
    // pure leaves (all but 2, which also receives the center's edge)
    // tie exactly: identical in-neighborhoods, identical integer maths
    val pure = leaves.filter(_ != 2L)
    assert(pure.forall(l => got(l) == got(pure.head)))
    assert(got(2L) > got(pure.head)) // 2 gets the center's mass on top
  }

  test("total mass never exceeds the scale and never collapses") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val total = run(edges, 3).values.sum
    assert(total <= S)
    assert(total > S / 2) // dangling/rounding losses stay bounded
  }

  test("repeated runs are bit-identical (pure integer arithmetic)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (3L, 4L))
    assert(run(edges, 4) == run(edges, 4))
  }
}
