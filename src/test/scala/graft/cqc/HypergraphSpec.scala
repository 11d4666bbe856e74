package graft.cqc

import graft.SparkSpecBase

class HypergraphSpec extends SparkSpecBase {
  import spark.implicits._

  private def rel(name: String, cols: String*) =
    Rel(name, Seq.empty[Int].toDF("x").select(cols.map(c => org.apache.spark.sql.functions.lit(0).as(c)): _*))

  test("GYO accepts a path query and roots a valid tree") {
    val tree = Hypergraph.joinTree(Seq(
      rel("r1", "a", "b"), rel("r2", "b", "c"), rel("r3", "c", "d")))
    assert(tree.rels.size == 3)
    // every non-root node has a parent and shares at least one var with it
    tree.topDown.drop(1).foreach { n =>
      assert(tree.sharedVars(n, tree.parentOf(n)).nonEmpty)
    }
    assert(tree.topDown.head == tree.root)
    assert(tree.bottomUp.last == tree.root)
  }

  test("GYO accepts a star query") {
    assert(Hypergraph.isAcyclic(Seq(
      rel("hub", "a", "b", "c"), rel("s1", "a", "x"), rel("s2", "b", "y"), rel("s3", "c", "z"))))
  }

  test("GYO rejects the triangle") {
    assert(!Hypergraph.isAcyclic(Seq(
      rel("e1", "a", "b"), rel("e2", "b", "c"), rel("e3", "c", "a"))))
    intercept[CyclicQueryException] {
      Hypergraph.joinTree(Seq(rel("e1", "a", "b"), rel("e2", "b", "c"), rel("e3", "c", "a")))
    }
  }

  test("tree path connects any two nodes through their common ancestor") {
    val tree = Hypergraph.joinTree(Seq(
      rel("r1", "a", "b"), rel("r2", "b", "c"), rel("r3", "c", "d"), rel("r4", "c", "e")))
    val p = tree.path("r1", "r4")
    assert(p.head == "r1" && p.last == "r4")
    assert(p.distinct.size == p.size)
  }
}
