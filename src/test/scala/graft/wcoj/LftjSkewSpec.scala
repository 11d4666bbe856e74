package graft.wcoj

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/**
 * Hypercube load under PLANTED DEGREE SKEW (r13) — the wcoj analogue of
 * the salted-join spec. The scaladoc claim is that cell input is
 * ~|E|/side², "independent of skew in the join RESULT"; this spec pins
 * what happens when the INPUT is skewed: a hub's neighborhood spreads
 * across the `side` coordinates of its partner variable, so no cell ever
 * holds the whole neighborhood — per-cell hub mass is ~deg/side per
 * bound-dims slab, and doubling the side keeps shrinking the max cell.
 * (Reference semantics: HyperCube shuffle,
 * sqlplus-lib helper/ImplicitConversions.scala:338-397.)
 */
class LftjSkewSpec extends SparkSpecBase {

  private val tri = Seq(("a", "b"), ("b", "c"), ("a", "c"))
  private val order = Seq("a", "b", "c")

  /** Power-law-ish graph: hub 0 touches every vertex (degree ~2·nHub),
    * plus a sparse deterministic background. */
  private def skewed(nHub: Int, nBg: Int) = {
    import spark.implicits._
    val hub = (1 to nHub).flatMap(i => Seq((0L, i.toLong), (i.toLong, 0L)))
    val bg = (0 until nBg).map(i =>
      ((i * 7 % 997).toLong + 1L, (i * 13 % 997).toLong + 1L))
    (hub ++ bg).distinct.toDF("src", "dst")
  }

  test("a hub's neighborhood never lands in one cell; max cell shrinks with side") {
    val edges = skewed(nHub = 2000, nBg = 3000)
    val nEdges = edges.count()
    val hubDeg = 4000L // hub 0's in+out degree

    def loads(side: Int): (Long, Double, Long) = {
      val l = Lftj.cellLoads(edges, tri, order, side)
        .agg(max(col("load")), avg(col("load")), count(lit(1))).head()
      (l.getLong(0), l.getDouble(1), l.getLong(2))
    }

    val (max4, avg4, cells4) = loads(4)
    val (max8, avg8, cells8) = loads(8)

    // (a) the disaster bound: the naive per-vertex shuffle would put the
    // hub's whole replicated neighborhood (deg × side^(n-2) rows for its
    // slab) into one cell; the hypercube spreads the partner coordinate,
    // so the max cell holds well under one full neighborhood
    assert(max4 < hubDeg,
      s"side=4: max cell load $max4 must stay below the hub degree $hubDeg")
    // (b) every cell exists and the imbalance is bounded: the hub slab
    // (fixed hub coordinate) concentrates ~patterns·deg/side per cell
    // over side^(n-2)·side cells — allow that structural factor, but the
    // max must not exceed slab-share + 4x the mean background
    val slabShare = 3.0 * hubDeg / 4 // patterns × deg / side
    assert(max4 <= slabShare + 4 * avg4,
      s"side=4: max $max4 exceeds hub slab share $slabShare + 4x mean $avg4")
    // (c) the scaling law: doubling the side must keep shrinking the
    // max cell (the hub slab halves; the background quarters)
    assert(max8 <= max4 * 0.7,
      s"side 4->8 must shrink the max cell: $max4 -> $max8")
    assert(cells4 == 64 && cells8 == 512,
      s"all cells must receive rows (no dead coordinates): $cells4, $cells8")
    // (d) sanity: replication volume is patterns × side^(n-2) × |E|
    val total4 = cells4 * avg4
    assert(math.abs(total4 - 3.0 * 4 * nEdges) < 1e-6,
      s"replication accounting: $total4 vs ${3.0 * 4 * nEdges}")
  }

  test("skewed-input triangle count matches the binary-join oracle at several sides") {
    val edges = skewed(nHub = 300, nBg = 1200)
    val oracle = edges.as("e1")
      .join(edges.as("e2"), col("e1.dst") === col("e2.src"))
      .join(edges.as("e3"),
        col("e1.src") === col("e3.src") && col("e2.dst") === col("e3.dst"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
      .distinct()
      .collect().map(_.toSeq).toSet
    for (side <- Seq(2, 4, 8)) {
      val got = Lftj.enumerate(edges, tri, order, cubeSide = side)
        .collect().map(_.toSeq).toSet
      assert(got == oracle, s"side=$side: ${got.size} vs oracle ${oracle.size}")
    }
    assert(oracle.nonEmpty, "planted graph must actually close triangles")
  }
}
