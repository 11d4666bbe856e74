package graft.datapipe

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic dedup ([[Ann.semanticDedup]]): planted
  * clusters with hand-checked decisions, plus a randomized battery that
  * checks the within-cluster decision logic against a pure-Scala oracle
  * driven by the operator's own cluster assignment. */
class SemanticDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
    val na = math.sqrt(a.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
    val nb = math.sqrt(b.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
    dot / (na * nb)
  }

  test("planted two-cluster corpus: dups drop onto their lower-id mate, outliers keep") {
    // seeds 0 and 1 anchor the two clusters (k = 2)
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(0.95f, 0.05f, 0.0f, 0.0f)),  // near 0 -> dup of 0
      (3L, Array(0.0f, 0.9f, 0.1f, 0.0f)),    // near 1 -> dup of 1
      (4L, Array(0.94f, 0.06f, 0.0f, 0.0f)),  // nearer 2 than 0 (both above tau)
      (5L, Array(0.3f, 0.1f, 0.94f, 0.0f)))   // cos < tau to everything -> keeper
      .toDF("vec_id", "embedding")
    val out = Ann.semanticDedup(vecs, rounds = 1, k = 2).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Boolean]("keep"), Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong)))
      .toMap
    assert(out.size == 6, "one decision row per input vector")
    assert(out(0L) == (true, None))
    assert(out(1L) == (true, None))
    assert(out(2L) == (false, Some(0L)))
    assert(out(3L) == (false, Some(1L)))
    // 4 has two lower-id cluster-mates above tau; dup_of is the MAX-cos one (2)
    assert(out(4L)._1 == false)
    assert(out(4L)._2.contains(2L))
    assert(out(5L) == (true, None), "low-cosine outlier survives in its cluster")
  }

  test("randomized battery: decisions match a per-cluster pure-Scala oracle") {
    val n = 120
    val vecs = (0L until n.toLong).map { i =>
      (i, Array.tabulate(16)(d =>
        (math.sin((i % 7) * 31 + d * 7) + 0.25 * math.sin(i * 13 + d * 3)).toFloat))
    }
    val out = Ann.semanticDedup(vecs.toDF("vec_id", "embedding"), rounds = 1, k = 4)
      .collect().map { r =>
        (r.getAs[Long]("vec_id"), r.getAs[Long]("cid"), r.getAs[Boolean]("keep"),
          Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("sim")).map(_.toDouble))
      }
    assert(out.map(_._1).sorted.toSeq == (0L until n.toLong).toSeq,
      "exactly one decision per vector")
    val emb = vecs.toMap
    val cidOf = out.map(t => t._1 -> t._2).toMap
    // oracle: given the operator's own assignment, keep <=> no lower-id
    // same-cluster mate at cos >= tau; dup_of = argmax-cos (ties lower id)
    out.foreach { case (id, cid, keep, dupOf, sim) =>
      val mates = (0L until id).filter(j => cidOf(j) == cid)
        .map(j => (j, cos(emb(j), emb(id))))
        .filter(_._2 >= Ann.sdTau)
      if (mates.isEmpty) {
        assert(keep && dupOf.isEmpty && sim.isEmpty, s"vec $id should keep")
      } else {
        val best = mates.minBy { case (j, c) => (-c, j) }
        assert(!keep, s"vec $id has mate(s) $mates but kept")
        assert(dupOf.contains(best._1), s"vec $id dup_of ${dupOf} != ${best._1}")
        assert(sim.exists(s => math.abs(s - best._2) < 1e-6),
          s"vec $id sim $sim != ${best._2}")
      }
    }
    // non-trivial split both ways
    assert(out.count(_._3) > 0 && out.count(!_._3) > 0)
  }

  test("hot-cluster cap: planted single-cluster corpus stays sub-quadratic") {
    // the realistic adversarial input for a dedup operator: every vector
    // is a near-copy, so one IVF centroid absorbs the whole corpus and
    // uncapped pair generation is all-pairs. n=300 identical-direction
    // vectors (tiny jitter), k=1 cluster, cap=50: sub-buckets = ceil
    // (300/50) = 6, candidate volume per sub-bucket = C(50,2), total
    // 6*1225 = 7350 vs the uncapped C(300,2) = 44850.
    val n = 300
    val vecs = (0L until n.toLong).map { i =>
      (i, Array.tabulate(8)(d => (1.0 + 0.001 * math.sin(i * 7 + d)).toFloat))
    }.toDF("vec_id", "embedding")
    val capped = Ann.sdCandidateCount(vecs, rounds = 1, k = 1, clusterCap = 50)
    val uncapped = Ann.sdCandidateCount(vecs, rounds = 1, k = 1, clusterCap = n)
    assert(uncapped == n.toLong * (n - 1) / 2, "one hot cluster, all-pairs without the cap")
    assert(capped == 6L * (50L * 49 / 2), s"deterministic sub-bucket volume, got $capped")
    // the decision relation stays total and deterministic under the cap:
    // one row per vector, dup_of within the same sub-bucket => lower id
    val out = Ann.semanticDedup(vecs, rounds = 1, k = 1, clusterCap = 50).collect()
    assert(out.length == n, "one decision row per input vector under the cap")
    out.filter(!_.getAs[Boolean]("keep")).foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val d = r.getAs[java.lang.Long]("dup_of").toLong
      assert(d < id && d % 6 == id % 6, s"dup_of $d not a lower-id sub-bucket mate of $id")
    }
    // every sub-bucket's minimum id survives (near-identical vectors =>
    // everything else in the bucket drops onto a lower id)
    val keepers = out.filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("vec_id")).sorted
    assert(keepers.toSeq == (0L until 6L).toSeq, s"got ${keepers.toSeq}")
  }

  test("cap is inert while every cluster fits it (default path unchanged)") {
    val vecs = (0L until 90L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 11 + d * 3).toFloat))
    }.toDF("vec_id", "embedding")
    val dflt = Ann.semanticDedup(vecs, rounds = 1, k = 4)
      .collect().map(_.toString).sorted
    val bigCap = Ann.semanticDedup(vecs, rounds = 1, k = 4, clusterCap = 1000000)
      .collect().map(_.toString).sorted
    assert(dflt.sameElements(bigCap), "default cap (10000) never triggers on 90 vectors")
  }

  test("dup_of always points at a lower id in the same cluster") {
    val vecs = (0L until 80L).map { i =>
      (i, Array.tabulate(8)(d => math.cos(i * 17 + d * 5).toFloat))
    }.toDF("vec_id", "embedding")
    val rows = Ann.semanticDedup(vecs, rounds = 2, k = 4).collect()
    val cidOf = rows.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    rows.filter(!_.getAs[Boolean]("keep")).foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val d = r.getAs[java.lang.Long]("dup_of").toLong
      assert(d < id, s"dup_of $d not below $id")
      assert(cidOf(d) == cidOf(id), s"dup_of $d in a different cluster")
    }
  }

  /** The exact trained centroid for k=1, rounds=1: every vector assigns
    * to the single seed, so the centroid is the per-dimension
    * decimal-exact mean over the WHOLE corpus — reproducible in pure
    * Scala (float -> DECIMAL(20,10) HALF_UP, decimal sum, double
    * divide, 6dp HALF_UP round), which is what makes the k=1 greedy
    * oracle below exact rather than approximate. */
  private def k1Centroid(vecs: Seq[(Long, Array[Float])]): Array[Double] = {
    val dim = vecs.head._2.length
    Array.tabulate(dim) { d =>
      val s = vecs.map(v => BigDecimal(v._2(d).toDouble)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
      BigDecimal(s.toDouble / vecs.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  private def cosD(a: Array[Float], b: Array[Double]): Double = {
    val dot = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y }
    val na = math.sqrt(a.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
    val nb = math.sqrt(b.foldLeft(0.0)((s, y) => s + y * y))
    dot / (na * nb)
  }

  test("group policy: greedy keep-farthest-from-centroid matches the exact k=1 oracle " +
    "and diverges from keep-first-id where the paper says it should") {
    // dup pair {0,1}: vec 0 tilts toward +y (the direction the rest of
    // the corpus pulls the centroid), so 0 is CLOSER to the centroid
    // than 1 -> the paper's policy keeps 1 (the hard example), while
    // keep-first-id keeps 0
    val vecs = Seq(
      (0L, Array(1.0f, 0.05f, 0.0f, 0.0f)),
      (1L, Array(0.95f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.2f, 0.0f)),
      (3L, Array(0.05f, 0.95f, 0.18f, 0.0f)),
      (4L, Array(0.5f, 0.5f, 0.7f, 0.4f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Ann.semanticDedupGroup(df, rounds = 1, k = 1).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Boolean]("keep"), Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong)))
      .toMap
    assert(out.size == vecs.size, "one decision row per vector")

    // pure-Scala mirror of the published rule: rank ascending by cosine
    // to the (exactly reproduced) centroid, ties by id; x is removed iff
    // ANY earlier-ranked vector is a duplicate of it (kept or not — the
    // triu-max rule), dup_of = the strongest such, ties -> lower id
    val cent = k1Centroid(vecs)
    val rank = vecs.map { case (id, e) => id -> cosD(e, cent) }
      .sortBy { case (id, c) => (c, id) }.map(_._1).zipWithIndex.toMap
    val emb = vecs.toMap
    vecs.foreach { case (id, e) =>
      val earlier = vecs.filter(v => rank(v._1) < rank(id))
        .map(v => (v._1, cos(emb(v._1), e))).filter(_._2 >= Ann.sdTau)
      if (earlier.isEmpty) assert(out(id) == (true, None), s"vec $id should keep")
      else {
        val best = earlier.minBy { case (j, c) => (-c, j) }
        assert(out(id) == (false, Some(best._1)),
          s"vec $id: got ${out(id)}, oracle dup_of ${best._1}")
      }
    }

    // the advertised divergence: same drop on the {0,1} pair, OPPOSITE
    // survivor — and the id-policy baseline confirms it
    assert(out(1L) == (true, None), "group policy keeps the far-from-centroid member")
    assert(out(0L) == (false, Some(1L)), "…and drops the close one onto it")
    val byId = Ann.semanticDedup(df, rounds = 1, k = 1).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("keep")).toMap
    assert(byId(0L) && !byId(1L), "keep-first-id keeps the other member of the pair")
  }

  test("group policy randomized battery (k=4): decisions match the greedy rule " +
    "driven by the operator's own clusters and trained centroids") {
    val n = 150
    val vecs = (0L until n.toLong).map { i =>
      (i, Array.tabulate(12)(d =>
        (math.sin((i % 6) * 37 + d * 5) + 0.3 * math.sin(i * 17 + d * 7)).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val k = 4
    val out = Ann.semanticDedupGroup(df, rounds = 1, k = k).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cid"), r.getAs[Boolean]("keep"),
          Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong))))
      .toMap
    assert(out.size == n, "one decision row per vector")
    // oracle inputs straight from the operator's own machinery: the
    // trained centroid table and the output's cluster assignment
    val cents = Ann.trainedCentroids(df, 1, k).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val emb = vecs.toMap
    val cidOf = out.map { case (id, (cid, _, _)) => id -> cid }
    // rank ascending by cosine-to-own-centroid (farthest first, ties ->
    // lower id), per cluster
    val rank = vecs.map { case (id, e) => id -> cosD(e, cents(cidOf(id))) }
      .groupBy { case (id, _) => cidOf(id) }
      .flatMap { case (_, members) =>
        members.sortBy { case (id, c) => (c, id) }.map(_._1).zipWithIndex
      }
    vecs.foreach { case (id, e) =>
      val earlier = vecs
        .filter(v => cidOf(v._1) == cidOf(id) && rank(v._1) < rank(id))
        .map(v => (v._1, cos(emb(v._1), e))).filter(_._2 >= Ann.sdTau)
      if (earlier.isEmpty)
        assert(out(id)._2 && out(id)._3.isEmpty, s"vec $id should keep: ${out(id)}")
      else {
        val best = earlier.minBy { case (j, c) => (-c, j) }
        assert(!out(id)._2 && out(id)._3.contains(best._1),
          s"vec $id: got ${out(id)}, oracle dup_of ${best._1}")
      }
    }
    // the battery is non-trivial: both keeps and drops, several clusters
    assert(out.values.count(_._2) > 0 && out.values.count(!_._2) > 0)
    assert(out.values.map(_._1).toSet.size > 1)
  }

  test("group policy respects the hot-cluster cap: dup_of stays a same-sub-bucket mate") {
    val n = 120
    val vecs = (0L until n.toLong).map { i =>
      (i, Array.tabulate(8)(d => (1.0 + 0.001 * math.sin(i * 7 + d)).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Ann.semanticDedupGroup(vecs, rounds = 1, k = 1, clusterCap = 40).collect()
    assert(out.length == n, "one decision row per vector under the cap")
    // ceil(120/40) = 3 sub-buckets on vec_id mod; near-identical vectors
    // collapse to ONE survivor per sub-bucket
    out.filter(!_.getAs[Boolean]("keep")).foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val d = r.getAs[java.lang.Long]("dup_of").toLong
      assert(d % 3 == id % 3, s"dup_of $d not a sub-bucket mate of $id")
    }
    assert(out.count(_.getAs[Boolean]("keep")) == 3, "one survivor per sub-bucket")
  }
}
