package graft.datapipe

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpecBase {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),  // near 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),  // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)), // opposite of 0
    (50L, Array(1.0f, 0.05f, 0.0f, 0.0f))) // query (50 % queryMod == 0)
    .toDF("vec_id", "embedding")

  test("cosine column: identical vectors give 1, orthogonal 0, opposite -1") {
    val a = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    assert(math.abs(a.select(Ann.cosine(col("a"), col("b"))).head().getDouble(0) - 1.0) < 1e-12)
    val o = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
    assert(o.select(Ann.cosine(col("a"), col("b"))).head().getDouble(0) == 0.0)
    val n = Seq((Array(1.0f, 0.0f), Array(-1.0f, 0.0f))).toDF("a", "b")
    assert(n.select(Ann.cosine(col("a"), col("b"))).head().getDouble(0) == -1.0)
  }

  test("brute-force top-k ranks by cosine with id tie-break, excludes self") {
    val out = Ann.bruteForceTopK(vecs).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nbr_id"), r.getAs[Long]("rnk")))
    assert(out.map(_._1).toSet == Set(0L, 50L)) // both ids divisible by queryMod
    assert(out.forall { case (q, n, _) => q != n }) // self excluded
    val for50 = out.filter(_._1 == 50L).sortBy(_._3)
    assert(for50.head._2 == 0L) // closest to the query is the x-axis vector
    assert(for50.map(_._3).toSeq == (1L to for50.length).toSeq)
  }

  test("multiprobe recovers single-plane splits: recall >= single-probe LSH") {
    // 200 random-ish deterministic vectors, enough bucket fragmentation
    // that single-probe LSH misses some true neighbors
    val many = (0L until 200L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 31 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nbr_id"))).toSet
    val truth = pairs(Ann.bruteForceTopK(many))
    val single = pairs(Ann.lshTopK(many))
    val multi = pairs(Ann.lshMultiprobeTopK(many))
    val rSingle = (truth intersect single).size
    val rMulti = (truth intersect multi).size
    assert(rMulti >= rSingle, s"multiprobe recall $rMulti < single $rSingle")
    // the probe set strictly contains the single-probe bucket, so every
    // single-probe candidate survives; with 200 vectors in 256 buckets
    // the 1-flip probes must find strictly more of the true top-k
    assert(rMulti > rSingle, s"expected strict recall gain ($rMulti vs $rSingle)")
  }

  test("refine re-rank: exact sims, recall >= raw PQ, shortlist bounded") {
    val many = (0L until 200L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 31 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nbr_id"))).toSet
    val truth = Ann.bruteForceTopK(many).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nbr_id")) ->
        r.getAs[Double]("sim")).toMap
    val pq = pairs(Ann.pqTopK(many))
    val refined = Ann.refineTopK(many).collect()
    // stage 2 is EXACT: every refined pair that is a true-top-k pair
    // carries the identical exact similarity brute force computes
    refined.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("nbr_id"))
      truth.get(key).foreach { s =>
        assert(r.getAs[Double]("sim") == s, s"sim drift at $key")
      }
    }
    // recall repaired: refine finds at least as many true neighbors as
    // the raw ADC ranking it re-ranks
    val rPq = (truth.keySet intersect pq).size
    val rRef = (truth.keySet intersect refined.map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("nbr_id"))).toSet).size
    assert(rRef >= rPq && rRef > 0, s"refine recall $rRef < pq $rPq")
    // output is exactly topK per query, ranks contiguous
    refined.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rnk")).sorted.toSeq == (1L to Ann.topK).toSeq)
    }
  }

  test("near-dup multiprobe pairs are a superset of the single-probe pairs") {
    val many = (0L until 150L).map { i =>
      // clustered vectors: base direction per i%10 with small noise
      (i, Array.tabulate(64)(d =>
        (math.sin((i % 10) * 31 + d * 7) + 0.15 * math.sin(i * 13 + d)).toFloat))
    }.toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    val single = pairs(Ann.embedNearDup(many))
    val multi = pairs(Ann.embedNearDupMultiprobe(many))
    // the probe set contains each vector's own bucket, so every single-
    // probe candidate survives; the 1-flip probes can only add pairs
    assert(single.subsetOf(multi), s"${(single diff multi).size} pairs lost")
    assert(multi.size > single.size,
      s"expected strict recall gain (${multi.size} vs ${single.size})")
  }

  test("Lloyd training converges to a fixed point within the round budget") {
    // 3 tight clusters; centroids must stop moving well before 10 rounds
    val pts = (0L until 60L).map { i =>
      val c = (i % 3).toInt
      (i, Array.tabulate(64)(d =>
        (math.sin(c * 17 + d) + 0.01 * math.sin(i * 7 + d)).toFloat))
    }.toDF("vec_id", "embedding")
    val (cent, rounds) = Ann.ivfTrainConverged(pts, maxRounds = 10)
    assert(cent.size == Ann.ivfCentroids.min(60))
    assert(rounds >= 1 && rounds < 10, s"did not converge: $rounds rounds")
    // fixed point: within the 6dp mean rounding, the assignment is stable
    val (cent2, _) = Ann.ivfTrainConverged(pts, maxRounds = rounds + 1)
    assert(cent2.map { case (i, a) => (i, a.toSeq) } ==
      cent.map { case (i, a) => (i, a.toSeq) })
  }

  test("ivfCentroidsFor holds expected cluster population constant") {
    // K tracks N / target, so per-cluster cost per vector is flat
    assert(Ann.ivfCentroidsFor(1000) == Ann.ivfCentroids, "small corpora keep the floor")
    assert(Ann.ivfCentroidsFor(1000000) == 1000000 / 256)
    assert(Ann.ivfCentroidsFor(100000000, 1024) == math.min(100000000 / 1024, 65536),
      "clamped to a broadcastable centroid table")
    assert(Ann.ivfCentroidsFor(1L << 40) == 65536, "upper clamp at cluster scale")
    // and the sized k threads through the dedup decision end-to-end
    import spark.implicits._
    val vecs = (0L until 64L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 3 + d).toFloat))).toDF("vec_id", "embedding")
    val k = Ann.ivfCentroidsFor(64, targetClusterSize = 8)
    val out = Ann.semanticDedup(vecs, rounds = 1, k = k).collect()
    assert(out.length == 64 && out.map(_.getAs[Long]("cid")).distinct.length > 1)
  }

  test("two-level IVF assignment scores ~2*sqrt(K) centroids per vector, not K") {
    // the 100 TB defect this pins closed: flat assignment scored all K
    // centroids per vector — at the 65,536-K clamp, the dominant flop
    // cost of indexing 10^10+ vectors. The two-level path scores the
    // ceil(sqrt(K)) coarse layer plus ONE branch's fine centroids.
    import spark.implicits._
    val k = 64
    val vecs = (0L until 512L).map(i =>
      (i, Array.tabulate(16)(d => math.sin(i * 3.0 + d * 11.0).toFloat)))
      .toDF("vec_id", "embedding")
    val (n, scored) = Ann.ivfScoredCentroids(vecs, rounds = 1, k = k)
    assert(n == 512L)
    val perVector = scored.toDouble / n
    val kc = Ann.coarseK(k) // 8
    assert(perVector >= kc, "stage 1 alone scores sqrt(K)")
    // ~2*sqrt(K): coarse layer + mean branch width; far below flat K.
    // Branch sizes are data-dependent (a skewed coarse split widens the
    // hot branch), so allow 4x sqrt(K) headroom — still 4/sqrt(K) of
    // the flat cost, and the assert fails loudly if anyone regresses to
    // a flat K-scan.
    assert(perVector <= 4.0 * kc,
      s"per-vector scored centroids $perVector should be ~2*sqrt($k)=${2 * kc}, got flat-scan territory")
    assert(perVector < k / 2.0, s"must be well below flat K=$k (got $perVector)")

    // and the two-level decision still produces a full partition of the
    // collection: every vector lands in exactly one inverted list
    val out = Ann.semanticDedup(vecs, rounds = 1, k = k)
    assert(out.count() == 512L)
    assert(out.select("vec_id").distinct().count() == 512L)
  }

  test("small-K assignment takes the FLAT path (two-level only above ivf2MinK)") {
    // r11: at the K=16 test default the coarse layer is pure constant
    // overhead (extra Lloyd pass + second broadcast-join stage, √K=4
    // saves nothing — measured ~+1s per IVF entry), so below ivf2MinK
    // assignment must be the flat scan. The spec pins the cut both ways:
    // the default-K plan carries NO coarse-quantizer stages, and the
    // k=64 plan (the two-level spec above) does.
    import spark.implicits._
    assert(Ann.ivfCentroids < Ann.ivf2MinK, "test default must sit in the flat regime")
    val vecs = (0L until 128L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 5.0 + d * 13.0).toFloat)))
      .toDF("vec_id", "embedding")
    // flat regime: decisions are identical whether K sits below the
    // threshold or the SAME K is forced through with a one-round trainer
    // — i.e. the switch changed the route, not the semantics at small K
    val flat = Ann.semanticDedup(vecs, rounds = 1, k = Ann.ivfCentroids)
      .collect().map(_.toString).sorted.toSeq
    assert(flat.nonEmpty && flat.size == 128)
    // the oracle text for the flat regime must NOT carry the coarse CTEs
    val sql = Ann.semanticDedupSql
    assert(!sql.contains("coarse") && !sql.contains("branches"),
      "flat-regime oracle must not build the two-level quantizer")
    // and the two-level regime (k >= ivf2MinK) must
    val sql2 = Ann.semanticDedupSql(1, "embeddings", Ann.ivf2MinK)
    assert(sql2.contains("coarse") && sql2.contains("branches"),
      "two-level oracle starts at the threshold")
  }

  test("r12 plan pin: keep=1 assignment is a map-side argmin — no Window, fanout collapses before every exchange") {
    // the r11 scale finding this pins closed: the row_number window over
    // the crossJoin-exploded candidate frame shuffled sqrt(K)x (two-
    // level) or Kx (flat) the collection's vector mass per assignment
    // pass. The argmin form combines map-side: every exchange in the
    // assignment plan sits ABOVE a partial aggregate (slim (id, cand,
    // sim) rows collapse to one per id before they move) or carries the
    // un-exploded payload once.
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val vecs = (0L until 256L).map(i =>
        (i, Array.tabulate(8)(d => math.sin(i * 3.0 + d * 11.0).toFloat)))
        .toDF("vec_id", "embedding")
      def fanoutBelow(p: SparkPlan): Boolean = p match {
        case _: BaseAggregateExec => false // partial agg collapses the fanout
        case _: BroadcastNestedLoopJoinExec => true // the crossJoin explode
        case other => other.children.exists(fanoutBelow)
      }
      for (k <- Seq(Ann.ivfCentroids, Ann.ivf2MinK)) { // flat AND two-level
        val cent = Ann.trainedCentroids(vecs, rounds = 1, k = k)
        val assigned = Ann.ivfAssign2(vecs, "vec_id", cent, k, 1)
        val plan = assigned.queryExecution.executedPlan
        assert(!plan.toString.contains("Window"),
          s"k=$k keep=1 assignment must not rank via a window")
        val exchanges = plan.collect { case e: ShuffleExchangeLike => e }
        assert(exchanges.nonEmpty, "assignment does exchange (the payload re-join)")
        exchanges.foreach { e =>
          assert(!fanoutBelow(e.child),
            s"k=$k: an exchange moves the exploded candidate frame:\n$e")
        }
        // and the pick semantics are unchanged: one row per vector
        assert(assigned.count() == 256L)
        assert(assigned.select("vec_id").distinct().count() == 256L)
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  /** Unit vector at (polar, azimuth) degrees — spherical test geometry
    * for the orphan-branch construction below. */
  private def sph(polar: Double, az: Double): Array[Float] = {
    val p = math.toRadians(polar); val a = math.toRadians(az)
    Array((math.sin(p) * math.cos(a)).toFloat,
      (math.sin(p) * math.sin(a)).toFloat, math.cos(p).toFloat)
  }

  test("r12 adversarial: an EMPTY coarse branch cannot swallow vectors (assignment stays total)") {
    // r11 advice (medium): stage 1 picked a vector's nearest coarse over
    // ALL trained coarse centroids, but stage 2 inner-joined `branches`,
    // which only lists gids owning >= 1 fine centroid. A refined coarse
    // centroid that ends up owning ZERO fine centroids (the classic
    // empty-cluster case) silently DROPPED every vector whose nearest
    // coarse it was. This constructs exactly that geometry and pins the
    // one-decision-row-per-vector contract.
    //
    // Construction (3-d unit sphere, coarse seeds = fine cids 0..7):
    // seed B = cid1 at the north pole captures exactly {itself, m=cid18
    // at (19,180)}; its refined mean lands at ~(9.5,180). A tight
    // cluster D refines to ~(7.4,90) — closer to the pole than refined
    // B — and a cluster E refines to ~(24,180) — closer to m than
    // refined B. So in the branch map B owns NOTHING: gid 1 is dead.
    import spark.implicits._
    val k = 64
    val rows = Seq.newBuilder[(Long, Array[Float])]
    rows += 0L -> sph(180, 0) // seed A: south pole
    rows += 1L -> sph(0, 0) // seed B: north pole -> orphaned
    rows += 2L -> sph(12, 90) // seed D
    rows += 3L -> sph(40, 180) // seed E
    rows += 4L -> sph(120, 0) // southern seeds F..I
    rows += 5L -> sph(120, 90)
    rows += 6L -> sph(140, 180)
    rows += 7L -> sph(140, 270)
    for (i <- 0 until 5) rows += (8L + i) -> sph(6.5, 80 + i * 5) // D members
    for (i <- 0 until 5) rows += (13L + i) -> sph(21, 170 + i * 5) // E members
    rows += 18L -> sph(19, 180) // m: B's only non-self capture
    for (j <- 0 until 45) // southern filler around seeds F..I
      rows += (19L + j) -> sph(115 + 10 * (j % 4) + (j / 4) % 5, 37 * j % 360)
    val cent = rows.result().toDF("vec_id", "embedding")
      .select(col("vec_id").as("cid"), col("embedding").as("c_emb"))
    assert(cent.count() == k)

    // precondition: the crafted centroid table really orphans a branch
    val coarse = Ann.ivfCoarse(cent, Ann.coarseK(k))
    val owned = Ann.ivfBranches(cent, coarse)
      .select("gid").distinct().as[Long].collect().toSet
    val trained = coarse.select("cid").as[Long].collect().toSet
    assert(trained.diff(owned).nonEmpty,
      s"construction must empty a coarse branch (trained=$trained owned=$owned)")

    // vectors probing near the dead branch's direction — plus scatter
    val probes = (Seq(100L -> sph(9, 180), 101L -> sph(5, 170)) ++
      (102L until 110L).map(i => i -> sph((i * 37 % 180).toDouble, (i * 91 % 360).toDouble)))
      .toDF("vec_id", "embedding")
    val out = Ann.ivfAssign2(probes, "vec_id", cent, k, 1)
    assert(out.count() == 10L, "every vector keeps its decision row")
    assert(out.select("vec_id").distinct().count() == 10L)
    // the near-dead-branch probe assigns into a LIVE branch's fine list
    val cid100 = out.where(col("vec_id") === 100L).select("cid").as[Long].head()
    assert(owned.contains(
      Ann.ivfBranches(cent, coarse).where(col("cid") === cid100)
        .select("gid").as[Long].head()))
  }

  test("identical vectors land in the same LSH bucket") {
    val dup = Seq(
      (0L, Array.fill(64)(0.5f)), (1L, Array.fill(64)(0.5f)),
      (2L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val bk = Ann.buckets(dup, Ann.lshPlanes).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    assert(bk(0L) == bk(1L))
  }

  test("r12 IVFADC: candidates only from probed lists; ADC estimate identical to PQ's") {
    val many = (0L until 200L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 31 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val rows = Ann.ivfpqTopK(many).collect().map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("nbr_id"),
        r.getAs[Long]("rnk"), r.getAs[Double]("asim")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq, s"ranks for q=$q")
      assert(rs.length <= Ann.topK)
      assert(rs.forall(_._2 != q), "self excluded")
    }
    // structural IVF contract: every returned neighbor's inverted list is
    // one of its query's probed lists — IVFADC never scans outside them
    val cent = Ann.trainedCentroids(many, 1, Ann.ivfCentroids)
    val lists = Ann.ivfAssign2(many, "vec_id", cent, Ann.ivfCentroids, 1)
      .select(col("vec_id"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q = many.where(col("vec_id") % Ann.queryMod === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val probed = Ann.ivfAssign2(q, "q_id", cent, Ann.ivfCentroids, Ann.ivfProbes)
      .select(col("q_id"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { case (qid, nbr, _, _) =>
      assert(probed.contains((qid, lists(nbr))),
        s"nbr $nbr (list ${lists(nbr)}) not in q=$qid's probed lists")
    }
    // ADC parity: same codes + codebook as ann_pq, so for every (q, nbr)
    // pair both operators return, the reconstruction-cosine estimates
    // must be bit-identical — IVF only RESTRICTS the candidate set
    val pq = Ann.pqTopK(many).collect().map(r =>
      ((r.getAs[Long]("q_id"), r.getAs[Long]("nbr_id")), r.getAs[Double]("asim"))).toMap
    val common = rows.flatMap { case (qid, nbr, _, a) =>
      pq.get((qid, nbr)).map(b => (qid, nbr, a, b)) }
    assert(common.nonEmpty, "expected overlap between IVFADC and flat-PQ top-k")
    common.foreach { case (qid, nbr, a, b) =>
      assert(a == b, s"ADC estimate diverged for ($qid,$nbr): $a vs $b") }
  }

  test("r12 residual IVFADC: same structural contract, reconstruction closer than raw codes") {
    val many = (0L until 200L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 31 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nbr_id"))).toSet
    val res = Ann.ivfpqResTopK(many)
    val rows = res.collect().map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("nbr_id"), r.getAs[Long]("rnk")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
      assert(rs.forall(_._2 != q))
    }
    // the accuracy claim, measured: residual codes reconstruct each
    // vector at LOWER mean L2 error than raw-vector codes (PQ spends
    // its bytes on the in-cell displacement) — deterministic on this
    // fixed collection, so a pinned strict inequality, not a flake
    import org.apache.spark.sql.functions._
    val cent = Ann.trainedCentroids(many, 1, Ann.ivfCentroids)
    val lists = Ann.ivfAssign2(many, "vec_id", cent, Ann.ivfCentroids, 1)
    val centSlim = cent.select(col("cid"), col("c_emb"))
    val resFrame = lists.join(broadcast(centSlim), "cid")
      .select(col("vec_id"), col("cid"),
        zip_with(col("embedding"), col("c_emb"),
          (x, y) => x.cast("double") - y.cast("double")).as("embedding"))
    def reconOf(codesCb: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)) =
      codesCb._1.select(col("vec_id"), posexplode(col("codes")).as(Seq("m", "cid")))
        .join(broadcast(codesCb._2), Seq("m", "cid"))
        .groupBy(col("vec_id"))
        .agg(array_sort(collect_list(struct(col("m"), col("cid"), col("c_emb")))).as("p"))
        .select(col("vec_id"), flatten(transform(col("p"), x => x.getField("c_emb"))).as("r"))
    val rawErr = reconOf(Ann.pqCompress(many)).join(many, "vec_id")
      .select(avg(expr(
        "aggregate(zip_with(embedding, r, (x, y) -> (CAST(x AS double) - y) * (CAST(x AS double) - y)), 0D, (acc, v) -> acc + v)")))
      .head().getDouble(0)
    val resErr = reconOf(Ann.pqCompress(resFrame.select(col("vec_id"), col("embedding"))))
      .join(resFrame.select(col("vec_id"), col("embedding")), "vec_id")
      .select(avg(expr(
        "aggregate(zip_with(embedding, r, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v)")))
      .head().getDouble(0)
    assert(resErr < rawErr,
      s"residual PQ must reconstruct tighter: res $resErr vs raw $rawErr")
  }
}
