package graft.datapipe

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpecBase {

  test("HLL cardinality is within the rsd contract of the exact count") {
    val out = Sketches.tokenCardinality(Tables.documents(spark, sfDir)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val approx = r.getAs[Long]("approx_terms").toDouble
      val exact = r.getAs[Long]("exact_terms").toDouble
      // 5 sigma of the configured rsd — loose enough to never flake,
      // tight enough to catch a broken sketch
      assert(math.abs(approx - exact) <= 5 * Sketches.hllRsd * exact + 5,
        s"lang=${r.getAs[String]("lang")}: approx $approx vs exact $exact")
    }
  }

  test("approximate quantiles are ordered and within the value range") {
    val out = Sketches.valueQuantiles(Tables.events(spark, sfDir)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p50, p95, p99) = (r.getAs[Double]("p50"), r.getAs[Double]("p95"),
        r.getAs[Double]("p99"))
      val (lo, hi) = (r.getAs[Double]("v_min"), r.getAs[Double]("v_max"))
      assert(lo <= p50 && p50 <= p95 && p95 <= p99 && p99 <= hi)
    }
    // p95 must sit at the 95th percentile of the exact sorted values
    // (within the summary's rank tolerance)
    val views = Tables.events(spark, sfDir)
      .where(col("event_type") === "view").select("value")
      .collect().map(_.getDouble(0)).sorted
    val p95 = out.find(_.getAs[String]("event_type") == "view")
      .get.getAs[Double]("p95")
    val rank = views.count(_ <= p95).toDouble / views.length
    assert(math.abs(rank - 0.95) < 0.02, s"p95 sits at rank $rank")
  }

  test("heavy hitters: candidate+verify output equals the exact answer") {
    val docs = Tables.documents(spark, sfDir)
    val got = Sketches.heavyHitters(docs).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("cnt"))).toSet
    // exact reference: full groupBy count with the same threshold
    val toks = docs.select(explode(TextOps.words(col("text"))).as("term"))
      .where(length(col("term")) > 0)
    val n = toks.count()
    val want = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt").cast("double") >= lit(0.0005) * n.toDouble)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("cnt"))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("checked forms emit all-true accuracy flags (the driver-gate contract)") {
    val card = Sketches.tokenCardinalityChecked(Tables.documents(spark, sfDir)).collect()
    assert(card.nonEmpty && card.forall(_.getAs[Boolean]("hll_ok")))
    val qs = Sketches.valueQuantilesChecked(Tables.events(spark, sfDir)).collect()
    assert(qs.nonEmpty && qs.forall(r =>
      r.getAs[Boolean]("p50_ok") && r.getAs[Boolean]("p95_ok") &&
        r.getAs[Boolean]("p99_ok")))
  }

  test("sharded HLL sketches union to a within-contract estimate") {
    val docs = Tables.documents(spark, sfDir)
    val out = Sketches.shardedCardinalityChecked(docs).collect()
    assert(out.nonEmpty && out.forall(_.getAs[Boolean]("hll_union_ok")))
    // merge is shard-order-invariant: a different shard split gives the
    // same estimate only if the sketch is truly mergeable — compare the
    // 2-shard union against a 4-shard union of the same data
    import org.apache.spark.sql.functions._
    val terms4 = docs.select(col("lang"), (col("doc_id") % 4).as("shard"),
        explode(graft.datapipe.TextOps.words(col("text"))).as("term"))
      .where(length(col("term")) > 0)
    val merged4 = terms4.groupBy(col("lang"), col("shard"))
      .agg(hll_sketch_agg(col("term"), lit(Sketches.hllLgK)).as("sk"))
      .groupBy(col("lang"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e4"))
    val e2 = Sketches.shardedCardinality(docs)
      .select(col("lang"), col("approx_terms").as("e2"))
    val joined = e2.join(merged4, "lang").collect()
    assert(joined.nonEmpty && joined.forall(r =>
      r.getAs[Long]("e2") == r.getAs[Long]("e4")),
      joined.map(r => (r.getString(0), r.getAs[Long]("e2"), r.getAs[Long]("e4"))).mkString(","))
  }

  // ------------------------------------------------- count-min sketch

  import org.apache.spark.sql.functions._

  /** Pure-Scala replication of the CMS cell maths — sanity-pins the
    * sketch against its own definition (same pattern as BloomSpec). */
  private def cellsOf(key: String): Seq[(Int, Long)] = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseUnsignedLong(md5.take(15), 16) % Dedup.mhP
    (0 until Sketches.cmsDepth).map(r =>
      r -> ((Dedup.mhA(r) * h + Dedup.mhB(r)) % Dedup.mhP % Sketches.cmsWidth))
  }

  test("CMS never undercounts and is bounded by depth*width cells") {
    val docs = Tables.documents(spark, sfDir)
    val out = Sketches.cmsDomainCounts(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("over_est"),
        s"undercount at ${r.getAs[String]("domain")}")
    }
    val sketch = Sketches.cmsBuild(docs.select(Domains.domainOf.as("key")))
    assert(sketch.count() <= Sketches.cmsDepth.toLong * Sketches.cmsWidth)
  }

  test("CMS hand oracle: collision-free keys estimate exactly, cells match the Scala maths") {
    import spark.implicits._
    val occ = (Seq.fill(3)("alpha") ++ Seq.fill(5)("beta") ++ Seq("gamma"))
      .toDF("key")
    // verify the two key sets don't collide in EVERY row (they would
    // have to for the min to overcount)
    val byKey = Map("alpha" -> 3L, "beta" -> 5L, "gamma" -> 1L)
    val collisionFree = byKey.keys.forall { k =>
      cellsOf(k).exists { case (r, c) =>
        byKey.keys.filter(_ != k).forall(o => cellsOf(o)(r)._2 != c) }
    }
    assume(collisionFree) // holds for these literals under the committed constants
    val est = Sketches.cmsEstimate(occ, Sketches.cmsBuild(occ)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == byKey)
    // the Spark cell layout IS the Scala maths: rebuild the sketch by hand
    val handSketch = byKey.toSeq.flatMap { case (k, n) =>
      cellsOf(k).map { case (r, c) => (r, c, n) } }
      .groupBy(t => (t._1, t._2)).map { case ((r, c), xs) => (r, c, xs.map(_._3).sum) }
      .toSet
    val sparkSketch = Sketches.cmsBuild(occ).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(sparkSketch == handSketch)
  }

  test("CMS point query of a NEVER-SEEN key mins over its empty cells (r14 review pin)") {
    import spark.implicits._
    val built = Seq.fill(4)("alpha").toDF("key")
    val sketch = Sketches.cmsBuild(built)
    // probe keys absent from the build: the canonical estimator includes
    // the zero (un-materialized) cells — a key whose cells all miss must
    // report 0, and one sharing SOME cells must still report the min
    // INCLUDING its empty cells, not min over collisions only
    val probes = (1 to 20).map(i => s"unseen-$i").toDF("key")
    val est = Sketches.cmsEstimate(probes, sketch).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size == 20, "absent keys must not vanish from the output")
    val alphaCells = cellsOf("alpha").toSet
    est.foreach { case (k, e) =>
      val expected = if (cellsOf(k).forall(alphaCells.contains)) 4L else 0L
      assert(e == expected, s"$k: est $e, expected $expected")
    }
  }

  test("CMS merges by cell-wise addition: cms(A) + cms(B) == cms(A ∪ B)") {
    val docs = Tables.documents(spark, sfDir)
    val keyed = docs.select(Domains.domainOf.as("key"), col("doc_id"))
    val a = Sketches.cmsBuild(keyed.where(col("doc_id") % 2 === 0))
    val b = Sketches.cmsBuild(keyed.where(col("doc_id") % 2 =!= 0))
    val merged = a.union(b).groupBy(col("row"), col("cell"))
      .agg(sum(col("c")).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val full = Sketches.cmsBuild(keyed).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == full && full.nonEmpty)
  }
}
