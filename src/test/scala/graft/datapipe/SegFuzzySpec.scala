package graft.datapipe

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Segment-level FUZZY dedup (r14): MinHash banding at the 20-word
  * segment level, planted reflowed boilerplate, and the same
  * no-hot-reducer contract as exact segment dedup. */
class SegFuzzySpec extends SparkSpecBase {

  private def docs = graft.sources.Tables.documents(spark, sfDir)

  test("planted half-swapped boilerplate is dropped by fuzzy, missed by exact") {
    val planted = Dedup.plantSegmentNearDups(docs)
    val exact = TextOps.segmentDedup(planted)
      .select(col("doc_id"), col("n_kept").as("k_exact"))
    val fuzzy = Dedup.segmentDedupFuzzy(planted)
      .select(col("doc_id"), col("n_kept").as("k_fuzzy"))
    val both = exact.join(fuzzy, "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // fuzzy keeps a SUBSET of what exact keeps, for every document
    assert(both.values.forall { case (e, f) => f <= e })
    // the planted docs (doc_id % segPlantMod == 1, holding per-segment
    // half-swapped copies of doc_id-1) must lose segments to the fuzzy
    // stage that exact dedup kept: exact equality was destroyed by the
    // swap, shingle similarity was not
    val plantedIds = both.keySet.filter(id =>
      id % Dedup.segPlantMod == 1 && both.contains(id - 1))
    assert(plantedIds.nonEmpty)
    val caught = plantedIds.count { id => both(id)._2 < both(id)._1 }
    assert(caught > 0, s"no planted reflow caught among ${plantedIds.size}")
  }

  test("fuzzy-dropped segments really have an earlier similar twin (hand check)") {
    import spark.implicits._
    // two-doc corpus: doc 1 is doc 0's half-swapped segment — exact
    // keeps it (different string), fuzzy must drop it
    val a = (1 to 20).map(i => s"tokx$i").mkString(" ")
    val b = ((11 to 20) ++ (1 to 10)).map(i => s"tokx$i").mkString(" ")
    val two = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    val ex = TextOps.segmentDedup(two).where(col("doc_id") === 1).head()
    val fz = Dedup.segmentDedupFuzzy(two).where(col("doc_id") === 1).head()
    assert(ex.getLong(2) === 1L)   // exact: kept (distinct string)
    assert(fz.getLong(2) === 0L)   // fuzzy: dropped (reflow of doc 0)
    assert(fz.isNullAt(3))         // nothing survives -> NULL text
    // and a genuinely distinct doc survives both
    val c = (1 to 20).map(i => s"toky$i").mkString(" ")
    val three = Seq((0L, a), (1L, b), (2L, c)).toDF("doc_id", "text")
    val fz2 = Dedup.segmentDedupFuzzy(three).where(col("doc_id") === 2).head()
    assert(fz2.getLong(2) === 1L)
  }

  test("exact-duplicate segments never reach the fuzzy band join (distinct reps)") {
    import spark.implicits._
    // 50 identical docs: one distinct segment string -> ONE representative
    // row feeds the banding; the keep-first decision is unchanged
    val t = (1 to 20).map(i => s"tokz$i").mkString(" ")
    val many = (0L until 50L).map(i => (i, t)).toDF("doc_id", "text")
    val out = Dedup.segmentDedupFuzzy(many).collect()
    assert(out.length === 50)
    assert(out.count(_.getLong(2) == 1L) === 1)        // exactly one keeper
    assert(out.filter(_.getLong(2) == 1L).head.getLong(0) === 0L) // the first
  }

  test("short segments (below shingle width) are immune to the fuzzy stage") {
    import spark.implicits._
    val short = Seq((0L, "aa bb"), (1L, "bb aa")).toDF("doc_id", "text")
    val out = Dedup.segmentDedupFuzzy(short).collect()
    // 2-word segments have no 3-shingles: both distinct strings survive
    assert(out.forall(_.getLong(2) == 1L))
  }

  test("plant keeps schema and recomputes n_chars on planted rows") {
    val planted = Dedup.plantSegmentNearDups(docs)
    assert(planted.columns.sorted.toSeq === docs.columns.sorted.toSeq)
    val bad = planted
      .where(length(col("text")).cast("long") =!= col("n_chars")).count()
    assert(bad === 0L)
  }
}
