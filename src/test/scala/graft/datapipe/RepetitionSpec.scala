package graft.datapipe

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Gopher-style repetition gate: duplicate n-gram fractions, array-native. */
class RepetitionSpec extends SparkSpecBase {

  test("hand-computed fractions on planted docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),        // bigrams: ab ba ab ba ab -> 5 total, 2 distinct
      (2L, "a b c d e"),          // all distinct
      (3L, "x"),                  // no bigrams at all
      (4L, "w w w w")             // maximal repetition
    ).toDF("doc_id", "text")
    val r = TextOps.repetition(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getBoolean(5)))).toMap
    assert(r(1L)._1 == 5 && math.abs(r(1L)._2 - 0.6) < 1e-6 && r(1L)._3)
    assert(r(2L)._2 == 0.0 && !r(2L)._3)
    assert(r(3L)._1 == 0 && r(3L)._2 == 0.0 && !r(3L)._3)
    assert(r(4L)._1 == 3 && math.abs(r(4L)._2 - (1.0 - 1.0 / 3)) < 1e-6 && r(4L)._3)
  }

  test("zero-shuffle: the corpus plan has no KEYED exchange") {
    // the operator itself must add no shuffle; the loader's gated
    // round-robin scan fanout (Tables.documents, r17-opt — fires only
    // when the scan's split count is below the session parallelism,
    // never at cluster scale) is not the operator's doing and carries
    // no key. What this pin forbids is any hash-partitioned exchange.
    val plan = TextOps.repetition(Tables.documents(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"), s"unexpected keyed shuffle in:\n$plan")
  }

  test("corpus gate is deterministic and flags the planted boilerplate tail") {
    val r = TextOps.repetition(Tables.documents(spark, sfDir))
    val n = r.where(col("repetitious")).count()
    assert(n > 0 && n < r.count() / 10, s"gate flagged $n docs")
    assert(r.count() == Tables.documents(spark, sfDir).count())
  }
}
