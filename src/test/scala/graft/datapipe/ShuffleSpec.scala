package graft.datapipe

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Epoch-shuffle contracts: exact permutation, block-count invariance,
  * epoch decorrelation, worker balance, and the no-global-row-window
  * plan that makes the rank scale. */
class ShuffleSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val n = docs.count()

  test("epoch shuffle is an exact permutation of 0..n-1") {
    val pos = Shuffle.epochShuffle(docs).select("pos")
      .as[Long].collect().sorted
    assert(pos.toSeq == (0L until n).toSeq)
  }

  test("two-level rank is invariant to the block count (== sequential rank)") {
    val want = Shuffle.epochShuffle(docs, blocks = 1) // 1 block == naive global rank
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    for (b <- Seq(2, 7, 64, 1 << 16)) {
      val got = Shuffle.epochShuffle(docs, blocks = b)
        .select("doc_id", "pos").as[(Long, Long)].collect().toMap
      assert(got == want, s"blocks=$b")
    }
  }

  test("different epochs decorrelate the order; same epoch reproduces it") {
    val e1 = Shuffle.epochShuffle(docs, epoch = 1)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    val e1again = Shuffle.epochShuffle(docs, epoch = 1)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    val e2 = Shuffle.epochShuffle(docs, epoch = 2)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(e1 == e1again)
    assert(e1 != e2)
    // and the shuffle actually permutes: positions differ from doc_id order
    val sortedIds = docs.select("doc_id").as[Long].collect().sorted
    val idAtPos = e1.toSeq.sortBy(_._2).map(_._1)
    assert(idAtPos != sortedIds.toSeq)
  }

  test("worker deal is balanced to within one row") {
    val counts = Shuffle.epochShuffle(docs, workers = 8)
      .groupBy("worker").count().select("count").as[Long].collect()
    assert(counts.length == math.min(8L, n))
    assert(counts.max - counts.min <= 1)
  }

  test("a NULL doc_id still shuffles (permutation, never a filter)") {
    val withNull = docs.select(when(col("doc_id") === 3L, lit(null))
      .otherwise(col("doc_id")).as("doc_id"))
    val out = Shuffle.epochShuffle(withNull)
    assert(out.count() == n)
    assert(out.where(col("doc_id").isNull).count() == 1)
    // positions remain the exact permutation
    assert(out.select("pos").as[Long].collect().sorted.toSeq == (0L until n).toSeq)
  }

  test("plan: row-level rank is blocked; only the slim counts frame has a global window") {
    val plan = Shuffle.epochShuffle(docs).queryExecution.optimizedPlan.toString()
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    val rowLevel = winLines.filter(_.contains("row_number"))
    assert(rowLevel.nonEmpty && rowLevel.forall(l =>
      l.substring(l.indexOf("windowspecdefinition")).contains("__blk#")),
      s"row-level rank not blocked:\n${winLines.mkString("\n")}")
    val global = winLines.filterNot(_.contains("row_number"))
    assert(global.forall(_.contains("__n")),
      s"global window over a non-slim frame:\n${global.mkString("\n")}")
  }
}
