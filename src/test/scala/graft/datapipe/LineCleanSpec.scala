package graft.datapipe

import graft.SparkSpecBase
import org.apache.spark.sql.Row

/** C4-style line-level cleaning (TextOps.lineClean): every rule on a
  * hand-checkable corpus, the planted wrap, and the window-free plan. */
class LineCleanSpec extends SparkSpecBase {

  import spark.implicits._

  test("short-line, blacklist, within-doc dedup, and doc-gate rules fire exactly") {
    val docs = Seq(
      // line 1 survives; "x dup y z q" blacklisted; line 3 duplicates
      // line 1 (keep-first); "too short" < 4 words; last line survives
      (1L, "a b c d e\nx dup y z q\na b c d e\ntoo short\np q r s"),
      // only ONE surviving line -> the document itself is dropped
      (2L, "a b c d e\nslow spam spam spam spam\nno"),
      // empty text: one empty line, nothing survives
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextOps.lineClean(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L) == Row(1L, 5L, 2L, true, "a b c d e\np q r s"))
    assert(out(2L) == Row(2L, 3L, 1L, false, null))
    assert(out(3L) == Row(3L, 1L, 0L, false, null))
  }

  test("within-doc dedup keeps the FIRST occurrence's position in the reassembly") {
    val docs = Seq((1L, "z z z z z\na a a a a\nz z z z z\nb b b b b"))
      .toDF("doc_id", "text")
    val out = TextOps.lineClean(docs).collect().head
    // kept lines re-join in original order: z(0), a(1), b(3)
    assert(out.getString(4) == "z z z z z\na a a a a\nb b b b b")
    assert(out.getLong(1) == 4L && out.getLong(2) == 3L)
  }

  test("plantLines wraps at 3 + doc_id % 7 words, pure projection") {
    val docs = Seq((0L, "w1 w2 w3 w4 w5 w6 w7"), (4L, "w1 w2 w3 w4 w5 w6 w7 w8"))
      .toDF("doc_id", "text")
    val planted = TextOps.plantLines(docs)
    val byId = planted.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(0L) == "w1 w2 w3\nw4 w5 w6\nw7")       // width 3
    assert(byId(4L) == "w1 w2 w3 w4 w5 w6 w7\nw8")     // width 7
    // the wrap must not explode or shuffle: no Exchange in its plan
    val plan = planted.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange") && !plan.contains("Generate"), plan)
  }

  test("corpus run: doc gate is live on both sides and the plan has no window") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val out = TextOps.lineClean(TextOps.plantLines(docs))
    val kept = out.where("doc_kept").count()
    val dropped = out.where("NOT doc_kept").count()
    assert(kept > 0 && dropped > 0, s"gate not live: kept=$kept dropped=$dropped")
    assert(out.count() == docs.count()) // one row per document, always
    // dropped docs carry NULL text, kept docs non-null
    assert(out.where("doc_kept AND text_clean IS NULL").count() == 0)
    assert(out.where("NOT doc_kept AND text_clean IS NOT NULL").count() == 0)
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Window"), plan)
  }
}
