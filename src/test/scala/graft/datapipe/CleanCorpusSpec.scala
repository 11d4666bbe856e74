package graft.datapipe

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The composed cleaning pass: gates fuse into ONE scan of documents,
  * filters run before the dedup shuffle, and the output equals the
  * componentwise computation. */
class CleanCorpusSpec extends SparkSpecBase {

  test("cleanCorpus equals the componentwise gates + dedup") {
    val docs = Tables.documents(spark, sfDir)
    val got = TextOps.cleanCorpus(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // componentwise: score, langid, gates, then exact dedup on survivors
    val q = TextOps.quality(docs)
    val l = TextOps.langId(docs).select(col("doc_id"), col("pred_lang"))
    val kept = q.join(l, "doc_id")
      .where(col("pred_lang") === TextOps.cleanLang &&
        col("score") >= TextOps.cleanMinScore &&
        col("n_tokens").between(TextOps.cleanMinTok, TextOps.cleanMaxTok))
      .select(col("doc_id"))
    val want = docs.join(kept, "doc_id")
      .select(col("doc_id"), md5(Dedup.normText).as("h"))
      .groupBy("h").agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("the fused pass scans documents exactly once") {
    val df = TextOps.cleanCorpus(Tables.documents(spark, sfDir))
    val plan = df.queryExecution.executedPlan.toString()
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected one documents scan, got $scans:\n${plan.take(1500)}")
  }
}
