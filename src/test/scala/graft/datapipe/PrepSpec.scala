package graft.datapipe

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** End-to-end corpus prep: gates → decontam → dedup → mix, composed. */
class PrepSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)

  test("keptCorpus equals the componentwise composition") {
    val got = Prep.keptCorpus(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // componentwise: each operator applied separately, joined by doc_id
    val q = TextOps.quality(docs)
    val l = TextOps.langId(docs).select(col("doc_id"), col("pred_lang"))
    val r = TextOps.repetition(docs)
      .select(col("doc_id"), col("dup2_frac"), col("dup3_frac"))
    val gatedIds = q.join(l, "doc_id").join(r, "doc_id")
      .where(col("pred_lang") === TextOps.cleanLang &&
        col("score") >= TextOps.cleanMinScore &&
        col("n_tokens").between(TextOps.cleanMinTok, TextOps.cleanMaxTok) &&
        col("dup2_frac") <= TextOps.repDupThreshold &&
        col("dup3_frac") <= TextOps.repDupThreshold)
      .select("doc_id")
    val gated = docs.join(gatedIds, "doc_id")
    val flagged = Decontam.flag(gated, Decontam.probeIndex(Decontam.probes(docs)))
      .select("doc_id")
    val clean = gated.join(flagged, Seq("doc_id"), "left_anti")
    val want = clean.withColumn("h", md5(Dedup.normText))
      .groupBy("h").agg(min("doc_id").as("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet

    assert(got == want && want.nonEmpty)
  }

  test("rounded dup fractions in text_repetition cannot disagree with the gate") {
    // the gate uses UNROUNDED fractions; the entry emits rounded ones.
    // round-to-6 can only flip a decision if the true fraction sits within
    // 5e-7 of the threshold; with n-gram counts < 1000 per doc the nearest
    // attainable fractions are ~1e-3 apart, so no corpus doc can disagree
    val rep = TextOps.repetition(docs)
    val viaRounded = rep.where(col("dup2_frac") <= TextOps.repDupThreshold &&
      col("dup3_frac") <= TextOps.repDupThreshold).count()
    val viaFlag = rep.where(!col("repetitious")).count()
    assert(viaRounded == viaFlag)
  }

  test("both prep joins broadcast; nothing sort-merges or goes cartesian") {
    val plan = Prep.prepare(docs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian in:\n$plan")
  }

  test("audit reconciles: copies bounded by survivors x ceil(max weight)") {
    val rows = Prep.prepare(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { x =>
      val w = x.getDouble(1); val surv = x.getLong(2); val copies = x.getLong(3)
      assert(copies >= surv * w.toInt && copies <= surv * (w.toInt + 1),
        s"${x.getString(0)}: w=$w survivors=$surv copies=$copies")
    }
  }
}
