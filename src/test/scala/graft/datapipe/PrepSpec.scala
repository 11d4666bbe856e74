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

  test("r12 fuzzy prep: keeps a subset of exact prep; equals the componentwise fuzzy stage") {
    val exact = Prep.keptCorpus(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    graft.CacheRegistry.unpersistAll()
    val fuzzy = Prep.keptCorpus(docs, fuzzyDecontam = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    graft.CacheRegistry.unpersistAll()
    // the fuzzy stage only REMOVES: every fuzzy survivor survives exact
    // prep... but dedup keeper CHOICE can shift when a lower-id keeper
    // was fuzzy-dropped, so compare the pre-dedup decision instead:
    // componentwise — exact-clean docs minus the flagFuzzy flags, then
    // the same keeper rank-prune
    val staged = docs // probes come from ALL docs in keptCorpus
    val exactCleanIds = {
      // exact keptCorpus without its final dedup = gated minus exact flags;
      // reconstruct componentwise as the first spec test does
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
      gated.join(broadcast(flagged), Seq("doc_id"), "left_anti")
    }
    val fzFlags = Decontam.flagFuzzy(exactCleanIds,
        Decontam.probes(staged), probesShareCorpusIds = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val wantFuzzy = graft.topk.RankJoin.prunePerKey(
        exactCleanIds.where(!col("doc_id").isin(fzFlags.toSeq: _*))
          .withColumn("h", md5(Dedup.normText)),
        Seq("h"), Seq(col("doc_id").asc), 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fuzzy == wantFuzzy, s"componentwise mismatch: ${fuzzy diff wantFuzzy} / ${wantFuzzy diff fuzzy}")
    // and the stage is real on this corpus OR a no-op — either way the
    // composed pipeline equals the componentwise one; when flags exist,
    // fuzzy survivors shrink
    if (fzFlags.nonEmpty) assert(fuzzy != exact || fuzzy.size < exact.size)
  }

  test("r13 pipe_build equals the componentwise pack+chunk over the kept corpus") {
    val all = docs
    val got = Prep.build(all).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    graft.CacheRegistry.unpersistAll()
    val keptDocs = all.join(Prep.keptCorpus(all).select("doc_id"), Seq("doc_id"), "left_semi")
    val packed = TextOps.packShards(keptDocs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val chunkCounts = TextOps.chunk(keptDocs).groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = packed.groupBy(p => (p._2, p._4)).map { case (k, rows) =>
      k -> ((rows.length.toLong, rows.map(_._3).sum,
        rows.map(r => chunkCounts(r._1)).sum))
    }
    assert(got == want && got.nonEmpty,
      s"componentwise mismatch: ${got.size} vs ${want.size} groups")
    // sanity: every doc yields at least one chunk, so chunks >= docs
    got.values.foreach { case (nd, _, nc) => assert(nc >= nd) }
  }

  test("r13 fuzzy-only witness: the fuzzy stage drops doc 1, which the exact stage passed") {
    // the vacuous-oracle fix for the ENTRY: on the plantFuzzyOnly corpus
    // (the frozen witness pair — doc 0 = probe text, doc 1 = its 4-word
    // blocks reversed), exact containment must PASS doc 1 (the pair
    // provably shares no 5-gram) and the fuzzy stage must DROP it (band
    // 1 of the committed minhash constants collides on the pair)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val planted = Decontam.plantFuzzyOnly(docs)
    // exact stage alone must pass the witness copy through
    val exactFlags = Decontam.flagDocuments(planted)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!exactFlags.contains(1L),
      "exact containment must miss the block-reversed witness")
    graft.CacheRegistry.unpersistAll()
    val without = Prep.keptCorpus(planted).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    graft.CacheRegistry.unpersistAll()
    val withFz = Prep.keptCorpus(planted, fuzzyDecontam = true).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val dropped = without diff withFz
    assert(dropped.contains(1L),
      s"the fuzzy stage must drop the witness copy; dropped = $dropped")
    assert(withFz.subsetOf(without))
  }
}
