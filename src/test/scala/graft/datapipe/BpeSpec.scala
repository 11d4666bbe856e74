package graft.datapipe

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Frozen-tokenizer BPE (r14): trainer provenance, apply-equality
  * against the direct iterative tokenizer, and the BPE-keyed packing. */
class BpeSpec extends SparkSpecBase {

  private def docs = graft.sources.Tables.documents(spark, sfDir)

  /** Reference tokenizer: the direct iterative Sennrich apply — for each
    * merge in rank order, repeatedly merge the LEFTMOST occurrence of
    * that pair until none remains. Deliberately structured differently
    * from both the production replacement chain and the trainer's merge
    * scan. */
  private def refTokens(word: String, merges: Seq[(String, String)]): Int = {
    if (word.isEmpty) return 0
    var t = word.map(_.toString).toVector
    for ((a, b) <- merges) {
      var i = 0
      while (i < t.length - 1) {
        if (t(i) == a && t(i + 1) == b) t = (t.take(i) :+ (a + b)) ++ t.drop(i + 2)
        else i += 1
      }
    }
    t.length
  }

  test("the frozen merge table IS bpeTrain's output on the curated slice") {
    import spark.implicits._
    val slice = docs.where(col("doc_id") % 20 === 0)
      .select(col("text")).orderBy(col("text")).as[String].collect().toSeq
    val trained = TextOps.bpeTrain(slice, TextOps.bpeMerges.size)
    assert(trained === TextOps.bpeMerges)
  }

  test("replacement-chain counts equal the direct iterative tokenizer on the corpus") {
    import spark.implicits._
    val got = TextOps.bpeCounts(docs).as[(Long, Long)].collect().toMap
    val want = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.split(" ").map(w => refTokens(w, TextOps.bpeMerges).toLong).sum
      }.toMap
    assert(got.size === want.size)
    val bad = want.collect { case (id, n) if got(id) != n => (id, n, got(id)) }
    assert(bad.isEmpty, s"count divergence on ${bad.take(3)}")
  }

  test("consecutive same-pair occurrences merge in one pass (the wrap contract)") {
    import spark.implicits._
    // 'erererer' under merge (e,r): four 'er' tokens — the both-side
    // wrapping must catch EVERY adjacent occurrence in one replacement
    // pass, and never merge across token-interior boundaries
    val t = Seq((0L, "erererer xerx value")).toDF("doc_id", "text")
    val n = TextOps.bpeCounts(t).head().getLong(1)
    val want = ("erererer xerx value").split(" ")
      .map(w => refTokens(w, TextOps.bpeMerges).toLong).sum
    assert(n === want)
  }

  test("BPE-keyed packing: budgets respected under the exact counts") {
    val packed = TextOps.packShards(docs, realBpe = true)
    val perShard = packed.groupBy("lang", "shard_id")
      .agg(sum("n_bpe").as("toks")).collect()
    // every shard except possibly each lang's LAST stays within budget
    // + one doc overshoot (a doc never splits)
    val maxDoc = packed.agg(max("n_bpe")).head().getLong(0)
    assert(perShard.forall(_.getLong(2) <= TextOps.shardBudget + maxDoc))
    // and the counts are the tokenizer's, not the heuristic's
    val heur = TextOps.packShards(docs)
    assert(packed.agg(sum("n_bpe")).head().getLong(0) !==
      heur.agg(sum("n_bpe")).head().getLong(0))
  }
}
