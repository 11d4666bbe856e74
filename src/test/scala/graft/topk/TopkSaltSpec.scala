package graft.topk

import graft.{SparkEntry, SparkSpecBase}
import org.apache.spark.sql.functions._

/**
 * The skew-safe two-level prune (RankJoin.prunePerKeySalted) — r13 fix for
 * the last single-reducer window class: `row_number() OVER (PARTITION BY
 * lang)` put the dominant language's whole row set on one reducer task at
 * corpus scale. The salted form must be RESULT-IDENTICAL under a total
 * order, and its plan must carry the salt through the first (full-frame)
 * window so only the ≤ salts·k survivors hit the per-key window.
 */
class TopkSaltSpec extends SparkSpecBase {

  test("salted prune equals one-window prune on a planted-skew frame") {
    import spark.implicits._
    // 'en' dominates 50:1 — the exact skew the salted form exists for;
    // ties in score across doc_ids exercise the total-order tie-break
    val rows = (0 until 2000).map(i => ("en", i.toLong, (i % 7).toDouble)) ++
      (0 until 40).map(i => ("de", (10000 + i).toLong, (i % 3).toDouble))
    val df = rows.toDF("lang", "doc_id", "score")
    val order = Seq(col("score").desc, col("doc_id").asc)
    for (k <- Seq(1, 3, 17)) {
      val one = RankJoin.prunePerKey(df, Seq("lang"), order, k)
        .select("lang", "doc_id", "score").collect().map(_.toSeq).toSet
      val two = RankJoin.prunePerKeySalted(df, Seq("lang"), order, k, col("doc_id"))
        .select("lang", "doc_id", "score").collect().map(_.toSeq).toSet
      assert(two == one, s"salted prune diverged at k=$k")
    }
  }

  test("salted prune equals one-window prune when a salt bucket is empty") {
    import spark.implicits._
    // fewer rows than salts: most buckets empty, survivors < salts*k
    val df = (0 until 5).map(i => ("en", i.toLong, i.toDouble)).toDF("lang", "doc_id", "score")
    val order = Seq(col("score").desc, col("doc_id").asc)
    val one = RankJoin.prunePerKey(df, Seq("lang"), order, 3).collect().map(_.toSeq).toSet
    val two = RankJoin.prunePerKeySalted(df, Seq("lang"), order, 3, col("doc_id"))
      .collect().map(_.toSeq).toSet
    assert(two == one)
  }

  test("pipe_topk: full-frame window is salted; only survivors hit the per-lang window") {
    val df = SparkEntry.queries("pipe_topk")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString()
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(winLines.size == 2, s"expected exactly two window passes:\n$p")
    val salted = winLines.filter(_.contains("__salt"))
    assert(salted.size == 1, s"exactly one window must partition by the salt:\n$p")
    // the corpus-mass window is the salted one: the lang-only window's
    // input is the level-1 output (bounded by salts*k per lang), which the
    // plan shows as the salted window feeding the unsalted one — assert the
    // unsalted window sits ABOVE (is printed before) the salted window
    val saltedIdx = winLines.indexWhere(_.contains("__salt"))
    val plainIdx = winLines.indexWhere(!_.contains("__salt"))
    assert(plainIdx < saltedIdx,
      s"per-lang window must consume the salted window's survivors:\n$p")
  }

  test("pipe_topk matches the one-window form on real data") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val scored = graft.datapipe.TextOps.quality(docs, carry = Seq("lang"))
    val order = Seq(col("score").desc, col("doc_id").asc)
    val one = RankJoin.prunePerKey(scored, Seq("lang"), order, 3)
      .select("lang", "doc_id", "score").collect().map(_.toSeq).toSet
    val two = SparkEntry.queries("pipe_topk")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(two == one && two.nonEmpty)
  }
}
