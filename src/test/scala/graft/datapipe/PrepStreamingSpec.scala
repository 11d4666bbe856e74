package graft.datapipe

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The prep front-end (gates + decontam + exact dedup) on an ingest
  * stream: stateless projections + literal probe grams + watermarked
  * dedup state. */
class PrepStreamingSpec extends SparkSpecBase {
  import spark.implicits._

  // passes every gate: en stopwords, 13 tokens, distinct-heavy
  private val good =
    "the quick brown fox jumps over a lazy dog near the river bank"
  // shares the 5-gram "alpha beta gamma delta epsilon" with the probe
  private val contaminated =
    "the alpha beta gamma delta epsilon device and a wonder of modern design"
  private val tooShort = "the tiny short doc here"

  test("streamed prep gates, decontaminates, and dedups across batches") {
    implicit val ctx = spark.sqlContext
    val probes = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("probe_id", "text")
    val input = MemoryStream[StreamDoc]
    val q = Prep.prepareStream(input.toDF(), probes)
      .writeStream.format("memory").queryName("prep_stream")
      .outputMode("append").start()
    try {
      input.addData(
        StreamDoc(1L, good, new Timestamp(1000)),
        StreamDoc(2L, tooShort, new Timestamp(2000)),      // gate: too short
        StreamDoc(3L, contaminated, new Timestamp(3000)))  // decontam
      q.processAllAvailable()
      input.addData(
        StreamDoc(4L, good, new Timestamp(4000)),          // dup of 1
        StreamDoc(5L, good + " again today", new Timestamp(5000)))
      q.processAllAvailable()
      val ids = spark.table("prep_stream").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 5L))
    } finally q.stop()
  }

  test("streamed decisions agree with the batch front-end on the same docs") {
    implicit val ctx = spark.sqlContext
    val docs = Seq(
      (1L, good), (2L, tooShort), (3L, contaminated),
      (5L, good + " again today"))
    val probes = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("probe_id", "text")

    // batch: gates + decontam (no dedup — inputs are distinct)
    import org.apache.spark.sql.functions._
    val batch = {
      val scored = TextOps.langId(
        TextOps.quality(docs.toDF("doc_id", "text"), carry = Seq("text")),
        carry = Seq("n_tokens", "score", "text"))
      val gated = TextOps.repetitionOver(scored).where(
          col("pred_lang") === TextOps.cleanLang &&
          col("score") >= TextOps.cleanMinScore &&
          col("n_tokens").between(TextOps.cleanMinTok, TextOps.cleanMaxTok) &&
          !col("repetitious"))
      val flagged = Decontam.flag(gated, Decontam.probeIndex(probes))
      gated.join(flagged.select("doc_id"), Seq("doc_id"), "left_anti")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }

    val input = MemoryStream[StreamDoc]
    val q = Prep.prepareStream(input.toDF(), probes)
      .writeStream.format("memory").queryName("prep_stream_agree")
      .outputMode("append").start()
    try {
      input.addData(docs.map { case (i, t) => StreamDoc(i, t, new Timestamp(i * 1000)) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("prep_stream_agree").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(streamed == batch && batch == Set(1L, 5L))
    } finally q.stop()
  }
}
