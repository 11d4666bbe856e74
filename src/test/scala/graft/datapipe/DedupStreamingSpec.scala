package graft.datapipe

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** A timestamped document arriving on a stream. */
case class StreamDoc(doc_id: Long, text: String, ts: Timestamp)

class DedupStreamingSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming exact dedup keeps the first occurrence across batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = Dedup.exactStreaming(input.toDF())
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      input.addData(
        StreamDoc(1L, "the quick brown fox", new Timestamp(1000)),
        StreamDoc(2L, "  THE QUICK  BROWN FOX ", new Timestamp(2000)), // dup of 1
        StreamDoc(3L, "something else entirely", new Timestamp(3000)))
      q.processAllAvailable()
      input.addData(
        StreamDoc(4L, "the quick brown fox", new Timestamp(4000)), // dup again
        StreamDoc(5L, "a genuinely new document", new Timestamp(5000)))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L, 5L)) // first occurrences only, across batches
    } finally q.stop()
  }

  test("dedup state is evicted past the watermark horizon") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = Dedup.exactStreaming(input.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_evict").outputMode("append").start()
    try {
      val hour = 3600L * 1000
      input.addData(StreamDoc(1L, "old news", new Timestamp(hour)))
      q.processAllAvailable()
      // the watermark jumps far past doc 1's horizon -> its hash is evicted
      input.addData(StreamDoc(2L, "much later", new Timestamp(10 * hour)))
      q.processAllAvailable()
      // same text again, long after the horizon: must be RE-emitted —
      // proof the state store dropped it (plain dropDuplicates would
      // suppress it forever on ever-growing state)
      input.addData(StreamDoc(3L, "old news", new Timestamp(10 * hour + 1000)))
      q.processAllAvailable()
      val ids = spark.table("dedup_evict").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 3L))
    } finally q.stop()
  }
}
