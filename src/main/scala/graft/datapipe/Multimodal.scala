package graft.datapipe

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded (stub) metadata for one multimodal asset. */
case class MmMeta(
    doc_id: Long,
    n_bytes: Long,
    width: Long,
    height: Long,
    channels: Long,
    mean_byte: Long)

/**
 * Multimodal binary-column plumbing: treat media as opaque `binary`
 * columns, decode in a partition-mapped batch operator.
 *
 * The decode itself is a clearly-marked deterministic STUB (no image
 * codecs in this container): it derives fake width/height/channels/mean
 * from the md5 of the bytes. Everything around it is the real 100 TB
 * shape: a typed `Dataset[T]` with case-class encoder, `mapPartitions`
 * batching so per-partition decoder state (here the MessageDigest, in
 * production a codec context) is allocated once per partition and reused
 * per record, and a narrow (doc_id, bytes) projection into the operator.
 *
 * Because the stub is md5-derived it is reproducible in SQL, so the
 * oracle is exact rather than rows-only.
 */
object Multimodal {

  /** STUB decode: fake metadata derived from md5 — replace with a real
    * codec (e.g. javax.imageio / ffmpeg bindings) in production. */
  private def decodeStub(md: MessageDigest, id: Long, bytes: Array[Byte]): MmMeta = {
    md.reset()
    val hex = md.digest(bytes).take(8).map(b => f"$b%02x").mkString // 16 hex chars
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16) // 60 bits, non-negative
    MmMeta(
      doc_id = id,
      n_bytes = bytes.length.toLong,
      width = 64L + h % 192L,
      height = 64L + (h / 192L) % 192L,
      channels = 1L + (h / 36864L) % 3L,
      mean_byte = (h / 110592L) % 256L)
  }

  /**
   * Decode a binary column to typed metadata. Input must have
   * (doc_id: long, img: binary); output is one MmMeta row per asset.
   */
  def decode(bin: DataFrame): Dataset[MmMeta] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("img"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one decoder context per partition, reused across the batch
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) => decodeStub(md, id, bytes) }
      }
  }

  /** The documents table viewed as a binary asset table (utf-8 bytes). */
  def documentsAsBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("img"))

  def decodeDocuments(docs: DataFrame): DataFrame = decode(documentsAsBinary(docs)).toDF()

  val decodeDocumentsSql: String = {
    val h = "(('0x' || substr(md5(text), 1, 15))::BIGINT)"
    s"""SELECT doc_id,
       |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |       64 + $h % 192 AS width,
       |       64 + ($h // 192) % 192 AS height,
       |       1 + ($h // 36864) % 3 AS channels,
       |       ($h // 110592) % 256 AS mean_byte
       |FROM documents""".stripMargin
  }
}
