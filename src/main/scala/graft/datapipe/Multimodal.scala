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

/** Resized (stub) asset: target geometry plus a content checksum. */
case class MmResized(
    doc_id: Long,
    out_w: Long,
    out_h: Long,
    out_bytes: Long,
    checksum: String)

/** One sampled frame (stub): index and a frame-content hash. */
case class MmFrame(doc_id: Long, frame_idx: Long, frame_hash: Long)

/** Extracted (stub) feature vector for one asset. */
case class MmFeature(doc_id: Long, feature: Array[Double])

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

  private def md5Hex(md: MessageDigest, bytes: Array[Byte]): String = {
    md.reset()
    md.digest(bytes).map(b => f"$b%02x").mkString
  }

  private def h60OfHex(hex: String): Long =
    java.lang.Long.parseLong(hex.substring(0, 15), 16)

  /**
   * STUB resize to `w` x `h`: fake output size w*h*3 and a checksum
   * derived from (content md5, geometry) — replace the checksum line
   * with a real scaler in production. Same partition-mapped batch shape
   * as [[decode]].
   */
  def resize(bin: DataFrame, w: Int, h: Int): Dataset[MmResized] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("img")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val src = md5Hex(md, bytes)
          val checksum = md5Hex(md, s"$src:${w}x$h".getBytes("UTF-8"))
          MmResized(id, w.toLong, h.toLong, w.toLong * h * 3, checksum)
        }
      }
  }

  /**
   * STUB frame sampling: `n` evenly-spaced "frames", each hashed from
   * (content md5, frame index) — a real codec would seek and decode.
   * One input row fans out to n typed rows, the Spark-side shape a video
   * pipeline needs (row explosion inside the partition, no shuffle).
   */
  def frameSample(bin: DataFrame, n: Int): Dataset[MmFrame] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("img")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          val src = md5Hex(md, bytes)
          (0 until n).iterator.map { i =>
            MmFrame(id, i.toLong, h60OfHex(md5Hex(md, s"$src#$i".getBytes("UTF-8"))))
          }
        }
      }
  }

  /** Fake feature dimensionality of the [[features]] stub. */
  val featureDim = 8

  /**
   * STUB feature extraction: an 8-dim deterministic pseudo-embedding from
   * the content hash — production swaps in a vision encoder. Output is
   * ready for [[Ann]] (array column + id).
   */
  def features(bin: DataFrame): Dataset[MmFeature] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("img")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val src = md5Hex(md, bytes)
          val f = Array.tabulate(featureDim) { d =>
            val h = h60OfHex(md5Hex(md, s"$src/$d".getBytes("UTF-8")))
            ((h % 2001L) - 1000L) / 1000.0
          }
          MmFeature(id, f)
        }
      }
  }

  /** The documents table viewed as a binary asset table (utf-8 bytes). */
  def documentsAsBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("img"))

  /** Pipeline composition: stub feature-extract over the binary column
    * feeding exact ANN over the derived embeddings — decode → embed →
    * search end-to-end. The stub is md5-derived, so the WHOLE pipeline
    * is oracle-checkable; a real vision encoder swaps into [[features]]
    * with the Spark-side shape (typed mapPartitions → broadcast
    * brute-force / bucketed ANN) unchanged. */
  def annOverFeatures(docs: DataFrame): DataFrame =
    Ann.bruteForceTopK(
      features(documentsAsBinary(docs)).toDF()
        .select(col("doc_id").as("vec_id"), col("feature").as("embedding")))

  /** DuckDB rendering of [[features]] + brute-force cosine top-k (the
    * md5-derived stub reproduces exactly in SQL). */
  val annOverFeaturesSql: String = {
    val dims = (0 until featureDim).map { d =>
      s"(((('0x' || substr(md5(md5(text) || '/$d'), 1, 15))::BIGINT % 2001) - 1000) / 1000.0)"
    }.mkString("[", ", ", "]")
    val cos = Ann.cosineSql("q.embedding", "e.embedding")
    s"""WITH f AS (SELECT doc_id AS vec_id, $dims AS embedding FROM documents),
       |q AS (SELECT vec_id, embedding FROM f WHERE vec_id % ${Ann.queryMod} = 0)
       |SELECT q.vec_id AS q_id, e.vec_id AS nbr_id,
       |       CAST(row_number() OVER (PARTITION BY q.vec_id
       |                               ORDER BY $cos DESC, e.vec_id) AS BIGINT) AS rnk,
       |       round($cos, 6) AS sim
       |FROM q JOIN f e ON e.vec_id <> q.vec_id
       |QUALIFY rnk <= ${Ann.topK}""".stripMargin
  }

  /** Multimodal SemDeDup composition: decode → stub-embed → IVF-cluster →
    * within-cluster cosine decisions ([[Ann.semanticDedup]]) — near-dup
    * asset removal end-to-end over a binary column. The stub features are
    * md5-derived so the whole pipeline stays oracle-checkable; a real
    * vision encoder swaps into [[features]] with the decision dataflow
    * unchanged. */
  def semanticDedupOverFeatures(docs: DataFrame): DataFrame =
    Ann.semanticDedup(
      features(documentsAsBinary(docs)).toDF()
        .select(col("doc_id").as("vec_id"), col("feature").as("embedding")))

  /** DuckDB rendering of [[semanticDedupOverFeatures]]: the stub feature
    * subquery swaps in as the IVF vector relation. */
  val semanticDedupOverFeaturesSql: String = {
    val dims = (0 until featureDim).map { d =>
      s"(((('0x' || substr(md5(md5(text) || '/$d'), 1, 15))::BIGINT % 2001) - 1000) / 1000.0)"
    }.mkString("[", ", ", "]")
    Ann.semanticDedupSql(1,
      s"(SELECT doc_id AS vec_id, $dims AS embedding FROM documents)")
  }

  def decodeDocuments(docs: DataFrame): DataFrame = decode(documentsAsBinary(docs)).toDF()

  def resizeDocuments(docs: DataFrame): DataFrame =
    resize(documentsAsBinary(docs), 64, 64).toDF()

  def frameSampleDocuments(docs: DataFrame): DataFrame =
    frameSample(documentsAsBinary(docs), 4).toDF()

  val resizeDocumentsSql: String =
    """SELECT doc_id, 64 AS out_w, 64 AS out_h, CAST(64*64*3 AS BIGINT) AS out_bytes,
      |       md5(concat(md5(text), ':', '64x64')) AS checksum
      |FROM documents""".stripMargin

  val frameSampleDocumentsSql: String =
    s"""SELECT doc_id, f.range AS frame_idx,
       |       ('0x' || substr(md5(concat(md5(text), '#', f.range)), 1, 15))::BIGINT AS frame_hash
       |FROM documents, range(0, 4) f""".stripMargin

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
