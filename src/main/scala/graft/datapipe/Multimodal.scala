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

/** Codec-level decode result (doc_id and byte count are generic and
  * added by the operator, not the codec). */
case class MmDecoded(width: Long, height: Long, channels: Long, mean_byte: Long)

/**
 * Pluggable media codec — the seam between graft's Spark-side plumbing
 * (typed Dataset, mapPartitions batching, narrow projections) and
 * whatever decoder a deployment actually links. `open()` is invoked
 * ONCE PER PARTITION and the returned context reused across the batch:
 * decoder contexts (libjpeg handles, ffmpeg AVCodecContext, a
 * MessageDigest) are rarely thread-safe or serializable, so only the
 * factory crosses the closure boundary.
 */
trait MmCodec extends Serializable {
  def open(): MmCodecCtx
}

trait MmCodecCtx {
  /** Decode one asset to geometry + mean intensity. */
  def decode(bytes: Array[Byte]): MmDecoded
  /** Extract a `dim`-dimensional feature vector (values in [-1, 1]). */
  def features(bytes: Array[Byte], dim: Int): Array[Double]
}

/**
 * Deterministic md5-derived STUB codec — the default, because this
 * container ships no image corpora: it fabricates
 * width/height/channels/mean and a pseudo-embedding from the content
 * hash. Being md5-derived it reproduces exactly in SQL, so every mm_*
 * oracle entry stays a hash compare. Production swaps in a real codec
 * ([[ImageIoCodec]] below is a fully-working JDK-only example, spec'd
 * on synthetic PNGs) with the operator dataflow unchanged.
 */
object Md5StubCodec extends MmCodec {
  def open(): MmCodecCtx = new MmCodecCtx {
    private val md = MessageDigest.getInstance("MD5")
    private def hex(bytes: Array[Byte]): String = {
      md.reset(); md.digest(bytes).map(b => f"$b%02x").mkString
    }
    def decode(bytes: Array[Byte]): MmDecoded = {
      val h = java.lang.Long.parseLong(hex(bytes).substring(0, 15), 16) // 60 bits
      MmDecoded(
        width = 64L + h % 192L,
        height = 64L + (h / 192L) % 192L,
        channels = 1L + (h / 36864L) % 3L,
        mean_byte = (h / 110592L) % 256L)
    }
    def features(bytes: Array[Byte], dim: Int): Array[Double] = {
      val src = hex(bytes)
      Array.tabulate(dim) { d =>
        val h = java.lang.Long.parseLong(
          hex(s"$src/$d".getBytes("UTF-8")).substring(0, 15), 16)
        ((h % 2001L) - 1000L) / 1000.0
      }
    }
  }
}

/**
 * Real image codec over the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP —
 * public platform API, no extra dependency): geometry from the decoded
 * raster, mean intensity over all bands, and a feature vector of
 * per-vertical-strip mean intensities scaled to [-1, 1] (a classic
 * luminance-profile descriptor). Proves the codec seam with an actual
 * decoder; not the oracle default only because the test corpus is text.
 */
final class ImageIoCodec extends MmCodec {
  def open(): MmCodecCtx = new MmCodecCtx {
    private def read(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image bytes")
      img
    }
    def decode(bytes: Array[Byte]): MmDecoded = {
      val img = read(bytes)
      val r = img.getRaster
      val (w, h, ch) = (img.getWidth, img.getHeight, r.getNumBands)
      var sum = 0L; var n = 0L; var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < ch) { sum += r.getSample(x, y, b); n += 1; b += 1 }
          x += 1
        }
        y += 1
      }
      MmDecoded(w.toLong, h.toLong, ch.toLong, if (n == 0) 0L else sum / n)
    }
    def features(bytes: Array[Byte], dim: Int): Array[Double] = {
      val img = read(bytes)
      val r = img.getRaster
      val (w, h, ch) = (img.getWidth, img.getHeight, r.getNumBands)
      val sums = new Array[Long](dim)
      val counts = new Array[Long](dim)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val strip = math.min(dim - 1, x * dim / math.max(1, w))
          var b = 0
          while (b < ch) { sums(strip) += r.getSample(x, y, b); counts(strip) += 1; b += 1 }
          x += 1
        }
        y += 1
      }
      Array.tabulate(dim) { d =>
        if (counts(d) == 0) 0.0 else 2.0 * sums(d) / (255.0 * counts(d)) - 1.0
      }
    }
  }
}

/**
 * Multimodal binary-column plumbing: treat media as opaque `binary`
 * columns, decode in a partition-mapped batch operator.
 *
 * The default codec is a clearly-marked deterministic STUB (no image
 * corpora in this container) behind the pluggable [[MmCodec]] seam;
 * [[ImageIoCodec]] is a real JDK decoder proving the seam (spec'd on
 * synthetic PNGs). Everything around the codec is the real 100 TB
 * shape: a typed `Dataset[T]` with case-class encoder, `mapPartitions`
 * batching so per-partition decoder state is allocated once per
 * partition and reused per record, and a narrow (doc_id, bytes)
 * projection into the operator.
 *
 * Because the stub is md5-derived it is reproducible in SQL, so the
 * oracle is exact rather than rows-only.
 */
object Multimodal {

  /**
   * Decode a binary column to typed metadata. Input must have
   * (doc_id: long, img: binary); output is one MmMeta row per asset.
   */
  def decode(bin: DataFrame, codec: MmCodec = Md5StubCodec): Dataset[MmMeta] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("img"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one decoder context per partition, reused across the batch
        val ctx = codec.open()
        it.map { case (id, bytes) =>
          val d = ctx.decode(bytes)
          MmMeta(id, bytes.length.toLong, d.width, d.height, d.channels, d.mean_byte)
        }
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
   * Feature extraction through the [[MmCodec]] seam — default is the
   * deterministic 8-dim md5 pseudo-embedding (oracle-exact); a vision
   * encoder or [[ImageIoCodec]] swaps in with the dataflow unchanged.
   * Output is ready for [[Ann]] (array column + id).
   */
  def features(bin: DataFrame, codec: MmCodec = Md5StubCodec): Dataset[MmFeature] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("img")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val ctx = codec.open()
        it.map { case (id, bytes) => MmFeature(id, ctx.features(bytes, featureDim)) }
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
    // spread ahead of the per-row codec pass (r18 — measured 1.12→0.53 s
    // under the r17 loader fanout; mm_dedup stays UNSPREAD: its IVF
    // decision stage regressed 2.50→3.76 s under the same fanout — the
    // spread pays only where the codec pass dominates; see Tables.spread)
    annOverBinary(graft.sources.Tables.spread(documentsAsBinary(docs)),
      Md5StubCodec)

  /** The mm_ann dataflow over any (doc_id, img) binary table with any
    * codec — decode → embed → search, codec-agnostic by construction. */
  def annOverBinary(bin: DataFrame, codec: MmCodec): DataFrame =
    Ann.bruteForceTopK(
      features(bin, codec).toDF()
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

  /** The mm_dedup dataflow over any (doc_id, img) binary table with any
    * codec — decode → embed → IVF-cluster → within-cluster dedup
    * decisions, codec-agnostic by construction (r16: the non-stub
    * encoder runs this end-to-end in ImageIoCodecSpec). */
  def dedupOverBinary(bin: DataFrame, codec: MmCodec,
                      k: Int = Ann.ivfCentroids): DataFrame =
    Ann.semanticDedup(
      features(bin, codec).toDF()
        .select(col("doc_id").as("vec_id"), col("feature").as("embedding")),
      rounds = 1, k = k)

  /** Multimodal SemDeDup composition: decode → stub-embed → IVF-cluster →
    * within-cluster cosine decisions ([[Ann.semanticDedup]]) — near-dup
    * asset removal end-to-end over a binary column. The stub features are
    * md5-derived so the whole pipeline stays oracle-checkable; a real
    * vision encoder swaps into [[features]] with the decision dataflow
    * unchanged. */
  def semanticDedupOverFeatures(docs: DataFrame): DataFrame =
    dedupOverBinary(documentsAsBinary(docs), Md5StubCodec)

  /** DuckDB rendering of [[semanticDedupOverFeatures]]: the stub feature
    * subquery swaps in as the IVF vector relation. */
  val semanticDedupOverFeaturesSql: String = {
    val dims = (0 until featureDim).map { d =>
      s"(((('0x' || substr(md5(md5(text) || '/$d'), 1, 15))::BIGINT % 2001) - 1000) / 1000.0)"
    }.mkString("[", ", ", "]")
    Ann.semanticDedupSql(1,
      s"(SELECT doc_id AS vec_id, $dims AS embedding FROM documents)")
  }

  /** REAL area-mean luminance downsample (r16 — the deterministic
    * non-stub resize payload): each output cell is the integer mean of
    * all samples (all bands) in its source rectangle, one byte per cell
    * — no re-encode, so the payload is bit-deterministic across JVMs
    * (an ImageIO re-encode would tie the checksum to encoder
    * internals). */
  def downsampleLuma(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w >= 1 && h >= 1, s"positive target geometry, got ${w}x$h")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "undecodable image bytes")
    val r = img.getRaster
    val (sw, sh, ch) = (img.getWidth, img.getHeight, r.getNumBands)
    val out = new Array[Byte](w * h)
    var oy = 0
    while (oy < h) {
      val y0 = oy * sh / h; val y1 = math.max(y0 + 1, (oy + 1) * sh / h)
      var ox = 0
      while (ox < w) {
        val x0 = ox * sw / w; val x1 = math.max(x0 + 1, (ox + 1) * sw / w)
        var sum = 0L; var n = 0L
        var y = y0
        while (y < math.min(y1, sh)) {
          var x = x0
          while (x < math.min(x1, sw)) {
            var b = 0
            while (b < ch) { sum += r.getSample(x, y, b); n += 1; b += 1 }
            x += 1
          }
          y += 1
        }
        out(oy * w + ox) = (if (n == 0) 0 else (sum / n)).toByte
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** REAL resize over the JDK decoder ([[downsampleLuma]]): geometry,
    * true payload size (w·h luminance bytes) and the md5 of the actual
    * downsampled payload — the non-stub form of [[resize]] (which keeps
    * the md5 stub because the oracle corpus is text). Same
    * partition-mapped batch shape. */
  def resizeReal(bin: DataFrame, w: Int, h: Int): Dataset[MmResized] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("img")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val payload = downsampleLuma(bytes, w, h)
          MmResized(id, w.toLong, h.toLong, payload.length.toLong,
            md5Hex(md, payload))
        }
      }
  }

  // ------------------------------------------------ perceptual-hash dedup

  /** dHash grid geometry: 9 columns x 8 rows, so every one of the 64
    * signature bits has a horizontal neighbor to compare against
    * (the classic dHash recipe: Krawetz, "Kind of Like That", 2013 —
    * public algorithm; LAION/DataComp-style image pipelines dedup on
    * exactly this signature where byte-hash dedup misses re-encodes). */
  val phGridW = 9
  val phGridH = 8

  /** Banding for the hamming bucket join: 4 chunks of 16 bits over the
    * 64-bit signature — the SimHash pigeonhole ([[Dedup.simhashNearDup]]):
    * two signatures within hamming `chunks - 1` = 3 share at least one
    * unchanged chunk, so bucket recall at the default threshold is
    * EXACT (never all-pairs). */
  val phChunks = 4
  val phMaxHamming: Int = phChunks - 1

  /** Hot-bucket cap — same skew discipline as [[Dedup.shBucketCap]]:
    * a pathological constant-image bucket (e.g. solid-color thumbnails,
    * whose dHash is all-zero) is dropped before the self-join squares
    * it; the cap is mirrored in the oracle. */
  val phBucketCap = 200

  /** 64-bit dHash over a [[phGridW]]x[[phGridH]] luma grid: bit
    * (y,x) = 1 iff the right neighbor is strictly brighter. Gradient
    * comparisons survive re-encode noise that kills byte hashes —
    * unsigned byte compare, bit 63 rides the Long sign bit. */
  def dHash64(grid: Array[Byte]): Long = {
    require(grid.length == phGridW * phGridH,
      s"dHash expects a ${phGridW}x$phGridH grid, got ${grid.length} cells")
    var h = 0L
    var y = 0
    while (y < phGridH) {
      var x = 0
      while (x < phGridW - 1) {
        if ((grid(y * phGridW + x + 1) & 0xFF) > (grid(y * phGridW + x) & 0xFF))
          h |= (1L << (y * (phGridW - 1) + x))
        x += 1
      }
      y += 1
    }
    h
  }

  /** STUB luma grid for the text corpus (no image corpora in this
    * container): 72 deterministic bytes from five md5 digests of
    * (content-md5, k) — byte j of digest k is grid cell 16k+j, which is
    * exactly `('0x' || substr(md5(md5(text)||':'||k), 2j+1, 2))::INT`
    * in DuckDB, so the whole hash chain mirrors in SQL. The REAL grid
    * is [[downsampleLuma]] (bit-deterministic area means, r16) via
    * [[phashesReal]]; the decision dataflow downstream is identical. */
  private def stubLumaGrid(md: MessageDigest, bytes: Array[Byte]): Array[Byte] = {
    val src = md5Hex(md, bytes)
    val out = new Array[Byte](phGridW * phGridH)
    var k = 0
    var o = 0
    while (o < out.length) {
      md.reset()
      val dg = md.digest(s"$src:$k".getBytes("UTF-8"))
      val n = math.min(dg.length, out.length - o)
      System.arraycopy(dg, 0, out, o, n)
      o += n
      k += 1
    }
    out
  }

  /** (doc_id, phash) over the stub grid — the oracle-checkable form. */
  def phashes(bin: DataFrame): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("img")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) => (id, dHash64(stubLumaGrid(md, bytes))) }
      }.toDF("doc_id", "phash")
  }

  /** (doc_id, phash) through the REAL JDK decoder: [[downsampleLuma]]
    * area means -> [[dHash64]] — the production path, spec'd on a
    * planted PNG/JPEG re-encode twin that byte-hash dedup misses. */
  def phashesReal(bin: DataFrame): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("img")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          (id, dHash64(downsampleLuma(bytes, phGridW, phGridH)))
        }
      }.toDF("doc_id", "phash")
  }

  /** Near-dup pairs (d1 < d2, hamming ≤ `maxHamming`) over a
    * (doc_id, phash) frame: 16-bit-chunk buckets (exact recall for
    * maxHamming ≤ [[phChunks]]-1 by pigeonhole), capped hot buckets
    * (map-side-collapsed count + anti-join — no count window), then
    * bit_count(xor) verify. The same shape as the SimHash family; at
    * 100 TB the candidate set is bucketed, never all-pairs. */
  def phashPairs(sig: DataFrame, maxHamming: Int = phMaxHamming,
                 cap: Int = phBucketCap): DataFrame = {
    require(maxHamming <= phChunks - 1,
      s"$phChunks chunks guarantee recall only to hamming ${phChunks - 1}")
    val chunkStructs = (0 until phChunks).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("phash"), c * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
    }
    val ck = sig.select(col("doc_id"), explode(array(chunkStructs: _*)).as("ck"))
      .select(col("doc_id"), col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    val hot = ck.groupBy(col("chunk"), col("key"))
      .agg(count(lit(1)).as("__bsz")).where(col("__bsz") > cap)
      .select(col("chunk"), col("key"))
    val capped = ck.join(hot, Seq("chunk", "key"), "left_anti")
      .select(col("doc_id"), col("chunk"), col("key"))
    val cand = capped.toDF("d1", "chunk", "key")
      .join(capped.toDF("d2", "chunk", "key"), Seq("chunk", "key"))
      .where(col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
    cand
      .join(sig.toDF("d1", "p1"), "d1")
      .join(sig.toDF("d2", "p2"), "d2")
      .withColumn("hamming", expr("bit_count(p1 ^ p2)").cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("d1"), col("d2"), col("hamming"))
  }

  /** The dedup DECISION over any (doc_id, phash) frame: keep-first —
    * a doc is a dup iff some earlier doc is within [[phMaxHamming]].
    * Output (doc_id, phash, is_dup), the per-asset verdict a pipeline
    * filters on. */
  def phashDedup(sig: DataFrame, maxHamming: Int = phMaxHamming,
                 cap: Int = phBucketCap): DataFrame = {
    // signatures feed chunking, both verify joins AND the final output:
    // persist the tiny (doc_id, phash) frame so the hash pass runs once
    val sigP = graft.CacheRegistry.persistTracked(sig)
    val dups = phashPairs(sigP, maxHamming, cap)
      .select(col("d2").as("doc_id")).distinct()
      .withColumn("__dup", lit(true))
    sigP.join(dups, Seq("doc_id"), "left")
      .select(col("doc_id"), col("phash"),
        coalesce(col("__dup"), lit(false)).as("is_dup"))
  }

  /** mm_phash_dedup: stub-grid dHash over the documents-as-binary
    * corpus + the real banded-hamming decision dataflow — the
    * perceptual twin of byte-exact [[Dedup.exactDedup]], catching
    * re-encodes byte hashes cannot. */
  def phashDedupDocuments(docs: DataFrame): DataFrame =
    phashDedup(phashes(documentsAsBinary(docs)))

  /** DuckDB mirror of [[phashDedupDocuments]]: the stub grid as a
    * 72-cell array, dHash as a sum of CASE bit terms (bit 63's weight
    * is the Long sign value; partial sums stay in BIGINT because each
    * power of two appears once), then the same chunk/cap/verify chain
    * as [[Dedup.simhashNearDupSqlFor]]. */
  val phashDedupDocumentsSql: String = {
    val cells = (0 until phGridW * phGridH).map { i =>
      val k = i / 16
      val j = i % 16
      s"('0x' || substr(md5(md5(text) || ':$k'), ${2 * j + 1}, 2))::BIGINT"
    }.mkString("[", ",\n          ", "]")
    val bits = (0 until phGridH).flatMap { y =>
      (0 until phGridW - 1).map { x =>
        val b = y * (phGridW - 1) + x
        val w = if (b == 63) "(-9223372036854775807 - 1)" else (1L << b).toString
        s"CASE WHEN g[${y * phGridW + x + 2}] > g[${y * phGridW + x + 1}] THEN $w ELSE 0 END"
      }
    }.mkString(" + ")
    val chunkSelects = (0 until phChunks).map { c =>
      s"SELECT doc_id, $c AS chunk, (phash >> ${c * 16}) & 65535 AS key FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH g AS (
       |  SELECT doc_id, $cells AS g
       |  FROM documents
       |),
       |sig AS (SELECT doc_id, CAST($bits AS BIGINT) AS phash FROM g),
       |chunks AS (
       |  $chunkSelects
       |),
       |capped AS (
       |  SELECT * FROM chunks
       |  QUALIFY count(*) OVER (PARTITION BY chunk, key) <= $phBucketCap
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM capped a JOIN capped b ON a.chunk = b.chunk AND a.key = b.key
       |  WHERE a.doc_id < b.doc_id
       |),
       |dup AS (
       |  SELECT DISTINCT c.d2 AS doc_id
       |  FROM cand c JOIN sig s1 ON c.d1 = s1.doc_id JOIN sig s2 ON c.d2 = s2.doc_id
       |  WHERE bit_count(xor(s1.phash, s2.phash)) <= $phMaxHamming
       |)
       |SELECT s.doc_id, s.phash, d.doc_id IS NOT NULL AS is_dup
       |FROM sig s LEFT JOIN dup d ON s.doc_id = d.doc_id""".stripMargin
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
