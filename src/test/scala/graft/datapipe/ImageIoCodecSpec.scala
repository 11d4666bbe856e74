package graft.datapipe

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/**
 * The multimodal codec SEAM, proven with a REAL decoder: the md5 stub
 * behind the mm_* oracle entries is one [[MmCodec]] implementation;
 * [[ImageIoCodec]] (JDK `javax.imageio`, a public platform API — no new
 * dependency) is another, and the operator dataflow — narrow binary
 * projection → typed mapPartitions with a per-partition codec context →
 * Dataset[MmMeta]/[MmFeature] → ANN — is identical under both. Images
 * are synthesized in-memory as PNGs, so the spec is hermetic.
 */
class ImageIoCodecSpec extends SparkSpecBase {
  import spark.implicits._

  /** Grayscale PNG bytes: pixel (x, y) has intensity f(x, y) & 0xff in
    * all three BGR bands. */
  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "png writer available")
    bos.toByteArray
  }

  test("decode: real geometry and mean intensity from actual PNG bytes") {
    val bin = Seq(
      (0L, png(24, 16)((_, _) => 100)),       // constant fill
      (1L, png(10, 10)((x, _) => x * 25)))    // horizontal gradient
      .toDF("doc_id", "img")
    val out = Multimodal.decode(bin, new ImageIoCodec).collect()
      .map(m => m.doc_id -> m).toMap
    assert(out(0L).width == 24 && out(0L).height == 16 && out(0L).channels == 3)
    assert(out(0L).mean_byte == 100, "constant-fill mean is the fill value")
    assert(out(1L).width == 10 && out(1L).height == 10)
    // gradient mean: average of x*25 for x in 0..9 = 112 (integer floor)
    assert(out(1L).mean_byte == (0 until 10).map(_ * 25).sum / 10)
    assert(out.values.forall(_.n_bytes > 0), "n_bytes is the real payload size")
  }

  test("features: luminance profile tracks the image content") {
    val dim = Multimodal.featureDim
    val bin = Seq(
      (0L, png(64, 8)((x, _) => x * 4)),      // left-dark -> right-bright
      (1L, png(64, 8)((x, _) => 255 - x * 4)) // mirrored
    ).toDF("doc_id", "img")
    val feats = Multimodal.features(bin, new ImageIoCodec).collect()
      .map(f => f.doc_id -> f.feature).toMap
    assert(feats.values.forall(_.length == dim))
    assert(feats.values.flatten.forall(v => v >= -1.0 && v <= 1.0))
    // strictly increasing profile on the gradient, decreasing on the mirror
    assert(feats(0L).sliding(2).forall(p => p(0) < p(1)), "gradient profile ascends")
    assert(feats(1L).sliding(2).forall(p => p(0) > p(1)), "mirrored profile descends")
  }

  /** Same grayscale content encoded as JPEG (lossy — geometry exact,
    * intensities within a tolerance band). */
  private def jpeg(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "jpeg writer available")
    bos.toByteArray
  }

  test("JPEG decode (r16): geometry exact, lossy intensities within tolerance") {
    val bin = Seq(
      (0L, jpeg(24, 16)((_, _) => 100)),
      (1L, jpeg(48, 32)((x, _) => x * 5))).toDF("doc_id", "img")
    val out = Multimodal.decode(bin, new ImageIoCodec).collect()
      .map(m => m.doc_id -> m).toMap
    assert(out(0L).width == 24 && out(0L).height == 16 && out(0L).channels == 3)
    // JPEG is lossy but a constant fill survives the DCT nearly intact
    assert(math.abs(out(0L).mean_byte - 100) <= 3, s"mean ${out(0L).mean_byte}")
    assert(out(1L).width == 48 && out(1L).height == 32)
    assert(out.values.forall(_.n_bytes > 0))
  }

  test("real downsample (r16): deterministic checksum, exact payload on constant fill") {
    // constant 80-fill: every area-mean cell is exactly 80, any geometry
    val c = png(32, 24)((_, _) => 80)
    val lum = Multimodal.downsampleLuma(c, 8, 6)
    assert(lum.length == 48 && lum.forall(_ == 80.toByte))
    // horizontal gradient: downsampled profile ascends left to right
    val g = Multimodal.downsampleLuma(png(64, 8)((x, _) => x * 4), 8, 1)
    assert(g.map(_ & 0xff).sliding(2).forall(p => p(0) < p(1)), g.mkString(","))
    // the Dataset form: geometry + true payload size + content checksum
    val bin = Seq((0L, c), (1L, c), (2L, jpeg(32, 24)((_, _) => 80)))
      .toDF("doc_id", "img")
    val rs = Multimodal.resizeReal(bin, 8, 6).collect().map(r => r.doc_id -> r).toMap
    assert(rs.values.forall(r => r.out_w == 8 && r.out_h == 6 && r.out_bytes == 48))
    assert(rs(0L).checksum == rs(1L).checksum, "identical bytes -> identical checksum")
    // JPEG round-trips the constant fill close enough that the area-mean
    // payload may or may not be bit-equal — only require determinism
    val again = Multimodal.resizeReal(bin, 8, 6).collect().map(r => r.doc_id -> r).toMap
    assert(again == rs, "re-run is bit-identical")
  }

  test("mm_dedup dataflow under the real codec (r16): near-identical JPEGs dedup") {
    // luminance profiles = Hadamard rows over the 8 feature strips:
    // pairwise-orthogonal (cosine ~0, far under sdTau) EXCEPT ids 0/4,
    // which carry the same row as PNG and JPEG — the lossy twin must be
    // the one and only dup decision
    def hadamard(row: Int)(x: Int, @annotation.nowarn y: Int): Int = {
      val strip = math.min(7, x * 8 / 32)
      if (java.lang.Integer.bitCount(row & strip) % 2 == 0) 255 else 0
    }
    val bin = (Seq((0L, png(32, 32)(hadamard(7))), (4L, jpeg(32, 32)(hadamard(7)))) ++
      Seq(1L, 2L, 3L, 5L, 6L, 8L).zip(Seq(1, 2, 3, 4, 5, 6)).map { case (id, r) =>
        (id, png(32, 32)(hadamard(r)))
      }).toDF("doc_id", "img")
    // k = 2 clusters: with only 8 assets the default 16 centroids give
    // every point its own cluster and NO within-cluster pairs form —
    // the entry corpus has n >> k, the spec corpus must match that shape
    val out = Multimodal.dedupOverBinary(bin, new ImageIoCodec, k = 2)
    val dups = out.where(!col("keep")).collect()
    assert(dups.map(_.getAs[Long]("vec_id")).toSet == Set(4L),
      s"the JPEG twin (and only it) marks as dup: ${out.collect().mkString(";")}")
    assert(dups.head.getAs[Long]("dup_of") == 0L, "dup of the PNG original")
    // and the codec swap leaves the dataflow intact (stub sees distinct md5s)
    val stub = Multimodal.dedupOverBinary(bin, Md5StubCodec, k = 2)
    assert(stub.count() == 8, "one decision row per asset under the stub too")
  }

  test("mm_ann dataflow unchanged under the real codec: decode -> embed -> search") {
    // ids 0..7; Ann queries vec_id % 50 == 0, so id 0 is the query.
    // id 4 is byte-identical to id 0 => identical features => top neighbor.
    val grad = png(32, 32)((x, y) => x * 6 + y)
    val bin = (Seq((0L, grad), (4L, grad)) ++ (1L to 3L).map(i =>
      (i, png(32, 32)((x, y) => (x * x + y * (i.toInt + 2)) % 251))) ++ (5L to 7L).map(i =>
      (i, png(32, 32)((x, y) => (255 - x * i.toInt + y) % 251)))).toDF("doc_id", "img")
    val out = Multimodal.annOverBinary(bin, new ImageIoCodec)
      .orderBy(col("q_id"), col("rnk")).collect()
    assert(out.length == Ann.topK, "one query (id 0), top-5 neighbors")
    assert(out.forall(_.getAs[Long]("q_id") == 0L))
    val first = out.head
    assert(first.getAs[Long]("nbr_id") == 4L, "byte-identical asset ranks first")
    assert(first.getAs[Double]("sim") > 0.999999)
    // and the SAME pipeline with the stub codec still runs on the same input
    val stub = Multimodal.annOverBinary(bin, Md5StubCodec)
      .orderBy(col("q_id"), col("rnk")).collect()
    assert(stub.length == Ann.topK, "codec swap leaves the dataflow intact")
    assert(stub.head.getAs[Long]("nbr_id") == 4L,
      "identical bytes stay top-1 under the stub too (md5-equality)")
  }
}
