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
