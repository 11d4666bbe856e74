package graft.datapipe

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/**
 * Perceptual-hash image dedup (r17 — VERDICT #2): dHash over the luma
 * grid, banded hamming buckets, keep-first decision. The load-bearing
 * test is the RE-ENCODE TWIN: the same raster encoded PNG and JPEG has
 * different bytes (byte-hash dedup misses it) but the same dHash
 * (phash dedup catches it) — the reason production image pipelines
 * dedup on dHash/pHash, now a first-class decision here.
 */
class PhashSpec extends SparkSpecBase {
  import spark.implicits._

  private def raster(w: Int, h: Int, fmt: String)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"$fmt writer available")
    bos.toByteArray
  }

  test("dHash64: constant grid is 0, ascending grid is all-ones, geometry is enforced") {
    assert(Multimodal.dHash64(Array.fill(72)(100.toByte)) == 0L)
    assert(Multimodal.dHash64(Array.tabulate(72)(i => (i * 3).toByte)) == -1L,
      "strictly ascending rows set all 64 bits (bit 63 rides the sign)")
    // unsigned compare: 0x7f < 0x80 as bytes-as-unsigned
    val g = Array.fill(72)(0x7f.toByte); g(1) = 0x80.toByte
    assert((Multimodal.dHash64(g) & 1L) == 1L, "0x80 is brighter than 0x7f unsigned")
    intercept[IllegalArgumentException](Multimodal.dHash64(Array.fill(10)(0.toByte)))
  }

  test("re-encode twin: JPEG of the same raster is caught where byte hashes miss") {
    // 4px-block checkerboard aligned to the 9x8 grid: each grid cell is
    // a solid 40 or 200 block, so every dHash comparison has a 160 gap
    // JPEG noise cannot flip
    def checker(shift: Int)(x: Int, y: Int): Int =
      if (((x / 4 + y / 4) + shift) % 2 == 0) 40 else 200
    val pngBytes = raster(36, 32, "png")(checker(0))
    val jpgBytes = raster(36, 32, "jpg")(checker(0))
    val otherBytes = raster(36, 32, "png")(checker(1)) // complementary blocks
    assert(!java.util.Arrays.equals(pngBytes, jpgBytes),
      "the twin has different BYTES -- exact/byte-hash dedup cannot see it")
    val bin = Seq((0L, pngBytes), (1L, jpgBytes), (2L, otherBytes)).toDF("doc_id", "img")
    val sig = Multimodal.phashesReal(bin)
    val out = Multimodal.phashDedup(sig).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(!out(0L)._2, "the first occurrence survives")
    assert(out(1L)._2, "the JPEG re-encode is flagged as a perceptual dup")
    assert(!out(2L)._2, "the shifted checkerboard is a DIFFERENT image, kept")
    val ham01 = java.lang.Long.bitCount(out(0L)._1 ^ out(1L)._1)
    val ham02 = java.lang.Long.bitCount(out(0L)._1 ^ out(2L)._1)
    assert(ham01 <= Multimodal.phMaxHamming && ham02 > Multimodal.phMaxHamming,
      s"twin hamming $ham01 within threshold, distinct image $ham02 beyond it")
  }

  test("pigeonhole recall: hamming 3 always bucketed, 4 spread across all chunks is the documented bound") {
    val p = 0x0123456789abcdefL
    val flip3 = p ^ 7L                         // 3 bits, all inside chunk 0
    val flip4 = p ^ ((1L << 0) | (1L << 16) | (1L << 32) | (1L << 48)) // one per chunk
    val sig = Seq((0L, p), (1L, flip3), (2L, flip4)).toDF("doc_id", "phash")
    val pairs = Multimodal.phashPairs(sig).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains((0L, 1L, 3L)), "3 flipped bits: some 16-bit chunk is intact")
    assert(!pairs.exists(t => t._1 == 0L && t._2 == 2L),
      "4 bits spread over all 4 chunks defeats every bucket -- the chunks-1 bound, stated honestly")
  }

  test("hot-bucket cap drops a pathological constant-image bucket before the self-join") {
    val solid = (0L until 6L).map(i => (i, 0L)) // six all-zero signatures (solid-color assets)
    val sig = solid.toDF("doc_id", "phash")
    assert(Multimodal.phashPairs(sig, cap = 3).isEmpty,
      "over-cap buckets contribute no candidates")
    assert(Multimodal.phashPairs(sig).count() == 15L,
      "under the default cap the 6-clique's 15 pairs all verify at hamming 0")
  }

  test("stub grid path: identical bytes collide, the decision matches the oracle shape") {
    val docs = Seq(
      (0L, "the same document text"),
      (1L, "the same document text"),
      (2L, "a completely different body of text here")).toDF("doc_id", "text")
    val out = Multimodal.phashDedupDocuments(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(0L)._1 == out(1L)._1, "identical bytes -> identical stub grid -> identical phash")
    assert(!out(0L)._2 && out(1L)._2, "keep-first: the later twin is the dup")
    assert(!out(2L)._2)
  }
}
