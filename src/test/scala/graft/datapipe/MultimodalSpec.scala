package graft.datapipe

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "first asset bytes"), (2L, "second asset bytes"), (3L, "first asset bytes"))
    .toDF("doc_id", "text")

  test("decode stub is deterministic and geometry stays in range") {
    val out = Multimodal.decodeDocuments(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("width"), r.getAs[Long]("height"), r.getAs[Long]("channels"))).toMap
    assert(out(1L) == out(3L)) // same bytes -> same fake metadata
    assert(out.values.forall { case (w, h, c) =>
      w >= 64 && w < 256 && h >= 64 && h < 256 && c >= 1 && c <= 3 })
  }

  test("frame sampling fans out n typed rows per asset") {
    val frames = Multimodal.frameSample(Multimodal.documentsAsBinary(docs), 4).collect()
    assert(frames.length == 12)
    assert(frames.groupBy(_.doc_id).values.forall(_.map(_.frame_idx).sorted.sameElements(0L until 4L)))
    // identical content -> identical frame hashes
    val f1 = frames.filter(_.doc_id == 1L).sortBy(_.frame_idx).map(_.frame_hash).toSeq
    val f3 = frames.filter(_.doc_id == 3L).sortBy(_.frame_idx).map(_.frame_hash).toSeq
    assert(f1 == f3)
  }

  test("feature stub yields Ann-ready vectors: self-cosine is 1") {
    val feats = Multimodal.features(Multimodal.documentsAsBinary(docs)).toDF()
      .select(col("doc_id"), col("feature").cast("array<float>").as("embedding"))
    val self = feats.toDF("id1", "a").join(feats.toDF("id2", "b"), col("id1") === col("id2"))
      .select(Ann.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(self.forall(c => math.abs(c - 1.0) < 1e-9))
    val dims = Multimodal.features(Multimodal.documentsAsBinary(docs))
      .collect().map(_.feature.length).toSet
    assert(dims == Set(Multimodal.featureDim))
  }

  test("multimodal SemDeDup: byte-identical assets in one cluster dedup onto the first") {
    // 20 assets, ids 0..19 so the IVF seeds exist; 17 and 18 repeat the
    // bytes of 1 and 2 -> identical stub features, cosine exactly 1
    val many = ((0L until 17L).map(i => (i, s"asset payload $i")) ++
      Seq((17L, "asset payload 1"), (18L, "asset payload 2"), (19L, "asset payload 3")))
      .toDF("doc_id", "text")
    val out = Multimodal.semanticDedupOverFeatures(many).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Boolean]("keep"), Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong)))
      .toMap
    assert(out.size == 20, "one decision per asset")
    // identical bytes -> identical features -> same cluster, cos = 1 is
    // the unique maximum, so dup_of is exactly the byte-identical original
    assert(out(17L)._1 == false && out(17L)._2.contains(1L))
    assert(out(18L)._1 == false && out(18L)._2.contains(2L))
    assert(out(19L)._1 == false && out(19L)._2.contains(3L))
  }
}
