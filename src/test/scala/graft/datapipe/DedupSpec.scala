package graft.datapipe

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "  THE QUICK  BROWN fox jumps over the lazy dog "), // exact dup of 1 after norm
    (3L, "the quick brown fox jumps over the lazy cat"),     // near-dup of 1
    (4L, "completely different words in this one right here"),
    (5L, "another unrelated document with its own words too"))
    .toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates under min doc_id") {
    val out = Dedup.exact(docs).collect()
    assert(out.length == 4) // 1&2 collapse
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("ngram jaccard finds the near-dup pair and is bounded by 1") {
    val out = Dedup.ngramJaccard(docs)
      .select("d1", "d2", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 1-2 identical shingle sets (jac 1.0); 1-3 and 2-3 overlap
    assert(out.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
    assert(out.exists { case (a, b, j) => a == 1L && b == 3L && j > 0.4 && j < 1.0 })
    assert(out.forall { case (_, _, j) => j >= Dedup.ngramTau && j <= 1.0 })
  }

  test("minhash LSH surfaces identical docs with jaccard 1") {
    val out = Dedup.minhashLsh(docs)
      .select("d1", "d2", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
  }

  test("simhash of identical docs has hamming 0; all pairs within threshold") {
    val out = Dedup.simhashNearDup(docs)
      .select("d1", "d2", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.exists { case (a, b, h) => a == 1L && b == 2L && h == 0L })
    assert(out.forall(_._3 <= Dedup.shMaxHamming))
  }

  test("signature columns are stable across runs (deterministic hashing)") {
    val s1 = Dedup.minhashSignatures(Dedup.shingles(docs)).orderBy("doc_id").collect().map(_.toSeq)
    val s2 = Dedup.minhashSignatures(Dedup.shingles(docs)).orderBy("doc_id").collect().map(_.toSeq)
    assert(s1.toSeq == s2.toSeq)
  }
}
