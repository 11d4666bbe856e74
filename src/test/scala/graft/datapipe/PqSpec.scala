package graft.datapipe

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Product-quantization ANN ([[Ann.pqTopK]]): per-subspace codebooks,
  * map-side encode, reconstruction-cosine (ADC) ranking. */
class PqSpec extends SparkSpecBase {
  import spark.implicits._

  /** 120 vectors in 4 well-separated subspace-aligned clusters (cluster
    * = id % 4 lights up subspace c with 1.0 + jitter; other dims carry
    * only jitter), so cross-cluster cosine ~ 0 and any sane quantizer
    * keeps cluster structure. */
  private def clustered(n: Int = 120, dim: Int = 64): org.apache.spark.sql.DataFrame =
    (0L until n.toLong).map { i =>
      val c = (i % 4).toInt
      (i, Array.tabulate(dim) { d =>
        val base = if (d / (dim / 4) == c) 1.0f else 0.0f
        base + 0.02f * math.sin(i * 13 + d * 7).toFloat
      })
    }.toDF("vec_id", "embedding")

  test("clustered corpus: every approximate neighbor is same-cluster") {
    val out = Ann.pqTopK(clustered()).collect()
    assert(out.nonEmpty)
    // queries are 0, 50, 100 -> clusters 0, 2, 0
    out.foreach { r =>
      val q = r.getAs[Long]("q_id"); val nbr = r.getAs[Long]("nbr_id")
      assert(q % 4 == nbr % 4, s"query $q got cross-cluster neighbor $nbr")
      assert(r.getAs[Double]("asim") > 0.8, s"same-cluster asim unexpectedly low: $r")
    }
    val perQ = out.groupBy(_.getAs[Long]("q_id")).view.mapValues(_.length).toMap
    assert(perQ == Map(0L -> Ann.topK, 50L -> Ann.topK, 100L -> Ann.topK))
  }

  test("codes actually compress: reconstructions collapse onto the codebook") {
    // expose the quantization by counting distinct ADC scores per query:
    // identical codes => identical reconstruction => identical asim
    val emb = clustered(80)
    val out = Ann.pqTopK(emb, Ann.pqM, Ann.pqK, rounds = 1, subDim = 16).collect()
    val distinctSims = out.map(_.getAs[Double]("asim")).distinct.length
    assert(distinctSims < out.length,
      "nearby vectors should share reconstructions (quantization visible)")
  }

  test("non-default m derives its own subDim (no silent pqM coupling)") {
    // r9 review fix: the subDim default was keyed to the CONSTANT pqM,
    // so m=8 sliced past the embedding and half the codes carried no
    // signal. Now subDim derives from the actual m; geometry violations
    // are loud.
    val out = Ann.pqTopK(clustered(80), m = 8, k = 8, rounds = 1).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("q_id") % 4 == r.getAs[Long]("nbr_id") % 4,
        "cluster structure preserved at m=8 (subspaces actually populated)")
    }
    intercept[IllegalArgumentException] { Ann.pqTopK(clustered(16), m = 7, k = 4, rounds = 1) }
  }

  test("deterministic: two runs agree exactly") {
    val a = Ann.pqTopK(clustered(100)).collect().map(_.toString).sorted.toSeq
    graft.CacheRegistry.unpersistAll()
    val b = Ann.pqTopK(clustered(100)).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("compressed codes + codebook round-trip through parquet with identical rankings") {
    // the storage contract: pqCompress writes 2 bytes/vector of codes +
    // a codebook; pqTopKFromCodes over the re-read state must reproduce
    // pqTopK exactly (same training, same ADC estimate)
    val emb = clustered(120)
    val direct = Ann.pqTopK(emb).collect().map(_.toString).sorted.toSeq
    graft.CacheRegistry.unpersistAll()
    val (codes, cent) = Ann.pqCompress(emb)
    val dir = java.nio.file.Files.createTempDirectory("pq_state_")
    codes.write.mode("overwrite").parquet(dir.resolve("codes").toString)
    cent.write.mode("overwrite").parquet(dir.resolve("cent").toString)
    graft.CacheRegistry.unpersistAll()
    // the query slice is the CALLER's: pqTopKFromCodes serves every row
    // of the frame it is handed (an external query set with ids not
    // divisible by queryMod must not come back empty)
    val fromDisk = Ann.pqTopKFromCodes(
      emb.where(col("vec_id") % Ann.queryMod === 0),
      spark.read.parquet(dir.resolve("codes").toString),
      spark.read.parquet(dir.resolve("cent").toString))
      .collect().map(_.toString).sorted.toSeq
    assert(fromDisk == direct && direct.nonEmpty,
      s"persisted-state ANN must equal the direct form (${direct.size} rows)")
    // and the codes really are the compressed width
    val c = spark.read.parquet(dir.resolve("codes").toString).head()
    assert(c.getSeq[Any](c.fieldIndex("codes")).length == Ann.pqM)
  }

  test("real embeddings: sane shape, bounded scores (recall lives on structured data)") {
    // the sf0.001 embeddings are near-random: pairwise cosines sit at
    // the noise floor, so NO quantizer preserves that ranking — PQ's
    // recall contract is the clustered-corpus test above (the setting
    // ANN exists for); here we pin shape, bounds and the rank window,
    // and the driver's DuckDB hash compare pins exact values
    val emb = Tables.embeddings(spark, sfDir)
    val approx = Ann.pqTopK(emb).collect()
    val qs = approx.map(_.getAs[Long]("q_id")).distinct
    assert(qs.nonEmpty)
    qs.foreach { q =>
      val a = approx.filter(_.getAs[Long]("q_id") == q)
      assert(a.map(_.getAs[Long]("rnk")).sorted.toSeq == (1L to Ann.topK.toLong).toSeq)
      assert(a.forall(r => !qs.contains(r.getAs[Long]("nbr_id")) ||
        r.getAs[Long]("nbr_id") != q), "self excluded")
      assert(a.forall(r => math.abs(r.getAs[Double]("asim")) <= 1.0 + 1e-9),
        "ADC cosine estimate bounded")
    }
  }
}
