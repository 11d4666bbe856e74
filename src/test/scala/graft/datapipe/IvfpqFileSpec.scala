package graft.datapipe

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.types.ArrayType

/**
 * The IVFADC deployment split (r13): train + encode once into a
 * parquet-persisted index (codes ⋈ lists + the K-row quantizer/codebook
 * artifacts), then SERVE from the disk-resident codes. Pins the §2.2 row
 * 25c production claim: the persisted artifact carries no raw vectors,
 * the serving half reproduces ivfpqTopK exactly, and no collection-side
 * exchange ever moves a vector payload.
 */
class IvfpqFileSpec extends SparkSpecBase {

  private def vecs = {
    import spark.implicits._
    (0L until 256L).map(i =>
      (i, Array.tabulate(Ann.dim)(d => math.sin(i * 3.0 + d * 11.0).toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("persisted-index serving reproduces ivfpqTopK exactly (round-trip through parquet)") {
    val emb = vecs
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_spec_").toString
    try {
      Ann.ivfpqIndex(emb).write(dir)
      val idx = Ann.IvfpqIndex.read(spark, dir)
      val served = Ann.ivfpqServe(
        emb.where(col("vec_id") % Ann.queryMod === 0)
          .select(col("vec_id").as("q_id"), col("embedding")), idx)
        .collect().map(_.toSeq).toSet
      graft.CacheRegistry.unpersistAll()
      val direct = Ann.ivfpqTopK(emb).collect().map(_.toSeq).toSet
      assert(served == direct && served.nonEmpty,
        s"file-served ranking diverged: ${served.size} vs ${direct.size} rows")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("r13 review fix: serving derives (k, m) from the artifact, not free defaults") {
    // an index trained with non-default hyperparameters must round-trip:
    // k >= ivf2MinK flips the quantizer to the two-level regime and m=8
    // changes the code length — with free serve-side defaults (k=16,
    // m=4) the probe would route through the WRONG quantizer regime and
    // the codebook join would silently empty (element_at past the codes
    // array is NULL). The (k, m) meta frame rides in the artifact.
    val emb = vecs
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_spec_").toString
    try {
      Ann.ivfpqIndex(emb, k = Ann.ivf2MinK, m = 8).write(dir)
      val idx = Ann.IvfpqIndex.read(spark, dir)
      val served = Ann.ivfpqServe(
        emb.where(col("vec_id") % Ann.queryMod === 0)
          .select(col("vec_id").as("q_id"), col("embedding")), idx)
        .collect().map(_.toSeq).toSet
      graft.CacheRegistry.unpersistAll()
      val direct = Ann.ivfpqTopK(emb, 1, Ann.ivf2MinK, 8)
        .collect().map(_.toSeq).toSet
      assert(served == direct && served.nonEmpty,
        s"non-default (k, m) round-trip diverged: ${served.size} vs ${direct.size}")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("the persisted artifact is code-only: no raw vector column on disk") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_spec_").toString
    try {
      Ann.ivfpqIndex(vecs).write(dir)
      val packed = spark.read.parquet(s"$dir/packed")
      assert(packed.columns.sorted.toSeq == Seq("cid", "codes", "vec_id"))
      // codes are pqM small ints — the ~2-byte storage form
      val row = packed.select(size(col("codes"))).head()
      assert(row.getInt(0) == Ann.pqM)
      assert(!packed.columns.contains("embedding"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("residual persisted-index serving reproduces ivfpqResTopK exactly") {
    val emb = vecs
    val dir = java.nio.file.Files.createTempDirectory("ivfpqr_spec_").toString
    try {
      Ann.ivfpqResIndex(emb).write(dir)
      val idx = Ann.IvfpqIndex.read(spark, dir)
      val served = Ann.ivfpqResServe(
        emb.where(col("vec_id") % Ann.queryMod === 0)
          .select(col("vec_id").as("q_id"), col("embedding")), idx)
        .collect().map(_.toSeq).toSet
      graft.CacheRegistry.unpersistAll()
      val direct = Ann.ivfpqResTopK(emb).collect().map(_.toSeq).toSet
      assert(served == direct && served.nonEmpty,
        s"residual file-served ranking diverged: ${served.size} vs ${direct.size} rows")
      // the artifact stays code-only (residual codes, no raw vector)
      val packed = spark.read.parquet(s"$dir/packed")
      assert(packed.columns.sorted.toSeq == Seq("cid", "codes", "vec_id"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("r13 FAISS add(): appends encode against the frozen artifacts; wrong-form serving refuses") {
    val emb = vecs
    val even = emb.where(col("vec_id") % 2 === 0)
    val odd = emb.where(col("vec_id") % 2 === 1)
    val queries = emb.where(col("vec_id") % Ann.queryMod === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_add_").toString
    try {
      Ann.ivfpqIndex(even).write(dir)
      Ann.ivfpqAppend(spark, dir, odd)
      val idx = Ann.IvfpqIndex.read(spark, dir)
      // every vector of both shards is packed exactly once
      val packedIds = idx.packed.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(packedIds == (0L until 256L).toSeq)
      // appended codes equal a fresh encode against the FROZEN codebook
      val expect = Ann.pqEncode(odd, idx.cb).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val got = idx.packed.where(col("vec_id") % 2 === 1).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Long]]("codes")).toMap
      assert(got == expect, "appended codes must come from the frozen codebook")
      // serving sees the appended vectors as candidates (non-vacuous)
      val served = Ann.ivfpqServe(queries, idx).collect()
      assert(served.exists(_.getAs[Long]("nbr_id") % 2 == 1),
        "appended vectors must be servable neighbors")
      // artifact-form safety: residual serving refuses a RAW index
      intercept[IllegalArgumentException] { Ann.ivfpqResServe(queries, idx) }
      graft.CacheRegistry.unpersistAll()
      // residual index: append auto-encodes residuals; raw serving refuses
      val rdir = s"$dir/res"
      Ann.ivfpqResIndex(even).write(rdir)
      Ann.ivfpqAppend(spark, rdir, odd)
      val ridx = Ann.IvfpqIndex.read(spark, rdir)
      intercept[IllegalArgumentException] { Ann.ivfpqServe(queries, ridx) }
      val rServed = Ann.ivfpqResServe(queries, ridx).collect()
      assert(rServed.nonEmpty && rServed.exists(_.getAs[Long]("nbr_id") % 2 == 1))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("serving plan: no exchange above the packed scan carries a vector payload") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_spec_").toString
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Ann.ivfpqIndex(vecs).write(dir)
      val rdir = s"$dir/res"
      Ann.ivfpqResIndex(vecs).write(rdir)
      val queries = vecs.where(col("vec_id") % Ann.queryMod === 0)
        .select(col("vec_id").as("q_id"), col("embedding"))
      def hasPackedScan(p: SparkPlan): Boolean =
        p.collectLeaves().exists(_.toString.contains("/packed"))
      for ((label, served) <- Seq(
          "raw" -> Ann.ivfpqServe(queries, Ann.IvfpqIndex.read(spark, dir)),
          "residual" -> Ann.ivfpqResServe(queries, Ann.IvfpqIndex.read(spark, rdir)))) {
        val plan = served.queryExecution.executedPlan
        val collectionExchanges = plan.collect {
          case e: ShuffleExchangeLike if hasPackedScan(e.child) => e
        }
        assert(collectionExchanges.nonEmpty,
          s"$label serving does exchange slim rows (distinct + rank)")
        collectionExchanges.foreach { e =>
          val arrays = e.child.output.filter(_.dataType.isInstanceOf[ArrayType])
          assert(arrays.isEmpty,
            s"$label collection-side exchange moves a vector/code payload ${arrays.map(_.name)}:\n$e")
        }
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
