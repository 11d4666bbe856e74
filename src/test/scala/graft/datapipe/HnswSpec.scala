package graft.datapipe

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HNSW-style hierarchical graph serving (r17 — VERDICT #3): the upper
  * layers must buy their keep — recall at least the flat LSH-seeded
  * serve's at equal layer-0 beam/steps, while scoring FEWER candidates
  * per query and never re-bucketing the whole collection at serve
  * time. */
class HnswSpec extends SparkSpecBase {

  import spark.implicits._

  private def emb: DataFrame = graft.sources.Tables.embeddings(spark, sfDir)

  test("upper layers: nested geometric thinning, graphs over members only") {
    val ep = emb.select(col("vec_id"), col("embedding"))
    val n = ep.count()
    val l1 = ep.where(Ann.layerPred(1)).count()
    val l2 = ep.where(Ann.layerPred(2)).count()
    assert(l1 > 0 && l1 < n, s"layer 1 is a strict thinning ($l1 of $n)")
    assert(l2 < l1, s"layer 2 thinner than layer 1 ($l2 vs $l1)")
    // nesting: every L2 member is an L1 member (8^2 divides -> 8 divides)
    assert(ep.where(Ann.layerPred(2) && !Ann.layerPred(1)).count() == 0)
    val uppers = Ann.hnswUpperGraphs(ep)
    val g1Verts = uppers(0).select("vec_id").distinct()
    assert(g1Verts.join(ep.where(Ann.layerPred(1)), Seq("vec_id"), "left_anti").count() == 0,
      "layer-1 graph vertices are layer-1 members only")
  }

  test("hierarchical serve: recall >= flat serve at equal layer-0 beam, fewer scored candidates") {
    val ep = emb.select(col("vec_id"), col("embedding"))
    val planes = Ann.lshPlanesFor(ep.count())
    val g0 = Ann.knnGraph(ep, planes = planes)
    val uppers = Ann.hnswUpperGraphs(ep)
    val (flatRes, flatVis) = Ann.graphSearchOverWithVisited(g0, ep, planes)
    val (hierRes, hierVis) = Ann.graphSearchHierOverWithVisited(g0, uppers, ep)
    def hits(res: DataFrame): Long = {
      val q = ep.where(col("vec_id") % Ann.queryMod === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val we = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("__c").desc, col("e_nbr").asc)
      val ex = ep.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("e_nbr"),
          Ann.cosine(col("q_emb"), col("embedding")).as("__c"))
        .withColumn("__r", row_number().over(we)).where(col("__r") <= Ann.topK)
        .select(col("q_id"), col("e_nbr"))
      res.join(ex, res("q_id") === ex("q_id") && col("nbr_id") === col("e_nbr"))
        .count()
    }
    val (fh, hh) = (hits(flatRes), hits(hierRes))
    val fScored = flatVis.agg(sum("n_scored")).head().getLong(0)
    val hScored = hierVis.agg(sum("n_scored")).head().getLong(0)
    assert(hh >= fh, s"hier recall regressed: $hh true-top-k hits vs flat's $fh")
    assert(hScored < fScored,
      s"hier must score fewer candidates: $hScored vs flat's $fScored")
    info(s"recall hits: hier $hh vs flat $fh; scored candidates: hier $hScored vs flat $fScored")
  }

  test("persisted hierarchy: file serve == inline serve row-for-row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_hnsw").toString
    Ann.hnswWrite(emb, dir)
    def rows(df: DataFrame): Set[String] =
      df.select(col("q_id"), col("nbr_id"), col("rnk"), col("sim")).collect()
        .map(_.toString).toSet
    val file = rows(Ann.graphSearchHierFileChecked(spark, dir))
    graft.CacheRegistry.unpersistAll()
    val inline = rows(Ann.graphSearchHierChecked(emb))
    assert(file == inline && file.nonEmpty)
    // the upper-layer edge tables exist and hold only member vertices
    val l2 = spark.read.parquet(s"$dir/edges_l2")
    val members = emb.where(Ann.layerPred(2)).select(col("vec_id"))
    assert(l2.select("vec_id").distinct()
      .join(members, Seq("vec_id"), "left_anti").count() == 0)
  }
}
