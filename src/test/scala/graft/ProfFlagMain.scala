import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for dedup_stream_flag's stages (test tree only). */
object ProfFlag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.sources.Tables.documents(spark, d)
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROFFLAG $label rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    docs.count() // warm IO
    t("shingleSets")(graft.datapipe.Dedup.shingleSets(docs).count())
    t("shingleSets_rep2")(graft.datapipe.Dedup.shingleSets(docs).count())
    graft.CacheRegistry.unpersistAll()
    t("index_build") {
      val i = graft.datapipe.Dedup.minhashIndex(docs)
      i.keys.count() + i.sets.count()
    }
    val idx = graft.datapipe.Dedup.minhashIndex(docs)
    idx.keys.count(); idx.sets.count()
    t("probe_only_warm_index") {
      graft.datapipe.Dedup.minhashStreamingFlag(
        docs.where(col("doc_id") % 10 === 0), idx).count()
    }
    graft.CacheRegistry.unpersistAll()
    t("full_entry") {
      graft.datapipe.Dedup.minhashStreamingFlag(
        docs.where(col("doc_id") % 10 === 0),
        graft.datapipe.Dedup.minhashIndex(docs)).count()
    }
    spark.stop()
  }
}
