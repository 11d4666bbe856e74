package graft.sources

import java.nio.file.Files

import graft.SparkSpecBase

class TablesSpec extends SparkSpecBase {

  test("csv loader reads delimited files with an explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "nation.dat")
    Files.writeString(f.toPath, "0|ALGERIA|0\n1|ARGENTINA|1\n2|BRAZIL|1\n")
    val df = Tables.csv(spark, f.getAbsolutePath,
      "n_nationkey INT, n_name STRING, n_regionkey INT", delimiter = "|")
    assert(df.count() == 3)
    assert(df.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(df.where("n_regionkey = 1").count() == 2)
  }

  test("events loader truncates nanosecond timestamps to exact milliseconds") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    // ms-truncation must be exact integer division (no double rounding)
    val bad = ev.selectExpr("unix_micros(ts) % 1000 AS sub_ms")
      .where("sub_ms != 0").count()
    assert(bad == 0L)
  }

  test("derived edges relation is duplicate-free (set semantics for wcoj)") {
    val e = Tables.edges(spark, sfDir)
    assert(e.count() == e.distinct().count())
  }

  test("partitioned write enables partition pruning on read-back") {
    val dir = Files.createTempDirectory("graft_part").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir)
    Tables.writePartitioned(docs, dir, Seq("lang"))
    val langs = docs.select("lang").distinct().count()
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("lang=")) == langs)
    val one = spark.read.parquet(dir).where("lang = 'en'")
    val plan = one.queryExecution.executedPlan.toString()
    // the lang predicate must prune DIRECTORIES, not filter rows post-scan
    assert(plan.contains("PartitionFilters: [") && plan.contains("lang"))
    assert(one.count() == docs.where("lang = 'en'").count())
  }
}
