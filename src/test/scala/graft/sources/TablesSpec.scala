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

  test("jsonl round-trips adversarial text byte-exactly under a declared schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_jsonl").toFile.getAbsolutePath
    val docs = Seq(
      (1L, "plain ascii text", "en"),
      (2L, "embedded \"quotes\" and \\backslashes\\", "en"),
      (3L, "line\nbreaks\nand\ttabs", "de"),
      (4L, "unicode: café 日本語 😀", "fr"),
      (5L, "", "en"),
      (6L, "trailing space ", "es"))
      .toDF("doc_id", "text", "lang")
    Tables.writeJsonl(docs, dir)
    val back = Tables.readJsonl(spark, dir, "doc_id BIGINT, text STRING, lang STRING")
    assert(back.schema.fieldNames.toSeq == Seq("doc_id", "text", "lang"))
    val orig = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val rt = back.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rt == orig, "JSONL round trip altered some document")
    // schema'd read projects referenced fields only — no inference pass
    val projected = Tables.readJsonl(spark, dir, "doc_id BIGINT, lang STRING")
    assert(projected.collect().map(_.getLong(0)).sorted.toSeq == (1L to 6L).toSeq)
  }

  test("corrupt JSONL lines quarantine instead of aborting or vanishing") {
    val dir = Files.createTempDirectory("graft_jsonl_bad")
    Files.write(dir.resolve("part-0.jsonl"), Seq(
      """{"doc_id": 1, "text": "good row", "lang": "en"}""",
      """{"doc_id": 2, "text": "truncated""", // malformed JSON
      """not json at all""",
      """{"doc_id": 3, "text": "another good row", "lang": "de"}"""
    ).mkString("\n").getBytes("UTF-8"))
    val back = Tables.readJsonlQuarantine(spark, dir.toString,
      "doc_id BIGINT, text STRING, lang STRING")
    val clean = back.where("_quarantine IS NULL")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(clean == Set((1L, "good row"), (3L, "another good row")))
    // the dead-letter split carries the offending lines VERBATIM
    val bad = back.where("_quarantine IS NOT NULL")
      .collect().map(_.getAs[String]("_quarantine")).toSet
    assert(bad == Set("""{"doc_id": 2, "text": "truncated""", "not json at all"))
    // and the strict reader refuses nothing silently: same total row count
    assert(back.count() == 4)
  }

  test("zorderKey interleaves bits: hand cases and monotone quadrant prefixes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cases = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 0L, 4L), (3L, 3L, 15L), (65535L, 65535L, (1L << 32) - 1))
    val df = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .select(Tables.zorderKey(col("a"), col("b")).as("z"))
    assert(df.collect().map(_.getLong(0)).toSeq == cases.map(_._3))
    // out-of-width and negative inputs FAIL LOUD instead of silently
    // aliasing distant keys onto the same curve position (r14 review pin)
    for (bad <- Seq((65536L, 0L), (0L, -1L))) {
      val ex = intercept[Exception] {
        Seq(bad).toDF("a", "b")
          .select(Tables.zorderKey(col("a"), col("b")).as("z")).collect()
      }
      assert(ex.getMessage.contains("zorderKey"), ex.getMessage)
    }
  }

  test("z-order clustering prunes BOTH dimensions at once; single-key clustering cannot") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_zorder").toString
    // deterministic 64x64 grid, both dims 6 bits
    val grid = spark.range(0, 4096).select(
      (col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"))
    def boxes(path: String): Array[(Long, Long, Long, Long)] =
      new java.io.File(path).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .map { f =>
          val r = spark.read.parquet(f.getPath)
            .agg(min(col("a")), max(col("a")), min(col("b")), max(col("b"))).head()
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }
    try {
      Tables.writeClusteredBy(grid, s"$dir/z",
        Tables.zorderKey(col("a"), col("b"), 6), 16)
      Tables.writeClustered(grid, s"$dir/a", "a", 16)
      val zb = boxes(s"$dir/z"); val ab = boxes(s"$dir/a")
      assert(zb.length >= 8 && ab.length >= 8)
      // a corner query a<16 AND ALSO a corner query b<16 each overlap at
      // most half the z-files (its area is 1/4 the grid; sampled range
      // boundaries may straddle quadrants, hence the slack)...
      assert(zb.count(f => f._1 <= 15) <= zb.length / 2, zb.mkString(","))
      assert(zb.count(f => f._3 <= 15) <= zb.length / 2, zb.mkString(","))
      // ...while single-key clustering on `a` leaves EVERY file fully
      // spanning b — the b-corner query reads the whole table
      assert(ab.count(f => f._3 <= 15) == ab.length)
      // and the re-layout loses nothing
      assert(spark.read.parquet(s"$dir/z").count() == 4096)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("compaction re-bins small files toward the target size without losing a row") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_compact").toString
    val events = Tables.events(spark, sfDir)
    try {
      events.repartition(32).write.mode("overwrite").parquet(s"$dir/frag")
      val fragBytes = new java.io.File(s"$dir/frag").listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.length()).sum
      val target = math.max(1L, fragBytes / 4)
      val (before, after) = Tables.compact(spark, s"$dir/frag", s"$dir/out", target)
      assert(before == 32)
      // ceil(total/target) = 4 (and at least 3 if parquet re-encoding
      // shrinks the data — the bound that matters is "far fewer files")
      assert(after <= 5 && after >= 2, s"after=$after")
      // nothing lost or duplicated by the re-binning
      val back = spark.read.parquet(s"$dir/out")
      assert(back.count() == events.count())
      assert(back.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
        events.select("event_id").collect().map(_.getLong(0)).sorted.toSeq)
      // degenerate target: everything fits one file
      val (_, one) = Tables.compact(spark, s"$dir/frag", s"$dir/one", Long.MaxValue)
      assert(one == 1)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("range-clustered write yields pairwise-disjoint per-file key ranges and a pushed range filter") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_clustered").toString
    val events = Tables.events(spark, sfDir)
    try {
      Tables.writeClustered(events, s"$dir/ev", "ts", 6)
      // layout contract: each part-file covers a disjoint ts slice — the
      // property that makes footer min/max stats prune at scale
      val parts = new java.io.File(s"$dir/ev").listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .map(_.getPath)
      assert(parts.length > 1, "need multiple files to prove disjointness")
      val ranges = parts.map { p =>
        val r = spark.read.parquet(p)
          .agg(min(col("ts")), max(col("ts"))).head()
        (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)
      }.sortBy(_._1)
      ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping file ranges: $hi > $lo2")
      }
      // the range predicate reaches the scan (evaluated against footer
      // stats before any page decodes)
      val filtered = spark.read.parquet(s"$dir/ev")
        .where(col("ts") >= lit("2024-01-10").cast("timestamp") &&
          col("ts") < lit("2024-01-13").cast("timestamp"))
      val scan = filtered.queryExecution.executedPlan.toString
      assert(scan.contains("PushedFilters") &&
        scan.contains("GreaterThanOrEqual(ts") && scan.contains("LessThan(ts"),
        s"range filter not pushed:\n$scan")
      // and the filtered read-back equals the direct filter — no row lost
      // or duplicated by the re-layout
      val direct = events
        .where(col("ts") >= lit("2024-01-10").cast("timestamp") &&
          col("ts") < lit("2024-01-13").cast("timestamp"))
      assert(filtered.count() == direct.count() && direct.count() > 0)
      assert(filtered.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
        direct.select("event_id").collect().map(_.getLong(0)).sorted.toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("orc round-trip: partition pruning, predicate pushdown, byte fidelity") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_orc").toString
    val events = Tables.events(spark, sfDir)
    try {
      events.write.mode("overwrite").partitionBy("event_type").orc(s"$dir/ev")
      val back = spark.read.orc(s"$dir/ev")
      assert(back.count() == events.count())
      val one = back.where(col("event_type") === "purchase" && col("value") >= lit(50.0))
      val plan = one.queryExecution.executedPlan.toString
      // event_type prunes DIRECTORIES; the value range reaches the ORC
      // reader as a pushed filter (row-group stats skip before decode)
      assert(plan.contains("PartitionFilters: [") && plan.contains("event_type"), plan)
      assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(value"), plan)
      val direct = events.where(col("event_type") === "purchase" && col("value") >= 50.0)
      assert(one.count() == direct.count() && direct.count() > 0)
      // full-row fidelity through the format hop, timestamps included
      val cols = events.columns.toSeq
      assert(one.select(cols.map(col): _*).orderBy("event_id").collect().toSeq ==
        direct.select(cols.map(col): _*).orderBy("event_id").collect().toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
