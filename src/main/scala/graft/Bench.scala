package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query on
  * SPARK_GRAFT_SF_DIR and prints exactly one JSON line. Failures are
  * reported per-query in an "errors" object — never swallowed. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up so session/codegen/IO startup isn't billed to whichever
    // query happens to run first: one pass over each base table
    spark.range(1000).selectExpr("sum(id)").collect()
    for (t <- Seq("lineitem", "orders", "customer", "events", "documents", "embeddings"))
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case scala.util.control.NonFatal(_) => () }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // deterministic order for cross-round comparability; each query is
    // timed twice and the min reported — the host shows ~2.4x run-to-run
    // noise (BASELINE.md), and min-of-2 is the standard way to read
    // steady-state operator cost through it
    // optional args: bench only the named queries (local iteration aid;
    // the driver passes none and benches everything). `--json-file=PATH`
    // additionally writes the full JSON line to PATH so a truncated
    // stdout capture can never hide per-query entries or the total.
    // `--reps=N` overrides the per-query repetition count (min reported).
    val jsonFile = args.collectFirst { case a if a.startsWith("--json-file=") =>
      a.stripPrefix("--json-file=") }
    val reps = args.collectFirst { case a if a.startsWith("--reps=") =>
      a.stripPrefix("--reps=").toInt }.getOrElse(2)
    val hashReps = args.collectFirst { case a if a.startsWith("--hash-reps=") =>
      a.stripPrefix("--hash-reps=").toInt }.getOrElse(1)
    val queryArgs = args.filterNot(_.startsWith("--"))
    val wanted = SparkEntry.queries.toSeq
      .filter(q => queryArgs.isEmpty || queryArgs.contains(q._1))
    val results = wanted.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        // release TRACKED operator-internal persists so no query is timed
        // against another query's intermediate state. Deliberately NOT a
        // blanket clearCache: the fixed-size example-graph dimensions
        // (SparkEntry.refGraph) are process constants — re-deriving them
        // per rep rebuilds their InMemoryRelation, which invalidates every
        // generated codegen unit referencing it and times the ~80-stage
        // example plans as perpetual cold starts instead of steady state.
        CacheRegistry.unpersistAll()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case scala.util.control.NonFatal(e) =>
          errors(name) = s"${e.getClass.getSimpleName}: ${e.getMessage}" }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    // second pass — FULL-EVALUATION timing: aggregate a hash of EVERY
    // output column instead of count(), so Catalyst cannot prune computed
    // columns nothing consumes. For entries whose columns already feed a
    // filter/join/aggregate (every cqc/door/dedup entry) this matches the
    // count() number; for pure-projection entries (text_quality,
    // text_repetition, langid, tokens) it is the honest cost a consumer
    // that READS the columns would pay (BASELINE.md measurement-semantics
    // caveat). Reported separately so count-mode floors stay comparable
    // across rounds; min-of-`hashReps` (default 1 — the deltas of
    // interest are large against host noise; isolated min-of-3 readings
    // for specific entries live in BASELINE.md).
    val errorsHashed = scala.collection.mutable.LinkedHashMap[String, String]()
    val resultsHashed = wanted.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to hashReps).map { _ =>
        CacheRegistry.unpersistAll()
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          import org.apache.spark.sql.functions.{col, sum, xxhash64}
          // decimal(38,0) reduction: a sum of 64-bit hashes overflows
          // long under ANSI semantics after ~2 rows
          df.select(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)").as("__h"))
            .agg(sum("__h")).collect()
        } catch { case scala.util.control.NonFatal(e) =>
          errorsHashed(name) = s"${e.getClass.getSimpleName}: ${e.getMessage}" }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val qsHashed = resultsHashed.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val errHashedJson = errorsHashed.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalHashed = resultsHashed.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_hashed":$qsHashed,"total_hashed":$totalHashed,"errors":$errJson,"errors_hashed":$errHashedJson,"sf":${jstr(sfDir)}}"""
    println(line)
    jsonFile.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
