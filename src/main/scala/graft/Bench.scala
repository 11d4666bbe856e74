package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query on
  * SPARK_GRAFT_SF_DIR and prints a full per-query JSON line followed by
  * a compact labeled SUMMARY JSON line. Failures are reported per-query
  * in an "errors" object — never swallowed.
  *
  * Two timing modes, INTERLEAVED per query at run time (r14: count and
  * hashed reps alternate within each query's block so a host load burst
  * hits both modes of the same entries equally, instead of
  * contaminating one whole mode) but reported as SEPARATE labeled
  * sections with per-mode min-of-N (never mixed — comparing a hashed
  * number against a count-mode floor manufactures fake regressions on
  * projection-heavy entries; see BASELINE.md measurement-semantics
  * caveat):
  *  - COUNT mode: `.count()` per query — comparable to every floor
  *    recorded since r3.
  *  - HASHED mode: aggregate a hash of EVERY output column, so Catalyst
  *    cannot prune computed columns nothing consumes — the honest cost a
  *    consumer that READS the columns would pay.
  *
  * The harness that consumes this output keeps only a bounded stdout
  * tail, so the LAST line printed is a self-contained summary under 2 KB:
  * per-mode totals, rep counts, error counts, and the slowest entries
  * per mode. The full per-query dicts are the line above it and are also
  * written to `bench_full.json` (or `--json-file=PATH`).
  */
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
    // default WARN; SPARK_GRAFT_LOG=INFO exposes per-stage timings for
    // local profiling (guide §1 — the UI is disabled here, the
    // DAGScheduler lines are the stage-time source)
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
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
    // optional args: bench only the named queries (local iteration aid;
    // the driver passes none and benches everything). `--json-file=PATH`
    // additionally writes the full JSON line to PATH. `--reps=N` /
    // `--hash-reps=N` override the per-mode repetition counts (min
    // reported; the host shows ~2.4x run-to-run noise per BASELINE.md,
    // and min-of-N is the standard way to read steady-state cost
    // through it). `--count-only` skips the hashed pass entirely (fast
    // local iteration).
    val jsonFile = args.collectFirst { case a if a.startsWith("--json-file=") =>
      a.stripPrefix("--json-file=") }
    val reps = args.collectFirst { case a if a.startsWith("--reps=") =>
      a.stripPrefix("--reps=").toInt }.getOrElse(2)
    val hashReps = args.collectFirst { case a if a.startsWith("--hash-reps=") =>
      a.stripPrefix("--hash-reps=").toInt }.getOrElse(2)
    // --hash-reps=0 means the same thing as --count-only; without the
    // guard the interleaved loop would record NaN hashed minima and
    // serialize literal NaN into the JSON (r14 review fix)
    val countOnly = args.contains("--count-only") || hashReps <= 0
    val queryArgs = args.filterNot(_.startsWith("--"))
    val wanted = SparkEntry.queries.toSeq
      .filter(q => queryArgs.isEmpty || queryArgs.contains(q._1))
      .sortBy(_._1)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val errorsHashed = scala.collection.mutable.LinkedHashMap[String, String]()
    // INTERLEAVED per-query timing (r14): count and hashed reps run
    // back-to-back for EACH query, alternating modes within the query's
    // block, so both modes share that query's host conditions. The old
    // two-full-pass layout let a single load burst contaminate one
    // entire mode (r13: 38 hashed-only >2x readings whose count twins
    // sat at floor; r12 had the mirror image in count) — under
    // interleaving a hot host inflates both modes of the same entries
    // equally, so a one-mode spike is self-evidently noise and the
    // per-mode floors keep their gating power. Still min-of-N per mode;
    // modes are never mixed in the reported numbers.
    def timeCount(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
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
    // HASHED mode — FULL-EVALUATION timing: aggregate a hash of EVERY
    // output column instead of count(). For entries whose columns
    // already feed a filter/join/aggregate (every cqc/door/dedup entry)
    // this matches the count() number; for pure-projection entries
    // (text_quality, text_repetition, langid, tokens) it is the honest
    // full-read cost.
    def timeHashed(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
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
    val timed = wanted.map { case (name, fn) =>
      val maxReps = math.max(reps, if (countOnly) 0 else hashReps)
      val countTimes = scala.collection.mutable.ArrayBuffer[Double]()
      val hashTimes = scala.collection.mutable.ArrayBuffer[Double]()
      for (rep <- 1 to maxReps) {
        if (rep <= reps) countTimes += timeCount(name, fn)
        if (!countOnly && rep <= hashReps) hashTimes += timeHashed(name, fn)
      }
      (name, countTimes.min, if (hashTimes.isEmpty) Double.NaN else hashTimes.min)
    }
    val results = timed.map { case (n, c, _) => n -> c }
    val resultsHashed = if (countOnly) Seq.empty[(String, Double)]
      else timed.map { case (n, _, h) => n -> h }
    def dict(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    // locale-proof 2-decimal rounding: Double.toString always uses '.',
    // while the f"" interpolator follows the default locale (a comma-
    // decimal locale would emit invalid JSON and break the re-parse)
    def r2(v: Double): String = (math.round(v * 100) / 100.0).toString
    def dict2(rs: Seq[(String, Double)]): String = // 2-decimal, for the summary
      rs.map { case (k, v) => jstr(k) + ":" + r2(v) }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val errHashedJson = errorsHashed.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalHashed = resultsHashed.map(_._2).sum
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","mode":"count","reps":$reps,"queries":${dict(results)},"errors":$errJson,"hashed":{"mode":"full-evaluation","reps":$hashReps,"total":$totalHashed,"queries":${dict(resultsHashed)},"errors":$errHashedJson},"sf":${jstr(sfDir)}}"""
    // full line first (file + stdout), compact labeled summary LAST so a
    // bounded stdout tail always contains one complete, parseable,
    // mode-labeled record
    println(fullLine)
    // default dump file only for FULL sweeps: a targeted local run
    // (named queries) must not clobber a full-sweep record that floor
    // merges consume
    val outPath = jsonFile.orElse(
      if (queryArgs.isEmpty) Some("bench_full.json") else None)
    outPath.foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val slowN = 10
    val summary = s"""{"metric":"total","value":$total,"unit":"sec","mode":"count","n":${results.size},"reps_count":$reps,"reps_hashed":$hashReps,"total_count_mode":${r2(total)},"total_hashed_mode":${r2(totalHashed)},"n_errors":${errors.size},"n_errors_hashed":${errorsHashed.size},"slowest_count":${dict2(results.sortBy(-_._2).take(slowN))},"slowest_hashed":${dict2(resultsHashed.sortBy(-_._2).take(slowN))},"note":"per-mode min-of-N; count mode comparable to BASELINE.md floors, hashed forces full column evaluation -- compare mode-to-mode only","full_json":${jstr(outPath.getOrElse("(not written)"))},"sf":${jstr(sfDir)}}"""
    println(summary)
    spark.stop()
  }
}
