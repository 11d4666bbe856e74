package graft

import java.nio.file.Files

/** End-to-end CLI: a reference-style script file (DDL + query) runs
  * through `graft.Cli.main` against the shared spec session. */
class CliSpec extends SparkSpecBase {

  test("Cli runs a DDL + query script file end-to-end") {
    spark.sql("DROP TABLE IF EXISTS cli_lineitem")
    val script =
      s"""CREATE TABLE cli_lineitem USING parquet LOCATION '$sfDir/lineitem.parquet';
         |CREATE OR REPLACE TEMPORARY VIEW cli_edges AS
         |  SELECT DISTINCT l_orderkey % 100 AS src, l_partkey % 100 AS dst
         |  FROM cli_lineitem WHERE l_linenumber = 1;
         |SELECT g1.src AS a, COUNT(*) AS n
         |FROM cli_edges g1, cli_edges g2
         |WHERE g1.dst = g2.src
         |GROUP BY g1.src""".stripMargin
    val f = Files.createTempFile("cli_script", ".sql")
    Files.write(f, script.getBytes)
    // main() picks up the existing spec session via getOrCreate and must
    // not throw; the script door itself is correctness-spec'd in CqcSqlSpec
    Cli.main(Array(f.toString, "5"))
    assert(spark.sql("SELECT COUNT(*) FROM cli_edges").collect().head.getLong(0) > 0)
    spark.sql("DROP TABLE IF EXISTS cli_lineitem")
  }

  test("--emit --output writes the program file; --pair adds the stock twin beside it") {
    // reference parity: sqlplus-cli's -o/--output writes the generated
    // program to a file; the experiment pairing convention puts the
    // stock twin beside it as <stem>SparkSQL.scala
    graft.sources.Tables.edges(spark, sfDir).createOrReplaceTempView("cli_emit_edges")
    val script =
      """SELECT g1.src AS a, COUNT(*) AS n
        |FROM cli_emit_edges g1, cli_emit_edges g2
        |WHERE g1.dst = g2.src
        |GROUP BY g1.src""".stripMargin
    val f = Files.createTempFile("cli_emit", ".sql")
    Files.write(f, script.getBytes)
    val out = Files.createTempDirectory("cli_emit_out").resolve("CliQ.scala")
    Cli.main(Array(f.toString, "--emit", "--pair", s"--output=$out", "--object=CliQ"))
    val prog = new String(Files.readAllBytes(out), "UTF-8")
    assert(prog.contains("object CliQ") && prog.contains("CqcSql.solve"), prog.take(400))
    val twinPath = out.resolveSibling("CliQSparkSQL.scala")
    assert(Files.exists(twinPath), "pair twin must land beside the output file")
    val twin = new String(Files.readAllBytes(twinPath), "UTF-8")
    assert(twin.contains("object CliQSparkSQL") && twin.contains("spark.sql(query)"),
      twin.take(400))
  }

  test("explainScript dry-run names the root, each join edge, and the fast path") {
    graft.sources.Tables.edges(spark, sfDir).createOrReplaceTempView("dr_edges")
    // the sql_cqc_agg_fast text (4-hop factorizable aggregate)
    val dump = graft.sql.CqcSql.explainScript(spark,
      """SELECT g1.src AS src, COUNT(*) AS cnt, SUM(g4.dst) AS sum_dst,
        |       MIN(g4.dst) AS min_dst, MAX(g4.dst) AS max_dst
        |FROM dr_edges g1, dr_edges g2, dr_edges g3, dr_edges g4
        |WHERE g1.dst = g2.src AND g2.dst = g3.src AND g3.dst = g4.src
        |GROUP BY g1.src""".stripMargin)
    assert(dump.contains("(root)"), s"dump must name the root:\n$dump")
    // all four relations appear; three of them hang off a parent edge
    // with the shared join variable listed
    for (r <- Seq("r0", "r1", "r2", "r3")) assert(dump.contains(r), s"missing $r:\n$dump")
    assert(dump.linesIterator.count(_.contains("<- ")) == 3, s"expected 3 edges:\n$dump")
    assert(dump.contains("factorized aggregate fast path"), s"fast path not routed:\n$dump")
    // dry-run over a ranked chain names its routing too
    graft.sources.Tables.ratedEdges(spark, sfDir).createOrReplaceTempView("dr_rated")
    val dump2 = graft.sql.CqcSql.explain(spark,
      """SELECT r.src AS n1, r.dst AS n2, s.dst AS n3, r.rating + s.rating AS total_rank
        |FROM dr_rated r, dr_rated s WHERE r.dst = s.src
        |ORDER BY total_rank DESC, n1 ASC, n2 ASC, n3 ASC LIMIT 5""".stripMargin)
    assert(dump2.contains("ranked chain top-k"), s"rank routing missing:\n$dump2")
  }

  test("reference-style DDL (WITH path properties + constraints) loads verbatim") {
    // the reference's examples ship `CREATE TABLE t (...) WITH ('path' =
    // 'x.dat')` over comma-separated text (sqlplus-core parser/ddl);
    // its parser also accepts PRIMARY KEY constraints — both must load
    // through the script door unchanged
    val dat = Files.createTempFile("ref_edges", ".dat")
    Files.write(dat, "1,2\n2,3\n3,1\n3,4\n".getBytes)
    val script =
      s"""CREATE TABLE RefGraph (
         |    src INT,
         |    dst INT,
         |    PRIMARY KEY (src, dst)
         |) WITH (
         |    'path' = '$dat'
         |);
         |SELECT g1.src AS a, COUNT(*) AS n
         |FROM RefGraph g1, RefGraph g2
         |WHERE g1.dst = g2.src
         |GROUP BY g1.src""".stripMargin
    val got = graft.sql.CqcSql.script(spark, script).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == Set((1, 1), (2, 2), (3, 1)))
  }

  test("script splitter keeps ';' inside string literals intact") {
    val script =
      """CREATE OR REPLACE TEMPORARY VIEW cli_semi AS
        |  SELECT 'a;b' AS s, 1 AS k UNION ALL SELECT 'c''d;e', 2;
        |SELECT s, k FROM cli_semi WHERE s <> 'x;y' ORDER BY k""".stripMargin
    val got = graft.sql.CqcSql.script(spark, script).collect().map(_.toSeq).toSeq
    assert(got == Seq(Seq("a;b", 1), Seq("c'd;e", 2)))
    // an unterminated literal must fail fast, not half-execute
    intercept[IllegalArgumentException] {
      graft.sql.CqcSql.script(spark, "SELECT 'oops; FROM t")
    }
  }

  test("--serve flag parsing: bare, =port, absent") {
    assert(Cli.parseServePort(Array("s.sql", "--serve")) == Some(8090))
    assert(Cli.parseServePort(Array("--serve=7070", "s.sql")) == Some(7070))
    assert(Cli.parseServePort(Array("s.sql", "--dry-run")) == None)
  }
}
