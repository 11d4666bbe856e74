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
}
