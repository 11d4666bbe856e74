package graft.sql

import java.nio.file.Files

import graft.SparkSpecBase

/**
 * Calcite-dialect DDL corners through the script door (r8 verdict item
 * 7): the reference's own parser (sqlplus-core parser/SqlPlusParser.java,
 * Lex.JAVA; parser/ddl/SqlCreateTable.java) accepts `IF NOT EXISTS`,
 * quoted identifiers, named/mixed constraint clauses and comments —
 * shapes the r8 translator regex either mis-parsed or crashed on. Every
 * corner here must either load correctly or fall back to stock SQL with
 * the real error; the translator itself must never be the crash.
 */
class DdlCornerSpec extends SparkSpecBase {

  private def dat(rows: String): String = {
    val f = Files.createTempFile("ddl_corner", ".dat")
    Files.write(f, rows.getBytes)
    f.toString
  }

  private val fourEdges = "1,2\n2,3\n3,1\n3,4\n"

  private def degreeQuery(table: String) =
    s"""SELECT g1.src AS a, COUNT(*) AS n
       |FROM $table g1, $table g2
       |WHERE g1.dst = g2.src
       |GROUP BY g1.src""".stripMargin

  private val expected = Set((1, 1L), (2, 2L), (3, 1L))

  private def run(script: String): Set[(Int, Long)] =
    CqcSql.script(spark, script).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet

  test("IF NOT EXISTS loads through the reference-DDL translator") {
    val script =
      s"""CREATE TABLE IF NOT EXISTS CornerA (
         |  src INT, dst INT
         |) WITH ('path' = '${dat(fourEdges)}');
         |${degreeQuery("CornerA")}""".stripMargin
    assert(run(script) == expected)
  }

  test("backtick-quoted table and column names (Lex.JAVA quoting)") {
    val script =
      s"""CREATE TABLE `CornerB` (
         |  `src` INT, `dst` INT
         |) WITH ('path' = '${dat(fourEdges)}');
         |${degreeQuery("CornerB")}""".stripMargin
    assert(run(script) == expected)
  }

  test("double-quoted table and column names") {
    val script =
      s"""CREATE TABLE "CornerC" (
         |  "src" INT, "dst" INT
         |) WITH ('path' = '${dat(fourEdges)}');
         |${degreeQuery("CornerC")}""".stripMargin
    assert(run(script) == expected)
  }

  test("mixed constraint clauses: named CONSTRAINT, inline PRIMARY KEY, UNIQUE") {
    val script =
      s"""CREATE TABLE CornerD (
         |  src INT PRIMARY KEY,
         |  dst INT UNIQUE,
         |  CONSTRAINT pk_d PRIMARY KEY (src, dst),
         |  UNIQUE (dst)
         |) WITH ('path' = '${dat(fourEdges)}');
         |${degreeQuery("CornerD")}""".stripMargin
    assert(run(script) == expected)
  }

  test("custom delimiter property") {
    val script =
      s"""CREATE TABLE CornerE (src INT, dst INT)
         |WITH ('path' = '${dat("1|2\n2|3\n3|1\n3|4\n")}', 'delimiter' = '|');
         |${degreeQuery("CornerE")}""".stripMargin
    assert(run(script) == expected)
  }

  test("comments with semicolons never split statements; hints survive") {
    val script =
      s"""-- leading comment; with a semicolon
         |CREATE TABLE CornerF (src INT, dst INT) -- trailing; comment
         |WITH ('path' = '${dat(fourEdges)}');
         |/* block comment; also with ; semicolons */
         |SELECT /*+ ROOT(g1) */ g1.src AS a, COUNT(*) AS n
         |FROM CornerF g1, CornerF g2
         |WHERE g1.dst = g2.src
         |GROUP BY g1.src""".stripMargin
    assert(run(script) == expected)
  }

  test("statement that is only a comment is dropped, not parsed") {
    val stmts = CqcSql.splitStatements(
      "SELECT 1; -- tail comment only; with semicolon\n/* and; a block */")
    assert(stmts == Seq("SELECT 1"))
  }

  test("hint block comments pass through the splitter intact") {
    val stmts = CqcSql.splitStatements("SELECT /*+ ROOT(g1) */ * FROM t; SELECT 2")
    assert(stmts.head.contains("/*+ ROOT(g1) */"))
  }

  test("unterminated block comment fails fast instead of mis-splitting") {
    intercept[IllegalArgumentException] {
      CqcSql.splitStatements("SELECT 1; /* never closed")
    }
  }

  test("malformed reference DDL falls back to stock SQL (translator never crashes)") {
    // type text Spark's DDL parser rejects: the translator must return
    // false (guarded) and the stock path must surface the real error
    val stmt = s"CREATE TABLE CornerG (src NOTATYPE??, dst INT) WITH ('path' = '${dat(fourEdges)}')"
    assert(!CqcSql.tryRefCreateTable(spark, stmt))
    val e = intercept[Exception] { spark.sql(stmt) }
    assert(e.getMessage != null)
  }

  test("WITH clause without a path is not the reference shape") {
    assert(!CqcSql.tryRefCreateTable(spark,
      "CREATE TABLE CornerH (src INT) WITH ('format' = 'csv')"))
  }
}
