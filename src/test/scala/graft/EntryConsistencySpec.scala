package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene: Scala Map literals silently keep the LAST duplicate
  * key, so a copy-pasted entry name would shadow an existing query and
  * shrink the driver surface without any compile error (found live in
  * r7: a second pipe_clean hid the first). Pin the source against it,
  * and keep queries/oracleSql in exact 1:1 correspondence. */
class EntryConsistencySpec extends AnyFunSuite {

  test("every query has an oracle and vice versa") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      s"only-in-queries=${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet} " +
        s"only-in-oracle=${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
  }

  test("no duplicate entry keys in the SparkEntry source") {
    val text = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val registered = SparkEntry.queries.keySet ++ SparkEntry.oracleSql.keySet
    val keys = "\"([a-z0-9_]+)\" ->".r.findAllMatchIn(text).map(_.group(1))
      .filter(registered).toSeq
    // each name appears exactly twice: once in queries, once in oracleSql
    val bad = keys.groupBy(identity).filter(_._2.size != 2)
    assert(bad.isEmpty, s"keys not appearing exactly twice: ${bad.keys.toSeq.sorted}")
  }
}
