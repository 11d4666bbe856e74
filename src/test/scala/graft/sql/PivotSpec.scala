package graft.sql

import graft.SparkSpecBase

/** PIVOT through the door: Spark's analyzer plans the clause as an
  * Aggregate over pivotfirst; the door's contract is guarded fallback —
  * accept the text, reproduce stock exactly, missing cells null. */
class PivotSpec extends SparkSpecBase {

  import spark.implicits._

  test("pivot matches the hand CASE aggregation and stock, nulls for empty cells") {
    Seq(("a", "x", 1L), ("a", "x", 2L), ("a", "y", 10L), ("b", "y", 5L))
      .toDF("g", "k", "v").createOrReplaceTempView("pv_t")
    val sql =
      """SELECT g, xs, ys FROM (SELECT g, k, v FROM pv_t)
        |PIVOT (SUM(v) FOR k IN ('x' AS xs, 'y' AS ys))""".stripMargin
    val door = CqcSql.solve(spark, sql).collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(door == Set(
      ("a", Some(3L), Some(10L)),
      ("b", None, Some(5L)))) // no 'x' rows for b -> null cell
    val stock = spark.sql(sql).collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(door == stock)
  }
}
