package graft.sql

import graft.SparkSpecBase

/** LATERAL correlated derived tables through the door: Spark's analyzer
  * decorrelates the per-row subquery; the door's contract is guarded
  * fallback — accept the text, never corrupt the correlation. */
class LateralSpec extends SparkSpecBase {

  import spark.implicits._

  test("correlated LATERAL top-k per group matches the hand result and stock") {
    Seq((1L, "x"), (2L, "y"), (3L, "z"))
      .toDF("gid", "gname").createOrReplaceTempView("lt_groups")
    Seq((1L, 10L, 5.0), (1L, 11L, 9.0), (1L, 12L, 7.0),
        (2L, 20L, 1.0),
        (3L, 30L, 2.0), (3L, 31L, 2.0)) // tie broken by item id
      .toDF("gid", "item", "score").createOrReplaceTempView("lt_items")
    val sql =
      """SELECT g.gid, t.item, t.score
        |FROM lt_groups g, LATERAL (
        |  SELECT item, score FROM lt_items i
        |  WHERE i.gid = g.gid
        |  ORDER BY score DESC, item LIMIT 2
        |) t""".stripMargin
    val door = CqcSql.solve(spark, sql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(door == Set((1L, 11L, 9.0), (1L, 12L, 7.0),
      (2L, 20L, 1.0), (3L, 30L, 2.0), (3L, 31L, 2.0)))
    val stock = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(door == stock)
  }

  test("a group with no lateral rows vanishes (inner semantics, not outer)") {
    Seq((1L, "x"), (9L, "empty"))
      .toDF("gid", "gname").createOrReplaceTempView("lt2_groups")
    Seq((1L, 10L, 5.0))
      .toDF("gid", "item", "score").createOrReplaceTempView("lt2_items")
    val out = CqcSql.solve(spark,
      """SELECT g.gid, t.item
        |FROM lt2_groups g, LATERAL (
        |  SELECT item FROM lt2_items i WHERE i.gid = g.gid LIMIT 1
        |) t""".stripMargin).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L)))
  }
}
