package graft.sql

import graft.SparkSpecBase

/** UNPIVOT through the door: Spark plans the clause as an Expand; the
  * door's contract is guarded fallback — accept the text, reproduce
  * stock exactly, default NULL-value exclusion intact. */
class UnpivotSpec extends SparkSpecBase {

  import spark.implicits._

  test("unpivot matches the hand UNION expansion and stock") {
    Seq(("a", 1.0, 10.0), ("b", 2.0, 20.0)).toDF("g", "m1", "m2")
      .createOrReplaceTempView("unp_t")
    val sql =
      """SELECT g, metric, val FROM unp_t
        |UNPIVOT (val FOR metric IN (m1, m2))""".stripMargin
    val door = CqcSql.solve(spark, sql).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(door == Set(("a", "m1", 1.0), ("a", "m2", 10.0),
      ("b", "m1", 2.0), ("b", "m2", 20.0)))
    assert(door == spark.sql(sql).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet)
  }

  test("unpivot default excludes NULL cells, like the defining UNION with a filter") {
    Seq(("a", Some(1.0), None: Option[Double]), ("b", None: Option[Double], Some(2.0)))
      .toDF("g", "m1", "m2").createOrReplaceTempView("unp_n")
    val sql =
      """SELECT g, metric, val FROM unp_n
        |UNPIVOT (val FOR metric IN (m1, m2))""".stripMargin
    val door = CqcSql.solve(spark, sql).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(door == Set(("a", "m1", 1.0), ("b", "m2", 2.0)))
  }
}
