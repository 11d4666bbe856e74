package graft.sql

import graft.SparkSpecBase

/** WITH RECURSIVE through the door: Spark 4's UnionLoop executes the
  * fixpoint; the door's contract is guarded fallback — accept the text,
  * never corrupt the recursion. */
class RecursiveSpec extends SparkSpecBase {

  import spark.implicits._

  test("bounded transitive closure matches the hand-computed fixpoint") {
    // 1 -> 2 -> 3 -> 4, plus a cycle 3 -> 1 (the depth bound terminates)
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 1L))
      .toDF("src", "dst").createOrReplaceTempView("rc_edges")
    val sql =
      """WITH RECURSIVE reach AS (
        |  SELECT src, dst, 1 AS depth FROM rc_edges WHERE src = 1
        |  UNION ALL
        |  SELECT r.src, e.dst, r.depth + 1
        |  FROM reach r JOIN rc_edges e ON r.dst = e.src
        |  WHERE r.depth < 3
        |)
        |SELECT src, dst, CAST(min(depth) AS BIGINT) AS min_depth,
        |       CAST(count(*) AS BIGINT) AS n_paths
        |FROM reach GROUP BY src, dst""".stripMargin
    val door = CqcSql.solve(spark, sql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // depth-1: (1,2); depth-2: (1,3); depth-3: (1,4), (1,1)
    assert(door == Set((1L, 2L, 1L, 1L), (1L, 3L, 2L, 1L),
      (1L, 4L, 3L, 1L), (1L, 1L, 3L, 1L)))
    // identical to stock evaluation of the same text
    val stock = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(door == stock)
  }
}
