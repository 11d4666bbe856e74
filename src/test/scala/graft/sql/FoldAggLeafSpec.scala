package graft.sql

import graft.SparkSpecBase
import graft.sources.Tables

/** Keyed-aggregate leaf folding ("joint-groupBy degree subqueries"):
  * an Aggregate subquery joined on exactly its full grouping key is
  * multiplicity-neutral under an inner join, so it folds into a host
  * edge relation instead of occupying a join-tree node — the reference
  * examples q3–q7 carry 2–4 such degree subqueries each. These tests
  * pin (a) result identity vs stock, (b) the fold firing in the trace,
  * (c) the guards: partial-key joins, cnt-as-join-var, and an active
  * root pin must all decline the fold. */
class FoldAggLeafSpec extends SparkSpecBase {

  private def view(): Unit =
    Tables.edges(spark, sfDir).createOrReplaceTempView("fold_edges")

  private val q3ish =
    """SELECT g1.src AS src, g1.dst AS via, g2.dst AS dst,
      |       c1.cnt AS cnt1, c2.cnt AS cnt2
      |FROM fold_edges g1, fold_edges g2,
      |     (SELECT src, COUNT(*) AS cnt FROM fold_edges GROUP BY src) AS c1,
      |     (SELECT dst, COUNT(*) AS cnt FROM fold_edges GROUP BY dst) AS c2
      |WHERE g1.dst = g2.src AND c1.src = g1.src AND c2.dst = g2.dst
      |  AND c1.cnt < c2.cnt""".stripMargin

  test("degree subqueries fold into host edges, result identical to stock") {
    view()
    val t = CqcSql.explain(spark, q3ish)
    assert(t.contains("folded keyed aggregate leaves"), t)
    val cols = Seq("src", "via", "dst", "cnt1", "cnt2")
    val mine = CqcSql.solve(spark, q3ish).orderBy(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().toSeq
    val stock = spark.sql(q3ish).orderBy(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().toSeq
    assert(mine == stock)
  }

  test("fold keeps multiplicities: COUNT(*) over the folded join matches stock") {
    view()
    // duplicate edges in the base data (if any) and the N:1 degree join
    // must not change row multiplicity — compare a bare COUNT(*)
    val q =
      """SELECT g1.src AS s, g1.dst AS d, c1.cnt AS cnt
        |FROM fold_edges g1,
        |     (SELECT src, COUNT(*) AS cnt FROM fold_edges GROUP BY src) AS c1
        |WHERE c1.src = g1.dst""".stripMargin
    val mine = CqcSql.solve(spark, q).count()
    val stock = spark.sql(q).count()
    assert(mine == stock)
  }

  test("partial-key join declines the fold (would multiply rows)") {
    view()
    // aggregate grouped by (src, dst) but joined only on src: more than
    // one match per host row is possible — must NOT fold
    val q =
      """SELECT g1.src AS s, c.cnt AS cnt
        |FROM fold_edges g1,
        |     (SELECT src, dst, COUNT(*) AS cnt FROM fold_edges GROUP BY src, dst) AS c
        |WHERE c.src = g1.src""".stripMargin
    val t = CqcSql.explain(spark, q)
    assert(!t.contains("folded keyed aggregate leaves"), t)
    val mine = CqcSql.solve(spark, q).count()
    assert(mine == spark.sql(q).count())
  }

  test("aggregate column used as a join variable declines the fold") {
    view()
    // c.cnt equated cross-leaf makes cnt a join var: shared vars != key
    val q =
      """SELECT g1.src AS s
        |FROM fold_edges g1,
        |     (SELECT src, COUNT(*) AS cnt FROM fold_edges GROUP BY src) AS c
        |WHERE c.src = g1.src AND c.cnt = g1.dst""".stripMargin
    val t = CqcSql.explain(spark, q)
    assert(!t.contains("folded keyed aggregate leaves"), t)
    val mine = CqcSql.solve(spark, q).count()
    assert(mine == spark.sql(q).count())
  }

  test("active root pin disables the fold and the pinned root holds") {
    view()
    // un-pinned inspection shows the FOLDED structure (2 edges, no
    // degree leaves) — the dry-run reflects what enumeration will use
    val rels = CqcSql.relations(spark, q3ish)
    assert(rels.size == 2, rels.map(_.name))
    // pinning r2 (a degree leaf that only exists when the fold is
    // disabled) must keep all four leaves and still tie out
    val pinned = CqcSql.solveWithRoot(spark, q3ish, "r2").count()
    assert(pinned == spark.sql(q3ish).count())
  }

  test("folded enumeration ties out on the reference q5 star shape") {
    view()
    val q =
      """SELECT g2.src, g2.dst
        |FROM fold_edges g1, fold_edges g2, fold_edges g3, fold_edges g4, fold_edges g5,
        |    (SELECT src, COUNT(*) AS cnt FROM fold_edges GROUP BY src) AS c1,
        |    (SELECT src, COUNT(*) AS cnt FROM fold_edges GROUP BY src) AS c2,
        |    (SELECT dst, COUNT(*) AS cnt FROM fold_edges GROUP BY dst) AS c3,
        |    (SELECT dst, COUNT(*) AS cnt FROM fold_edges GROUP BY dst) AS c4
        |WHERE g1.dst = g2.src AND g2.dst = g3.src AND g1.src = c1.src
        |    AND g3.dst = c2.src AND c1.cnt < c2.cnt
        |    AND g4.dst = g2.src AND g2.dst = g5.src AND g4.src = c3.dst
        |    AND g5.dst = c4.dst AND c3.cnt < c4.cnt""".stripMargin
    val t = CqcSql.explain(spark, q)
    assert(t.contains("folded keyed aggregate leaves"), t)
    val mine = CqcSql.solve(spark, q).orderBy("src", "dst").collect().toSeq
    val stock = spark.sql(q).orderBy("src", "dst").collect().toSeq
    assert(mine == stock)
  }
}
