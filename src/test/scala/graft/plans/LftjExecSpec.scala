package graft.plans

import graft.SparkSpecBase
import graft.sources.Tables
import graft.wcoj.{Lftj, Wcoj}

class LftjExecSpec extends SparkSpecBase {
  import spark.implicits._

  private val tri = Seq(("a", "b"), ("b", "c"), ("c", "a"))
  private val order = Seq("a", "b", "c")

  test("custom physical operator appears in the plan") {
    val df = LftjExec.enumerate(Tables.edges(spark, sfDir), tri, order)
    assert(df.queryExecution.executedPlan.toString().contains("LftjExecNode"))
  }

  test("physical-operator enumeration equals the mapPartitions path") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 3L),
      (1L, 4L), (2L, 2L), (6L, 1L)).toDF("src", "dst")
    val viaExec = LftjExec.enumerate(edges, tri, order, cubeSide = 2)
      .collect().map(_.toSeq).toSet
    val viaMapPartitions = Lftj.enumerate(edges, tri, order, cubeSide = 2)
      .collect().map(_.toSeq).toSet
    assert(viaExec == viaMapPartitions && viaExec.nonEmpty)
  }

  test("physical operator composes with downstream aggregation") {
    val e = Tables.edges(spark, sfDir)
    val viaExec = LftjExec.enumerate(e, tri, order)
      .groupBy().count().head().getLong(0)
    val oriented = Wcoj.triangleCount(e).head().getLong(0)
    assert(viaExec == oriented)
  }
}
