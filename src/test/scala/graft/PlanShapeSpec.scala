package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/**
 * Plan-shape assertions on real (sf0.001) data: the properties that decide
 * whether a query survives a 100x scale-up — broadcastable dims actually
 * broadcast, scans pruned and filtered at the source, no cartesian
 * products in the join queries.
 */
class PlanShapeSpec extends SparkSpecBase {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString()
  }

  test("q3_top broadcasts the customer dimension") {
    assert(plan("q3_top").contains("BroadcastHashJoin"))
  }

  test("q5_join broadcasts dims and has no cartesian product") {
    val p = plan("q5_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q6_filter pushes predicates into the parquet scan") {
    val p = plan("q6_filter")
    assert(p.contains("PushedFilters: [") && p.contains("IsNotNull(l_shipdate)"))
  }

  test("text ops prune the documents scan to (doc_id, text)") {
    val df = datapipe.TextOps.tokenCounts(Tables.documents(spark, sfDir))
    val scan = df.queryExecution.executedPlan.toString()
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang") && !readSchema.contains("source"))
  }

  test("cqc enumeration joins on reduced inputs — no cartesian, no collect") {
    val p = plan("cqc_path3_deg")
    assert(!p.contains("CartesianProduct"))
  }

  test("ann brute force broadcasts the query side") {
    assert(plan("ann_topk").contains("BroadcastNestedLoopJoin") ||
      plan("ann_topk").contains("BroadcastHashJoin"))
  }
}
