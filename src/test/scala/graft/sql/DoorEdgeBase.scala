package graft.sql

import org.apache.spark.sql.DataFrame

/** The canonical DoorEdge comparison harness (r17 review find — the
  * protocol existed as ~20 per-suite copies): every shape runs
  * direct-eligible, forced-reduced (threshold 0) and stock, compared
  * as multisets; empty results and thrown routes fail the battery.
  * New batteries mix this in; older suites keep their historical
  * copies where they deliberately vary (per-suite thresholds, extra
  * probes) — migrate them here only when touching them anyway. */
trait DoorEdgeBase { self: graft.SparkSpecBase =>

  protected def multiset(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap

  protected def battery(shapes: Seq[(String, String)]): Unit = {
    var bad = 0
    shapes.foreach { case (name, sql) =>
      try {
        val direct = multiset(CqcSql.solve(spark, sql))
        graft.CacheRegistry.unpersistAll()
        spark.conf.set("spark.graft.direct.threshold", "0")
        val reduced =
          try multiset(CqcSql.solve(spark, sql))
          finally spark.conf.unset("spark.graft.direct.threshold")
        graft.CacheRegistry.unpersistAll()
        val stock = multiset(spark.sql(sql))
        if (direct != reduced || direct != stock) {
          System.err.println(s"[$name] MISMATCH sizes direct=${direct.size} reduced=${reduced.size} stock=${stock.size}")
          bad += 1
        } else if (direct.isEmpty) {
          System.err.println(s"[$name] EMPTY result — shape exercises nothing")
          bad += 1
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[$name] THREW ${e.getClass.getSimpleName}: ${e.getMessage}")
          bad += 1
      }
    }
    assert(bad == 0, s"$bad shapes disagreed between routes (or went empty)")
  }
}
