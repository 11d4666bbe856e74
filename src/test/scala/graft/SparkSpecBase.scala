package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM, forked by sbt). */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterEach {

  /** Release TRACKED operator persists between tests — the same hygiene
    * Verify/Bench apply per query. Operators that hold a tracked persist
    * in a returned frame's lineage (e.g. Prep.keptCorpus's staged
    * barrier) document this as their caller contract; without it a long
    * suite accumulates InMemoryRelations. Process-level constants
    * (SparkEntry.refGraph) are deliberately NOT tracked and survive. */
  override protected def afterEach(): Unit = {
    CacheRegistry.unpersistAll()
    super.afterEach()
  }
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.warehouse.dir", "/tmp/graft_spec_warehouse")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Smallest driver-generated scale factor — fast enough for specs. */
  val sfDir = "/root/testdata/sf0.001"
}
