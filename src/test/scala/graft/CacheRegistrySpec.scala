package graft

class CacheRegistrySpec extends SparkSpecBase {

  test("tracked persists are released by unpersistAll") {
    CacheRegistry.unpersistAll() // isolate from other suites
    val p = CacheRegistry.persistTracked(spark.range(100).toDF("x"))
    p.count()
    assert(p.storageLevel.useMemory)
    assert(CacheRegistry.trackedCount == 1)
    CacheRegistry.unpersistAll()
    assert(CacheRegistry.trackedCount == 0)
    assert(!p.storageLevel.useMemory)
  }

  test("operator-internal persists register themselves") {
    CacheRegistry.unpersistAll()
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    graft.wcoj.Wcoj.triangleCount(e).collect()
    assert(CacheRegistry.trackedCount > 0) // the deduped edge set
    CacheRegistry.unpersistAll()
    assert(CacheRegistry.trackedCount == 0)
  }
}
