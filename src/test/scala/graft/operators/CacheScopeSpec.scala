package graft.operators

import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

class CacheScopeSpec extends SparkSpec {

  test("unpersistAll evicts every tracked block and is idempotent") {
    val scope = new CacheScope
    val a = scope.persist(spark.range(1000).toDF("id"))
    val b = scope.persist(spark.range(500).toDF("id"))
    a.count(); b.count() // materialize both caches
    assert(a.storageLevel === StorageLevel.MEMORY_AND_DISK)
    assert(b.storageLevel === StorageLevel.MEMORY_AND_DISK)

    scope.unpersistAll(blocking = true)
    assert(a.storageLevel === StorageLevel.NONE)
    assert(b.storageLevel === StorageLevel.NONE)

    // idempotent: a second release is a no-op, not an error
    scope.unpersistAll(blocking = true)
    assert(a.storageLevel === StorageLevel.NONE)

    // the scope is reusable after release
    val c = scope.persist(spark.range(10).toDF("id"))
    c.count()
    assert(c.storageLevel === StorageLevel.MEMORY_AND_DISK)
    scope.unpersistAll(blocking = true)
    assert(c.storageLevel === StorageLevel.NONE)
  }

  test("unmanaged scope keeps Spark's session-lifetime semantics") {
    val df = CacheScope.unmanaged.persist(spark.range(100).toDF("id"))
    df.count()
    CacheScope.unmanaged.unpersistAll(blocking = true)
    assert(df.storageLevel === StorageLevel.MEMORY_AND_DISK) // not tracked, not released
    df.unpersist(blocking = true)
  }
}
