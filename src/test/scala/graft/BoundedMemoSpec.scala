package graft

import graft.ops.BoundedMemo

/** The shared memo lifecycle extracted in r10 (r9 verdict what's-wrong
  * #2 + the NearDup-slot advice): session-reference keying, one frame
  * per (session, kind), rebuild-on-subKey-change, no cross-session
  * eviction. */
class BoundedMemoSpec extends SparkSpec {

  test("same (session, kind, subKey) memoizes; a different subKey rebuilds and replaces") {
    var builds = 0
    def build() = { builds += 1; spark.range(3).toDF("id") }
    val a = BoundedMemo.memo("bmspec-m", spark, "k1")(build())
    val b = BoundedMemo.memo("bmspec-m", spark, "k1")(build())
    assert((a eq b) && builds == 1)
    val c = BoundedMemo.memo("bmspec-m", spark, "k2")(build())
    assert(builds == 2 && !(c eq a))
    // bounded: ONE frame per kind — returning to k1 rebuilds
    BoundedMemo.memo("bmspec-m", spark, "k1")(build())
    assert(builds == 3)
  }

  test("persisted variant persists MEMORY_AND_DISK and unpersists the replaced frame") {
    val a = BoundedMemo.persisted("bmspec-p", spark, "k1")(spark.range(5).toDF("id"))
    a.count()
    assert(a.storageLevel.useMemory && a.storageLevel.useDisk)
    val b = BoundedMemo.persisted("bmspec-p", spark, "k1")(
      fail("memoized build must not re-run"))
    assert(b eq a)
    // replacement unpersists the old frame (advisory, async — the
    // LEVEL marker flips synchronously)
    val c = BoundedMemo.persisted("bmspec-p", spark, "k2")(spark.range(6).toDF("id"))
    assert(!(c eq a))
    assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("two live sessions never evict each other's frames (the identityHashCode-slot fix)") {
    val s2 = spark.newSession()
    val a = BoundedMemo.memo("bmspec-s", spark, "k")(spark.range(1).toDF("id"))
    val b = BoundedMemo.memo("bmspec-s", s2, "k")(s2.range(2).toDF("id"))
    // each session gets ITS frame back, untouched by the other's build
    assert(BoundedMemo.memo("bmspec-s", spark, "k")(fail("evicted")) eq a)
    assert(BoundedMemo.memo("bmspec-s", s2, "k")(fail("evicted")) eq b)
  }
}
