package graft.llm

import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

/** Session scoping of the library cache registry: one session's release
  * must not evict another session's persisted intermediates (the round-5
  * hygiene finding — a JVM-global registry let concurrent sessions force
  * each other into silent recompute). */
class CachesSpec extends SparkSpec {

  test("release() evicts only the active session's tracked caches") {
    val sessionA = SparkSpec.spark
    val sessionB = sessionA.newSession()
    import sessionA.implicits._

    val dfA = Caches.track(Seq(1, 2, 3).toDF("a"))
    val dfB = {
      import sessionB.implicits._
      Caches.track(Seq(4, 5, 6).toDF("b"))
    }
    assert(dfA.storageLevel != StorageLevel.NONE)
    assert(dfB.storageLevel != StorageLevel.NONE)

    Caches.release(sessionA)
    assert(dfA.storageLevel == StorageLevel.NONE,
      "session A's cache should be released")
    assert(dfB.storageLevel != StorageLevel.NONE,
      "session B's cache must survive session A's release")

    Caches.release(sessionB)
    assert(dfB.storageLevel == StorageLevel.NONE)
  }

  test("release is idempotent and safe with nothing tracked") {
    Caches.release(SparkSpec.spark)
    Caches.release(SparkSpec.spark)
  }
}
