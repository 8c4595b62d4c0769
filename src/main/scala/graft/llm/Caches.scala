package graft.llm

import org.apache.spark.sql.DataFrame

/** Registry of persisted multi-consumer intermediates created by the llm
  * library operators (tokenizations, MinHash/SimHash signatures, corpus
  * stats). The operators return DataFrames lazily, so they cannot unpersist
  * their own caches — the cache must outlive the method and die with the
  * caller's action instead.
  *
  * Two consumption conventions:
  *  - The query driver (Verify/Bench) calls `spark.catalog.clearCache()`
  *    between queries — it never needs this registry.
  *  - Direct library callers call [[Caches.release]] once the actions on
  *    the returned DataFrames complete; otherwise repeated calls in a
  *    long-lived session accumulate cached lineages for the life of the JVM.
  */
object Caches {
  private val registered = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` at MEMORY_AND_DISK and remember it for [[release]]. */
  private[llm] def track(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    registered += p
    p
  }

  /** Unpersist every intermediate the library persisted since the last
    * release. Safe at any time: an unpersisted plan silently recomputes. */
  def release(): Unit = synchronized {
    registered.foreach(_.unpersist(blocking = false))
    registered.clear()
  }
}
