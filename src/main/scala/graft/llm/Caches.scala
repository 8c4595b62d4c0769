package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of persisted multi-consumer intermediates created by the llm
  * library operators (tokenizations, MinHash/SimHash signatures, corpus
  * stats). The operators return DataFrames lazily, so they cannot unpersist
  * their own caches — the cache must outlive the method and die with the
  * caller's action instead.
  *
  * The registry is keyed BY SESSION: two SparkSessions sharing a JVM (a
  * notebook server, concurrent tasks) each see only their own
  * intermediates, so one caller's [[Caches.release]] can never evict
  * another session's persisted plans into silent recompute.
  *
  * Two consumption conventions:
  *  - The query driver (Verify/Bench) calls `spark.catalog.clearCache()`
  *    between queries — it never needs this registry.
  *  - Direct library callers call [[Caches.release]] once the actions on
  *    the returned DataFrames complete; otherwise repeated calls in a
  *    long-lived session accumulate cached lineages for the life of the
  *    session.
  */
object Caches {
  private val registered =
    scala.collection.mutable.Map.empty[SparkSession,
      scala.collection.mutable.ArrayBuffer[DataFrame]]

  /** Persist `df` at MEMORY_AND_DISK and remember it for [[release]]
    * under the session that owns it. */
  private[llm] def track(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    registered.getOrElseUpdate(df.sparkSession,
      scala.collection.mutable.ArrayBuffer.empty) += p
    p
  }

  /** Unpersist every intermediate the library persisted in the ACTIVE
    * session since its last release; other sessions' caches are untouched.
    * Safe at any time: an unpersisted plan silently recomputes. */
  def release(): Unit = release(SparkSession.active)

  /** Unpersist the given session's tracked intermediates. */
  def release(session: SparkSession): Unit = synchronized {
    registered.remove(session).foreach(_.foreach(_.unpersist(blocking = false)))
  }

  /** Run `body` and then unpersist ONLY the intermediates tracked
    * DURING it — the scope for callers that complete every action on
    * the library's returned DataFrames internally (the streaming
    * ingest-loop bodies: one leaked signature cache per micro-batch
    * would grow without bound over a long-running crawl). The caller's
    * pre-existing tracked caches are untouched. Scopes are for
    * sequential use within a session (the ingest loops are — one
    * foreachBatch at a time); concurrent scopes in one session would
    * release each other's additions, which release() also would. */
  private[llm] def scoped[T](session: SparkSession)(body: => T): T = {
    // snapshot by IDENTITY, not by buffer position: a concurrent
    // release() (documented safe at any time) may empty and repopulate
    // the buffer mid-scope, and a length mark would then miss the
    // scope's own additions — re-leaking the per-micro-batch caches
    val before = synchronized {
      registered.get(session)
        .map(buf => buf.map(d => d: AnyRef).toSet).getOrElse(Set.empty)
    }
    try body
    finally {
      val added = synchronized {
        registered.get(session) match {
          case Some(buf) =>
            val a = buf.filterNot(d => before.contains(d)).toList
            buf.filterInPlace(d => before.contains(d))
            a
          case None => Nil
        }
      }
      added.foreach(_.unpersist(blocking = false))
    }
  }
}
