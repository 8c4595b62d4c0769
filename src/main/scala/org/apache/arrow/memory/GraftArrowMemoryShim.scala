package org.apache.arrow.memory

/** Same-package accessor for Arrow's package-private allocator Config
  * (the `org.apache.spark.graftshim.GraftSparkInternals` pattern):
  * `BaseAllocator.configBuilder()` is the published way to plug a
  * custom `AllocationManager.Factory` into a `RootAllocator`, but the
  * `BaseAllocator`/`Config` types themselves are package-private, so
  * the one-line construction lives here. Used only by
  * [[graft.sources.ArrowIo]]'s untrusted-decode allocators. */
object GraftArrowMemoryShim {

  /** A RootAllocator with allocation ceiling `limit` whose buffers come
    * from `factory` instead of the default netty arenas. */
  def cappedAllocator(limit: Long,
                      factory: AllocationManager.Factory): RootAllocator =
    new RootAllocator(BaseAllocator.configBuilder()
      .from(BaseAllocator.defaultConfig())
      .maxAllocation(limit)
      .allocationManagerFactory(factory)
      .build())
}
