package graft.llm

import graft.core.{Manifest, SidecarFs}

/** The [[graft.core.Manifest]] version-pointer mechanism bound to the
  * persisted-index lifecycle ([[Dedup.writeMinhashIndex]] /
  * [[Similarity.writeIvfIndex]] / [[Similarity.writeIvfPqIndex]]):
  * compactions write immutable `bands_v3`-style version dirs and publish
  * them through one atomic pointer write, readers resolve at open time,
  * the superseded version survives one cycle for in-flight scans. See
  * the Manifest scaladoc for the full publication/concurrency contract;
  * [[reset]] is the one index-SPECIFIC operation.
  */
object IndexManifest {

  /** See [[graft.core.Manifest.resolve]]. */
  def resolve(indexPath: String, name: String): String =
    Manifest.resolve(indexPath, name)

  /** See [[graft.core.Manifest.nextVersionDir]]. */
  def nextVersionDir(indexPath: String, name: String): String =
    Manifest.nextVersionDir(indexPath, name)

  /** See [[graft.core.Manifest.publish]]. */
  def publish(indexPath: String, name: String, versionDir: String): Unit =
    Manifest.publish(indexPath, name, versionDir)

  /** See [[graft.core.Manifest.publishAll]] — the atomic multi-tier
    * swap used by the measured-rebuild passes. */
  def publishAll(indexPath: String, updates: Map[String, String]): Unit =
    Manifest.publishAll(indexPath, updates)

  /** Reset an index path for a FRESH write (writeMinhashIndex /
    * writeIvfIndex / writeIvfPqIndex over a pre-existing index at
    * `path`): delete the WHOLE index tree. Anything narrower leaves a
    * trap — a stale manifest pointer, a stale ingest commit marker, or
    * (worst) a stale sibling-FLAVOR tier: writing an IVF-PQ index over
    * an old raw-IVF one would leave the old `postings/` dir for
    * ivfTopKIndexed to silently serve the OLD corpus from. The index
    * directory is dedicated to the index by contract, so a fresh write
    * owns all of it. */
  def reset(indexPath: String): Unit =
    SidecarFs.deleteTree(indexPath)
}
