package graft.llm

import graft.core.SidecarFs

/** Version-pointer manifest for persisted index directories (the MinHash
  * and IVF index lifecycles, [[Dedup.writeMinhashIndex]] /
  * [[Similarity.writeIvfIndex]]).
  *
  * Problem: compaction rewrites an index subdir (`bands`, `sigs`,
  * `postings`) wholesale. Swapping the fresh copy in via directory
  * renames has a window where the subdir is absent — a crash mid-swap
  * leaves a broken index, and a concurrent reader sees a hole. Object
  * stores don't even have atomic directory renames.
  *
  * The Iceberg/Delta answer, applied at the smallest useful scale: data
  * directories are IMMUTABLE VERSIONS (`bands_v3`), and a tiny `current`
  * manifest file maps logical names to the live version. Compaction
  * writes a complete new version dir, then publishes it with ONE atomic
  * pointer write (temp file + overwrite rename — atomic on HDFS/local,
  * a single-object swap on stores without atomic rename; see
  * [[graft.core.SidecarFs.renameOverwrite]] for the exact contract).
  * Every reader resolves through the manifest at open time, so it
  * either sees the old complete version or the new complete version —
  * never a hole. The immediately superseded version is RETAINED for one
  * compaction cycle (pruned by the next), so a reader that resolved
  * just before the swap can still finish its scan.
  *
  * All sidecar I/O goes through the Hadoop FileSystem API
  * ([[graft.core.SidecarFs]]) resolved from the session's Hadoop conf,
  * so the lifecycle runs against `file://`, `hdfs://`, or object-store
  * URIs exactly like the Spark reads/writes of the index data itself.
  *
  * Concurrency contract: many readers + one maintenance writer
  * (append/compact) — the manifest write is atomic, but two CONCURRENT
  * compactions of the same index are a caller error (last publish wins;
  * both version dirs remain until pruned).
  *
  * Back-compat: an index written before versioning has plain subdirs and
  * no manifest; `resolve` falls back to the plain name, and the first
  * compaction migrates it to versioned layout.
  *
  * Reference anchor: repype/task.py:280-287 (compute_sha — artifact
  * identity tracked in small sidecar metadata, not directory layout).
  */
object IndexManifest {

  private val ManifestName = "current"

  private def manifestPath(indexPath: String): String =
    s"$indexPath/$ManifestName"

  /** name→dirname map in the manifest (empty when absent). */
  private def readMap(indexPath: String): Map[String, String] =
    SidecarFs.readString(manifestPath(indexPath)).toSeq
      .flatMap(_.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
        .flatMap { line =>
          val eq = line.indexOf('=')
          if (eq <= 0) None else Some(line.take(eq) -> line.drop(eq + 1))
        }).toMap

  /** Resolve logical subdir `name` of an index to its live ABSOLUTE
    * path: the manifest's entry when present, the plain name otherwise
    * (pre-versioning indexes). */
  def resolve(indexPath: String, name: String): String =
    s"$indexPath/${readMap(indexPath).getOrElse(name, name)}"

  /** A fresh version dirname for `name` (one past the largest existing
    * `name_v<N>` on disk — counting disk, not just the manifest, so an
    * unpublished dir left by a crashed compaction is never reused). */
  def nextVersionDir(indexPath: String, name: String): String = {
    val re = (java.util.regex.Pattern.quote(name) + "_v(\\d+)").r
    val existing = SidecarFs.listNames(indexPath).collect { case re(n) => n.toInt }
    s"${name}_v${(existing :+ 0).max + 1}"
  }

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

  /** Publish `versionDir` as the live version of `name`: one atomic
    * manifest replace (other names' entries are carried over), then
    * prune every OTHER version of `name` except the one just
    * superseded — the one-cycle grace window for in-flight readers.
    * The superseded dir is pruned by the NEXT publish. */
  def publish(indexPath: String, name: String, versionDir: String): Unit = {
    val prior = readMap(indexPath)
    val superseded = prior.getOrElse(name, name)
    val next = prior + (name -> versionDir)
    val body = next.toSeq.sorted.map { case (k, v) => s"$k=$v" }
      .mkString("", "\n", "\n")
    SidecarFs.writeStringAtomic(manifestPath(indexPath), body)
    // prune stale versions: everything matching `name` or `name_v*`
    // that is neither the new live dir nor its immediate predecessor
    val re = (java.util.regex.Pattern.quote(name) + "(_v\\d+)?").r
    val stale = SidecarFs.listNames(indexPath).filter {
      case d @ re(_*) => d != versionDir && d != superseded
      case _ => false
    }
    stale.foreach(d => SidecarFs.deleteTree(s"$indexPath/$d"))
  }
}
