package graft.core

/** Version-pointer manifest for directories of immutable dataset
  * versions — the publication mechanism shared by the persisted-index
  * lifecycle ([[graft.llm.IndexManifest]] binds it to MinHash/IVF/IVF-PQ
  * indexes) and the task field store ([[Task.store]]).
  *
  * Problem: maintenance rewrites a data subdir (`bands`, `sigs`, a task
  * field) wholesale. Swapping the fresh copy in via directory renames
  * has a window where the subdir is absent — a crash mid-swap leaves a
  * broken store, and a concurrent reader sees a hole. Object stores
  * don't even have atomic directory renames.
  *
  * The Iceberg/Delta answer, applied at the smallest useful scale: data
  * directories are IMMUTABLE VERSIONS (`bands_v3`), and a tiny `current`
  * manifest file maps logical names to the live version. A writer
  * produces a complete new version dir, then publishes it with ONE
  * atomic pointer write (temp file + overwrite rename — atomic on
  * HDFS/local, a single-object swap on stores without atomic rename;
  * see [[SidecarFs.renameOverwrite]] for the exact contract). Every
  * reader resolves through the manifest at open time, so it either sees
  * the old complete version or the new complete version — never a hole.
  * The immediately superseded version is RETAINED for one publish cycle
  * (pruned by the next), so a reader that resolved just before the swap
  * can still finish its scan.
  *
  * Concurrency contract: many readers + one maintenance writer — the
  * manifest write is atomic, but two CONCURRENT publishes under the same
  * root are a caller error (last publish wins; both version dirs remain
  * until pruned).
  *
  * Back-compat: a store written before versioning has plain subdirs and
  * no manifest; `resolve` falls back to the plain name, and the first
  * versioned publish migrates it.
  *
  * Reference anchor: repype/task.py:280-287 (compute_sha — artifact
  * identity tracked in small sidecar metadata, not directory layout).
  */
object Manifest {

  private val ManifestName = "current"

  private def manifestPath(root: String): String = s"$root/$ManifestName"

  /** name→dirname map in the manifest (empty when absent). */
  private[core] def readMap(root: String): Map[String, String] =
    SidecarFs.readString(manifestPath(root)).toSeq
      .flatMap(_.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
        .flatMap { line =>
          val eq = line.indexOf('=')
          if (eq <= 0) None else Some(line.take(eq) -> line.drop(eq + 1))
        }).toMap

  /** Logical names published under `root`: manifest keys plus plain
    * (pre-versioning) subdirs — version dirs themselves never count. */
  def names(root: String): Set[String] = {
    val mapped = readMap(root)
    val versionDirs = mapped.values.toSet
    mapped.keySet ++ SidecarFs.listDirNames(root)
      .filterNot(d => versionDirs.contains(d) || d.matches(".*_v\\d+"))
  }

  /** Resolve logical subdir `name` under `root` to its live ABSOLUTE
    * path: the manifest's entry when present, the plain name otherwise
    * (pre-versioning stores). */
  def resolve(root: String, name: String): String =
    s"$root/${readMap(root).getOrElse(name, name)}"

  /** A fresh version dirname for `name` (one past the largest existing
    * `name_v<N>` on disk — counting disk, not just the manifest, so an
    * unpublished dir left by a crashed writer is never reused). */
  def nextVersionDir(root: String, name: String): String = {
    val re = (java.util.regex.Pattern.quote(name) + "_v(\\d+)").r
    val existing = SidecarFs.listNames(root).collect { case re(n) => n.toInt }
    s"${name}_v${(existing :+ 0).max + 1}"
  }

  /** Publish `versionDir` as the live version of `name`: one atomic
    * manifest replace (other names' entries are carried over), then
    * prune every OTHER version of `name` except the one just
    * superseded — the one-cycle grace window for in-flight readers.
    * The superseded dir is pruned by the NEXT publish. */
  def publish(root: String, name: String, versionDir: String): Unit =
    publishAll(root, Map(name -> versionDir))

  /** Publish SEVERAL names in ONE atomic manifest replace — the
    * multi-tier swap a whole-index rebuild needs (centroids + postings
    * + meta must flip together: a reader resolving between two separate
    * publishes would route new-quantizer cells against old postings).
    * Same per-name pruning and one-cycle grace window as the
    * single-name form. */
  def publishAll(root: String, updates: Map[String, String]): Unit = {
    require(updates.nonEmpty, "publishAll of nothing")
    val prior = readMap(root)
    val superseded = updates.keySet.map(n => prior.getOrElse(n, n))
    val next = prior ++ updates
    val body = next.toSeq.sorted.map { case (k, v) => s"$k=$v" }
      .mkString("", "\n", "\n")
    SidecarFs.writeStringAtomic(manifestPath(root), body)
    // prune stale versions: everything matching an updated `name` or
    // `name_v*` that is neither its new live dir nor its immediate
    // predecessor
    updates.foreach { case (name, versionDir) =>
      val re = (java.util.regex.Pattern.quote(name) + "(_v\\d+)?").r
      val stale = SidecarFs.listNames(root).filter {
        case d @ re(_*) => d != versionDir && !superseded.contains(d)
        case _ => false
      }
      stale.foreach(d => SidecarFs.deleteTree(s"$root/$d"))
    }
  }
}
