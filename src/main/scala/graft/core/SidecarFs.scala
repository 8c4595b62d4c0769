package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** Driver-side sidecar I/O for the persisted-index lifecycle (manifest
  * pointers, ingest commit markers, keyed-file moves, compaction
  * listings) routed through the Hadoop FileSystem API, so the lifecycle
  * runs wherever the index DATA lives — local disk, HDFS, or an object
  * store — instead of silently assuming a POSIX filesystem the way the
  * original `java.nio.file` implementation did. The Hadoop conf comes
  * from the active Spark session (credentials, fs.defaultFS, per-bucket
  * settings all inherited), falling back to a bare `Configuration` for
  * session-less unit contexts; scheme-less paths resolve against
  * `fs.defaultFS` exactly like Spark's own reads of the same index.
  *
  * Atomicity contract (manifest publish / stream-id mint): temp file +
  * [[renameOverwrite]]. On HDFS and local FS the overwrite rename is
  * atomic (`FileContext.rename(OVERWRITE)`); on S3A — where rename is
  * copy+delete and no AbstractFileSystem binding may exist — the
  * fallback is delete+rename of a single small object, which leaves a
  * read-absent window but never a torn read (S3 PUTs are atomic
  * per-object, and every reader treats an absent manifest as
  * "pre-versioning layout", the safe fallback). One maintenance writer
  * per index is already the lifecycle's contract, so last-writer-wins
  * suffices.
  *
  * These are METADATA operations — a handful of round-trips per
  * append/compaction cycle, never per row — so per-call FileSystem
  * resolution (cached by scheme+authority inside Hadoop) is fine.
  */
object SidecarFs {

  /** The session's Hadoop conf when a session is up (the normal case —
    * every lifecycle entry point takes or derives a SparkSession), else
    * a default conf (unit tests of pure path logic). */
  def hadoopConf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fsOf(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  def exists(path: String): Boolean = {
    val p = new Path(path)
    fsOf(p).exists(p)
  }

  /** File contents as UTF-8, None when absent. */
  def readString(path: String): Option[String] = {
    val p = new Path(path)
    val fs = fsOf(p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** Write `body` to a same-directory temp file, then swap it live with
    * [[renameOverwrite]] — the single-pointer-write publication shape
    * (see the atomicity contract above). */
  def writeStringAtomic(path: String, body: String): Unit = {
    val p = new Path(path)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val fs = fsOf(p)
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    renameOverwrite(tmp.toString, path)
  }

  /** Rename `src` over `dst`, replacing it. Atomic where the store can
    * express it (FileContext OVERWRITE on HDFS/local); delete+rename
    * fallback where no AbstractFileSystem binding exists. */
  def renameOverwrite(src: String, dst: String): Unit = {
    val s = new Path(src)
    val d = new Path(dst)
    val fs = fsOf(d)
    try {
      val fc = FileContext.getFileContext(fs.getUri, hadoopConf)
      fc.rename(fs.makeQualified(s), fs.makeQualified(d),
        Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        fs.delete(d, false)
        if (!fs.rename(s, d))
          throw new java.io.IOException(s"rename $src -> $dst failed")
    }
  }

  /** Child entry NAMES of `dir` (files and subdirs), empty when absent. */
  def listNames(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = fsOf(p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  def mkdirs(dir: String): Unit = {
    val p = new Path(dir)
    fsOf(p).mkdirs(p)
  }

  /** Create (or truncate) an empty file — the commit-marker write. */
  def createMarker(path: String): Unit = {
    val p = new Path(path)
    fsOf(p).create(p, true).close()
  }

  /** Delete a single file if present (false when absent). */
  def deleteFile(path: String): Boolean = {
    val p = new Path(path)
    fsOf(p).delete(p, false)
  }

  /** Recursive delete; missing paths are a no-op. */
  def deleteTree(path: String): Unit = {
    val p = new Path(path)
    fsOf(p).delete(p, true)
  }
}
