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

  /** The path's filesystem with client-side checksumming unwrapped:
    * LocalFileSystem maintains a `.crc` sibling per file, which litters
    * task trees/index dirs with noise files and can throw on
    * read-while-write (the status tailer); these are driver-side
    * METADATA writes where the raw store's own integrity is the
    * contract (HDFS checksums server-side; object stores have ETags).
    * Non-checksummed filesystems pass through untouched. */
  private def fsOf(p: Path): FileSystem =
    p.getFileSystem(hadoopConf) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case f => f
    }

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

  /** Child DIRECTORY names of `dir`, empty when absent — the field-store
    * listing shape (a parquet field dataset is a directory; stray files
    * like _SUCCESS markers must not read as fields). */
  def listDirNames(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = fsOf(p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  def isDirectory(path: String): Boolean = {
    val p = new Path(path)
    val fs = fsOf(p)
    fs.exists(p) && fs.getFileStatus(p).isDirectory
  }

  /** Every file named `name` under `root`, recursively, path-sorted —
    * the task-tree discovery walk. Task trees are small by construction
    * (human-curated directories), so a driver-side recursive listing is
    * the right shape; this is never a data-directory scan. */
  def findFilesNamed(root: String, name: String): Seq[Path] = {
    val r = new Path(root)
    val fs = fsOf(r)
    def walk(d: Path): Seq[Path] =
      if (!fs.exists(d)) Seq.empty
      else fs.listStatus(d).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName == name) Seq(st.getPath)
        else Seq.empty
      }
    walk(r).sortBy(_.toString)
  }

  // ---- path algebra for the orchestration tier ----------------------
  //
  // Task trees address their artifacts by Hadoop Path so the SAME tree
  // layout works on local disk, HDFS, or an object store. The canonical
  // form deliberately PRESERVES the caller's scheme spelling (never
  // auto-qualifies against fs.defaultFS): printed task paths match what
  // the operator typed, and golden transcripts stay byte-stable. The
  // flip side is documented: one tree must be addressed in ONE spelling
  // per session — "/x" and "file:/x" name two distinct Task objects,
  // exactly like two symlinked spellings under java.nio did.

  /** Canonical task path: absolute (a scheme-less relative path resolves
    * against the process working directory), `.`/`..` segments removed,
    * scheme/authority preserved verbatim. */
  def canon(p: Path): Path = {
    val u = p.toUri
    val abs =
      if (u.getScheme != null || p.isAbsolute) p
      else new Path(new Path(System.getProperty("user.dir")), p)
    val au = abs.toUri
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    au.getPath.split("/").foreach {
      case "" | "." => ()
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case s => out += s
    }
    val prefix = Option(au.getScheme).map(_ + ":").getOrElse("") +
      Option(au.getAuthority).map("//" + _).getOrElse("")
    new Path(prefix + "/" + out.mkString("/"))
  }

  def canon(s: String): Path = canon(new Path(s))

  /** Resolve `child` against `base`: absolute or scheme-qualified child
    * stands alone; a relative child joins under `base`. */
  def resolve(base: Path, child: String): Path = {
    val c = new Path(child)
    if (c.toUri.getScheme != null || c.isAbsolute) canon(c)
    else canon(new Path(base, child))
  }

  /** `p` rendered relative to `root` ("" when equal); `p` must be equal
    * to or under `root` (both canonical). */
  def relativize(root: Path, p: Path): String = {
    val r = root.toString
    val s = p.toString
    if (s == r) ""
    else if (s.startsWith(r + "/")) s.substring(r.length + 1)
    else throw new IllegalArgumentException(s"$p is not under $root")
  }

  /** True when `p` equals `root` or sits under it (both canonical). */
  def isUnder(root: Path, p: Path): Boolean =
    p.toString == root.toString || p.toString.startsWith(root.toString + "/")

  /** `p` fully qualified against its filesystem (scheme + authority
    * added) — the spelling listStatus results carry. */
  def qualified(p: Path): Path = fsOf(p).makeQualified(p)

  /** Re-spell `p` (a listing result, fs-qualified) as a child of `root`
    * (the CALLER's spelling): discovery must hand back paths that
    * compare equal to what the caller would construct, or scheme-less
    * and scheme-qualified addressing of the same tree would mix. */
  def rebase(root: Path, p: Path): Path = {
    val q = qualified(root).toString
    val s = p.toString
    if (s == q || s == root.toString) root
    else if (s.startsWith(q + "/")) new Path(root, s.substring(q.length + 1))
    else if (s.startsWith(root.toString + "/")) p
    else throw new IllegalArgumentException(s"$p is not under $root")
  }

  // ---- status-log streaming ------------------------------------------

  /** An open, flushed-per-write append sink (the status log's shape:
    * one long-lived stream, hflush after every event so tailing readers
    * see complete lines promptly — per-event open/append round-trips
    * would be 2 metadata RPCs per event on a remote store, and plain
    * append() is unsupported on LocalFileSystem and S3A anyway). */
  final class AppendSink private[SidecarFs] (path: Path) {
    private val out = {
      val fs = fsOf(path)
      Option(path.getParent).foreach(fs.mkdirs)
      fs.create(path, true)
    }
    def append(line: String): Unit = {
      out.write(line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.hflush()
    }
    def close(): Unit = out.close()
  }

  def createAppendSink(path: String): AppendSink =
    new AppendSink(new Path(path))

  /** Current byte length of `path`, -1 when absent (tailer polling). */
  def length(path: String): Long = {
    val p = new Path(path)
    val fs = fsOf(p)
    if (!fs.exists(p)) -1L else fs.getFileStatus(p).getLen
  }

  /** Bytes of `path` from `offset` (exclusive of anything written after
    * the corresponding [[length]] call) — the tailer's incremental read. */
  def readBytesFrom(path: String, offset: Long, len: Long): Array[Byte] = {
    val p = new Path(path)
    val in = fsOf(p).open(p)
    try {
      in.seek(offset)
      val buf = new Array[Byte](len.toInt)
      var done = 0
      while (done < buf.length) {
        val n = in.read(buf, done, buf.length - done)
        if (n < 0) return buf.take(done)
        done += n
      }
      buf
    } finally in.close()
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
