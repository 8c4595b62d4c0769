package graft.core

/** Tiny filesystem helpers shared across the engine (staging dirs,
  * index-compaction swaps, temp-fixture shutdown hooks). */
object Fs {

  /** Recursively delete a directory tree; missing paths are a no-op. */
  def deleteTree(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
  }

  def deleteTree(p: String): Unit = deleteTree(java.nio.file.Paths.get(p))

  /** Recursively copy a directory tree (REPLACE_EXISTING per file). */
  def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val s = Files.walk(src)
    try s.forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    } finally s.close()
  }

  def copyTree(src: String, dst: String): Unit =
    copyTree(java.nio.file.Paths.get(src), java.nio.file.Paths.get(dst))

  /** Fresh per-JVM scratch root under `java.io.tmpdir` (created lazily,
    * deleted on JVM exit): paths derived from it are private to THIS
    * process, so concurrent graft JVMs (a bench run next to a verify
    * run) can never overwrite each other's staged fixtures or
    * persisted-index artifacts mid-read — fixed shared names under
    * tmpdir were a cross-process race. */
  lazy val scratchRoot: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scratch-")
    deleteOnExit(dir, "graft-scratch-cleanup")
    dir.toString
  }

  /** Register a JVM-exit hook deleting `dir` (temp fixture staging). */
  def deleteOnExit(dir: java.nio.file.Path, hookName: String): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try deleteTree(dir)
      catch { case scala.util.control.NonFatal(_) => () }
    }, hookName))
}
