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

  /** Register a JVM-exit hook deleting `dir` (temp fixture staging). */
  def deleteOnExit(dir: java.nio.file.Path, hookName: String): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try deleteTree(dir)
      catch { case scala.util.control.NonFatal(_) => () }
    }, hookName))
}
