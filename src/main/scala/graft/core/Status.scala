package graft.core

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

/** Append-only JSONL status event log with overwritable intermediates and
  * derived (nested) scopes.
  *
  * Counterpart of the reference's JSON status files
  * (repype/status.py:39-207): `update` appends an event; an `intermediate`
  * event is replaced by the next event in the same scope (progress lines);
  * `derive` opens a nested scope linked from the parent (the reference links
  * child files via `expand` entries — here children share one flat JSONL,
  * carrying their scope id, which readers tail by offset instead of a
  * watchdog; SURVEY.md §7.4 risk 4).
  */
final class Status private (val path: Path, val scopeId: String,
                            root: Status.Root) {

  /** Append an event; when `intermediate`, the next event in this scope
    * overwrites it in renderers (the JSONL keeps both, flagged). */
  def update(fields: Map[String, Any], intermediate: Boolean = false): Unit = {
    val event = fields ++ Map(
      "scope" -> scopeId,
      "seq" -> root.nextSeq(),
      "intermediate" -> intermediate)
    root.append(Json.canonical(Config.plain(event)))
  }

  /** Nested child scope (repype/status.py:120-143). */
  def derive(): Status = {
    val child = new Status(path, s"$scopeId/${root.nextSeq()}", root)
    update(Map("expand" -> child.scopeId))
    child
  }

  /** Progress wrapper (repype/status.py:167-206): emits fractional progress
    * intermediates around an iterable, cleared on exit. */
  def progress[T](items: Seq[T], details: String = ""): Iterator[T] = {
    val n = items.length
    items.iterator.zipWithIndex.map { case (item, i) =>
      update(Map("info" -> "progress", "details" -> details,
        "progress" -> (if (n == 0) 1.0 else i.toDouble / n),
        "step" -> i.toLong, "max_steps" -> n.toLong), intermediate = true)
      if (i == n - 1)
        update(Map("info" -> "progress-done", "details" -> details))
      item
    }
  }
}

object Status {

  private[core] final class Root(path: Path) {
    private val seq = new java.util.concurrent.atomic.AtomicLong(0)
    def nextSeq(): Long = seq.getAndIncrement()
    def append(line: String): Unit = synchronized {
      Files.write(path, (line + "\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** Create a status log at `path` (a JSONL file; repype/status.py:209-230
    * creates a temp dir of JSON files — one flat file is the Spark-side
    * equivalent). */
  def create(path: Path): Status = {
    Option(path.getParent).foreach(Files.createDirectories(_))
    if (Files.exists(path)) Files.delete(path)
    new Status(path, "0", new Root(path))
  }

  def createTemp(): Status =
    create(Files.createTempDirectory("graft-status").resolve("status.jsonl"))

  /** Read all events back (driver-side tailing; repype/status.py:391-632's
    * watchdog reader reduced to offset reads). */
  def readEvents(path: Path): Seq[Map[String, Any]] =
    if (!Files.exists(path)) Seq.empty
    else Files.readAllLines(path).asScala.toSeq
      .filter(_.nonEmpty).map(Json.parseJson)

  /** Render events as indented console lines — the reference CLI renderer's
    * format contract (repype/cli.py:21-245): indentation follows scope
    * nesting; non-intermediate events print one line each; intermediate
    * events only materialize if they are the last event (in-flight). */
  def render(events: Seq[Map[String, Any]]): String = {
    val lines = events.zipWithIndex.collect {
      case (e, i) if e.get("intermediate") != Some(true) || i == events.length - 1 =>
        val depth = String.valueOf(e.getOrElse("scope", "0")).count(_ == '/')
        val info = String.valueOf(e.getOrElse("info", ""))
        val detail = Seq("task", "stage", "input_id", "details", "pickup")
          .flatMap(k => e.get(k).filter(_ != null).map(v => s"$k=$v"))
        "  " * depth + (info +: detail).mkString(" ")
    }
    lines.mkString("\n")
  }
}
