package graft.core

import org.apache.hadoop.fs.{Path => HPath}

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
final class Status private (val path: HPath, val scopeId: String,
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

  /** Release the underlying append stream (safe to skip for
    * process-lifetime statuses: every event is hflush'd on write, so
    * readers are complete without a close; closing just frees the
    * handle). */
  def close(): Unit = root.close()

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

  private[core] final class Root(path: HPath) {
    private val seq = new java.util.concurrent.atomic.AtomicLong(0)
    def nextSeq(): Long = seq.getAndIncrement()
    // ONE long-lived sink, hflush per event (SidecarFs.AppendSink):
    // plain per-event append() is unsupported on LocalFileSystem and
    // S3A, and would cost 2 metadata RPCs per event on a remote store
    private lazy val sink = SidecarFs.createAppendSink(path.toString)
    def append(line: String): Unit = synchronized {
      sink.append(line + "\n")
    }
    def close(): Unit = synchronized {
      try sink.close() catch { case _: java.io.IOException => () }
    }
  }

  /** Create a status log at `path` (a JSONL file; repype/status.py:209-230
    * creates a temp dir of JSON files — one flat file is the Spark-side
    * equivalent). */
  def create(path: HPath): Status = {
    Option(path.getParent).foreach(p => SidecarFs.mkdirs(p.toString))
    SidecarFs.deleteFile(path.toString)
    new Status(path, "0", new Root(path))
  }

  def createTemp(): Status = create(new HPath(
    java.nio.file.Files.createTempDirectory("graft-status").toString,
    "status.jsonl"))

  /** Read all events back (driver-side tailing; repype/status.py:391-632's
    * watchdog reader reduced to offset reads). */
  def readEvents(path: HPath): Seq[Map[String, Any]] =
    SidecarFs.readString(path.toString)
      .map(_.split("\n", -1).toSeq.filter(_.nonEmpty).map(Json.parseJson))
      .getOrElse(Seq.empty)

  /** `format_hms` (repype/cli.py:36-44): `mm:ss`, or `h:mm:ss` above one
    * hour. */
  def formatHms(seconds: Double): String = {
    val s0 = math.round(seconds)
    val (h, m, s) = (s0 / 3600, (s0 % 3600) / 60, s0 % 60)
    val ms = f"$m%02d:$s%02d"
    if (h == 0) ms else s"$h:$ms"
  }

  /** Render a full event sequence as the console transcript (the exact
    * bytes a live run prints, carriage returns included) — the non-live
    * entry point over [[ConsoleRenderer]], used post-hoc and in golden
    * transcript tests. */
  def render(events: Seq[Map[String, Any]]): String = {
    val sb = new StringBuilder
    val r = new ConsoleRenderer(sb.append(_))
    events.foreach(r.handle)
    sb.toString
  }
}

/** Stateful console renderer — behavioral counterpart of the reference's
  * `StatusReaderConsoleAdapter` (repype/cli.py:31-245): per-event format
  * strings, indentation = 2 spaces per scope-nesting level, a blank line
  * whenever the indentation level changes, and intermediate events printed
  * with a trailing carriage return and padded by the next line so they are
  * visually overwritten in place (progress lines, stage spinners).
  *
  * Divergence by design: the reference's status store physically replaces
  * intermediates, so its reader can miss them between polls; graft's JSONL
  * keeps every event, so the transcript is deterministic — golden tests can
  * assert the full byte stream.
  */
final class ConsoleRenderer(write: String => Unit, indent: Int = 2,
                            now: () => Long = System.nanoTime,
                            showIntermediate: Boolean = true) {
  private val BarLength = 20
  private var margin: Option[String] = None
  private var intermediateLineLength = 0
  private var progressT0 = 0L

  private def str(e: Map[String, Any], k: String): Option[String] =
    e.get(k).filter(_ != null).map(String.valueOf)
  private def num(e: Map[String, Any], k: String): Option[Long] =
    e.get(k).collect { case n: Long => n; case d: Double => d.toLong }

  /** Pad with spaces so a previously printed `\r` line is fully erased. */
  private def clearLine(line: String): String = {
    val flat = line.replace("\n", " ")
    flat + " " * math.max(0, intermediateLineLength - flat.length)
  }

  /** The reference CLI's per-info format strings (repype/cli.py:162-238).
    * None = event not rendered (e.g. bare `expand` links). */
  private def format(e: Map[String, Any]): Option[String] =
    str(e, "info") match {
      case Some("batch") =>
        val n = e.get("batch") match { case Some(l: Seq[_]) => l.length; case _ => 0 }
        Some(s"\n$n task(s) selected for running")
      case Some("enter") =>
        Some(s"\n(${num(e, "step").getOrElse(0L) + 1}/${num(e, "step_count").getOrElse(0L)})" +
          s" Entering task: ${str(e, "task").getOrElse("")}")
      case Some("start") =>
        Some((str(e, "pickup"), str(e, "first_stage")) match {
          case (None, None) => "Starting from scratch"
          case (pickup, firstStage) =>
            s"Picking up from: ${pickup.getOrElse("")} (${firstStage.getOrElse("copy")})"
        })
      case Some("process") =>
        Some(s"(${num(e, "step").getOrElse(0L) + 1}/${num(e, "step_count").getOrElse(0L)})" +
          s" Processing: ${str(e, "input_id").getOrElse("")}")
      case Some("start-stage") => Some(s"Running stage: ${str(e, "stage").getOrElse("")}")
      case Some("skip-stage") => Some(s"Skipping stage: ${str(e, "stage").getOrElse("")}")
      case Some("storing") => Some("Storing results...")
      case Some("completed") => Some("Results have been stored ✅")
      case Some("interrupted") => Some("🔴 Batch run interrupted")
      case Some("error") =>
        val stagePart = str(e, "stage").map(s => s"""the stage "$s" of """).getOrElse("")
        Some(s"\n🔴 An error occurred while processing ${stagePart}the task " +
          s"${str(e, "task").getOrElse("")}:\n" + "-" * 80 + "\n" +
          str(e, "traceback").getOrElse("") + "\n" + "-" * 80)
      case Some("progress") =>
        val step = num(e, "step").getOrElse(0L)
        val max = math.max(1L, num(e, "max_steps").getOrElse(1L))
        val eta =
          if (step == 0) { progressT0 = now(); "" }
          else {
            val speed = (now() - progressT0) / 1e9 / step
            ", ETA: " + Status.formatHms(speed * (max - step))
          }
        val bar = "=" * ((BarLength * step) / max).toInt
        val pct = f"${100.0 * step / max}%.1f"
        val details = str(e, "details").filter(_.nonEmpty).map(_ + " ").getOrElse("")
        Some(s"$details[${bar + " " * (BarLength - bar.length)}] $pct% ($step / $max$eta)")
      case Some("progress-done") => None // handled in handle(): clears the bar
      case Some(other) => // unknown events: generic "info key=value" line
        val detail = Seq("task", "stage", "input_id", "details", "pickup")
          .flatMap(k => str(e, k).map(v => s"$k=$v"))
        Some((other +: detail).mkString(" "))
      case None => None // bare expand links carry no renderable text
    }

  /** Indentation + margin-change blank line + clear-padding
    * (repype/cli.py:131-156). */
  private def fullFormat(e: Map[String, Any], text: String): String = {
    val depth = String.valueOf(e.getOrElse("scope", "0")).count(_ == '/')
    val m = " " * (indent * depth)
    val withBreak =
      if (margin.exists(_ != m) && text.split("\n", -1).head.trim.nonEmpty) "\n" + text
      else text
    margin = Some(m)
    val lines = withBreak.split("\n", -1).map(m + _)
    lines(0) = clearLine(lines(0))
    lines.mkString("\n")
  }

  def handle(e: Map[String, Any]): Unit = {
    val intermediate = e.get("intermediate").contains(true)
    // intermediate muting (the reference's REPYPE_CLI_INTERMEDIATE=0,
    // repype/cli.py:113-116): drop in-flight lines entirely
    if (!showIntermediate && intermediate) return
    str(e, "info") match {
      case Some("progress-done") => // clear the in-flight progress bar
        if (!showIntermediate) return
        write(clearLine("") + "\r")
        intermediateLineLength = 0
      case _ => format(e).foreach { text =>
        val full = fullFormat(e, text)
        if (intermediate) {
          val lines = full.split("\n", -1)
          if (lines.length > 1) write(lines.init.mkString("\n") + "\n")
          write(lines.last + "\r")
          intermediateLineLength = lines.last.length
        } else {
          write(full + "\n")
          intermediateLineLength = 0
        }
      }
    }
  }
}

/** Live follower: tails a status JSONL from a daemon thread and renders
  * events incrementally to `write` while the batch runs — the counterpart
  * of the reference's watchdog `StatusReader` (repype/status.py:391-632)
  * reduced to offset polling on one flat file. `stop()` drains whatever is
  * left so the transcript is complete. */
final class StatusTailer(path: HPath, write: String => Unit, pollMs: Long = 50,
                         showIntermediate: Boolean = true) {
  private val renderer =
    new ConsoleRenderer(write, showIntermediate = showIntermediate)
  @volatile private var stopped = false
  private var offset = 0L
  private var buffer = scala.collection.mutable.ArrayBuffer.empty[Byte]
  private val thread = new Thread(() => {
    while (!stopped) { drain(); Thread.sleep(pollMs) }
  }, "graft-status-tailer")
  thread.setDaemon(true)

  private def drain(): Unit = synchronized {
    val size = SidecarFs.length(path.toString)
    if (size >= 0) {
      if (size > offset) {
          val got = SidecarFs.readBytesFrom(path.toString, offset, size - offset)
          offset += got.length
          // Buffer raw BYTES and decode only whole lines: a multi-byte
          // UTF-8 character split across two polls must not be decoded
          // mid-sequence (it would become replacement characters).
          buffer ++= got
          val upto = buffer.lastIndexOf('\n'.toByte)
          if (upto >= 0) {
            val complete = new String(buffer.take(upto).toArray, "UTF-8")
            buffer = buffer.drop(upto + 1)
            // One malformed line (partial flush, torn write) must not
            // kill the tailer thread — skip it and keep following. Only
            // the PARSE is skippable silently; a renderer failure is a
            // bug and goes to stderr instead of vanishing.
            complete.split("\n").filter(_.nonEmpty).foreach { l =>
              val parsed =
                try Some(Json.parseJson(l))
                catch { case scala.util.control.NonFatal(_) => None }
              parsed.foreach { ev =>
                try renderer.handle(ev)
                catch { case scala.util.control.NonFatal(e) =>
                  System.err.println(s"[status-tailer] render failed: $e")
                }
              }
            }
          }
        }
    }
  }

  /** Bytes of the file the tailer has consumed so far — lets tests (and
    * callers that stage writes) synchronize on "the tailer saw the torn
    * prefix" instead of sleeping a fixed interval. */
  private[core] def observedOffset: Long = synchronized(offset)

  def start(): Unit = thread.start()

  def stop(): Unit = {
    stopped = true
    thread.join(5000)
    drain()
  }
}
