package graft.core

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors tests/test_status.py: event append, intermediates, derived
  * scopes, progress wrapper, renderer behaviour. */
class StatusSpec extends AnyFunSuite {

  private def mk() = {
    val dir = Files.createTempDirectory("status")
    val path = new HPath(dir.toString, "status.jsonl")
    (path, Status.create(path))
  }

  test("update appends events with sequence numbers and scope") {
    val (path, status) = mk()
    status.update(Map("info" -> "a"))
    status.update(Map("info" -> "b", "extra" -> 1L))
    val events = Status.readEvents(path)
    assert(events.map(_("info")) == Seq("a", "b"))
    assert(events.map(_("seq")) == Seq(0L, 1L))
    assert(events.forall(_("scope") == "0"))
    assert(events.last("extra") == 1L)
  }

  test("derive opens a nested scope linked by an expand event") {
    val (path, status) = mk()
    val child = status.derive()
    child.update(Map("info" -> "inner"))
    val events = Status.readEvents(path)
    val expand = events.find(_.contains("expand")).get
    assert(expand("expand") == child.scopeId)
    assert(events.last("scope") == child.scopeId)
    assert(child.scopeId.startsWith("0/"))
  }

  test("progress emits intermediates and a final non-intermediate") {
    val (path, status) = mk()
    val seen = status.progress(Seq(10, 20, 30), "items").toList
    assert(seen == List(10, 20, 30))
    val events = Status.readEvents(path)
    val progress = events.filter(_("info") == "progress")
    assert(progress.length == 3)
    assert(progress.forall(_("intermediate") == true))
    assert(progress.map(_("step")) == Seq(0L, 1L, 2L))
    assert(events.last("info") == "progress-done")
    assert(events.last("intermediate") == false)
  }

  test("render: reference format strings, \\r intermediates, scope indent") {
    val (path, status) = mk()
    status.update(Map("info" -> "start", "task" -> "t1",
      "pickup" -> null, "first_stage" -> null))
    status.update(Map("info" -> "start-stage", "stage" -> "segmentation"),
      intermediate = true)
    val child = status.derive() // expand event: not rendered
    child.update(Map("info" -> "inner", "details" -> "d")) // unknown info
    val out = Status.render(Status.readEvents(path))
    assert(out ==
      "Starting from scratch\n" +
        "Running stage: segmentation\r" + // \r spinner, overwritten by…
        " " * 27 + "\n" +                 // …the margin-change clear line
        "  inner details=d\n")            // generic fallback, indented
  }

  test("showIntermediate=false mutes in-flight \\r lines entirely") {
    val sb = new StringBuilder
    val r = new ConsoleRenderer(sb.append(_), showIntermediate = false)
    r.handle(Map("info" -> "start-stage", "stage" -> "x", "scope" -> "0",
      "intermediate" -> true))
    r.handle(Map("info" -> "progress-done", "scope" -> "0"))
    r.handle(Map("info" -> "completed", "scope" -> "0"))
    assert(sb.toString == "Results have been stored ✅\n")
  }

  test("formatHms: mm:ss under an hour, h:mm:ss above") {
    assert(Status.formatHms(59) == "00:59")
    assert(Status.formatHms(90) == "01:30")
    assert(Status.formatHms(3600) == "1:00:00")
    assert(Status.formatHms(3661) == "1:01:01")
  }

  test("tailer survives split multi-byte UTF-8 and malformed lines") {
    val dir = Files.createTempDirectory("tail")
    val path = dir.resolve("status.jsonl")
    val sb = new StringBuilder
    val tailer = new StatusTailer(new HPath(path.toString),
      s => sb.synchronized { sb.append(s) }, pollMs = 5)
    // Event with a multi-byte char (✅ = 3 bytes in UTF-8), written in two
    // flushes SPLIT MID-CHARACTER, with a garbage line in between polls.
    val line = """{"info":"x","details":"ok✅","scope":"0"}""" + "\n"
    val bytes = line.getBytes("UTF-8")
    val cut = line.indexOf("✅") + 1 // byte offset inside the 3-byte char
    Files.write(path, bytes.take(cut))
    tailer.start()
    // Deterministic sync: wait until the tailer has actually CONSUMED the
    // torn prefix (observedOffset advances past it) before appending the
    // rest — a fixed sleep passes vacuously if the thread never ran.
    def awaitCond(cond: => Boolean, what: String): Unit = {
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (!cond && System.nanoTime() < deadline) Thread.sleep(2)
      assert(cond, s"timed out waiting for $what")
    }
    awaitCond(tailer.observedOffset >= cut, "tailer to see the torn prefix")
    Files.write(path, bytes.drop(cut),
      java.nio.file.StandardOpenOption.APPEND)
    Files.writeString(path, "not json at all\n",
      java.nio.file.StandardOpenOption.APPEND)
    Files.writeString(path, """{"info":"y","details":"after","scope":"0"}""" + "\n",
      java.nio.file.StandardOpenOption.APPEND)
    awaitCond(sb.synchronized(sb.toString).contains("after"),
      "line after the malformed one to render")
    tailer.stop()
    val out = sb.synchronized(sb.toString)
    assert(out.contains("ok✅"), s"multi-byte char corrupted: $out")
    assert(!out.contains("�"), s"replacement char leaked: $out")
    // the malformed line was skipped, the line after it still rendered
    assert(out.contains("after"), s"tailer died on bad line: $out")
  }

  test("progress renders a bar with percentage and ETA") {
    var t = 0L
    val sb = new StringBuilder
    val r = new ConsoleRenderer(sb.append(_), now = () => t)
    r.handle(Map("info" -> "progress", "scope" -> "0", "intermediate" -> true,
      "step" -> 0L, "max_steps" -> 100L, "details" -> "items"))
    t = 5L * 1000 * 1000 * 1000 // 5 s later, 50 steps done → ETA 5 s
    r.handle(Map("info" -> "progress", "scope" -> "0", "intermediate" -> true,
      "step" -> 50L, "max_steps" -> 100L, "details" -> "items"))
    r.handle(Map("info" -> "progress-done", "scope" -> "0"))
    val out = sb.toString
    assert(out.startsWith("items [" + " " * 20 + "] 0.0% (0 / 100)\r"))
    assert(out.contains(
      "items [" + "=" * 10 + " " * 10 + "] 50.0% (50 / 100, ETA: 00:05)\r"))
    assert(out.endsWith(" " * ("items [] 50.0% (50 / 100, ETA: 00:05)".length + 20) + "\r"))
  }
}
