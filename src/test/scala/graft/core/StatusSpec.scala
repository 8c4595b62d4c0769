package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors tests/test_status.py: event append, intermediates, derived
  * scopes, progress wrapper, renderer behaviour. */
class StatusSpec extends AnyFunSuite {

  private def mk() = {
    val dir = Files.createTempDirectory("status")
    val path = dir.resolve("status.jsonl")
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

  test("render: skips stale intermediates, keeps last, indents by scope") {
    val (path, status) = mk()
    status.update(Map("info" -> "start", "task" -> "t1"))
    status.update(Map("info" -> "working"), intermediate = true) // stale
    val child = status.derive()
    child.update(Map("info" -> "inner"))
    status.update(Map("info" -> "spinner"), intermediate = true) // last → kept
    val out = Status.render(Status.readEvents(path))
    assert(out.contains("start task=t1"))
    assert(!out.contains("working"))
    assert(out.contains("spinner"))
    assert(out.linesIterator.exists(_.startsWith("  inner")))
  }
}
