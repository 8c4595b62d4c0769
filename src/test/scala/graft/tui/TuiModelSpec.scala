package graft.tui

import java.nio.file.Files

import graft.SparkSpec
import graft.core.Batch
import graft.operators.DefaultStages

/** View-model tests for the terminal UI (layout/labels/keys — the
  * interactive shell in GraftTui stays thin and is driven manually /
  * via tmux in verification). */
class TuiModelSpec extends SparkSpec {
  DefaultStages.registerAll()

  private def tree() = {
    val root = tempDir("tui")
    val t = root.resolve("t")
    val v = t.resolve("v")
    Files.createDirectories(v)
    Files.writeString(t.resolve("task.yml"),
      s"""runnable: true
         |pipeline: [scan-lineitem]
         |config:
         |  scan-lineitem: {path: $sfDir}
         |input_ids: [1]
         |""".stripMargin)
    Files.writeString(v.resolve("task.yml"),
      "config:\n  scan-lineitem:\n    path: override\n")
    val batch = new Batch(spark)
    batch.load(root)
    (root, t, v, batch)
  }

  test("rows: tree order, depth, pending state, queue marker") {
    val (root, t, v, batch) = tree()
    val rs = TuiModel.rows(batch, root, queued = Set(v))
    assert(rs.map(_.path.toString) ==
      Vector(t.toString, v.toString)) // parents before children
    assert(rs.map(_.depth) == Vector(0, 1))
    assert(rs.forall(_.pending == "incomplete"))
    assert(rs.map(_.queued) == Vector(false, true))
  }

  test("labels and summary") {
    val (root, t, v, batch) = tree()
    val rs = TuiModel.rows(batch, root, queued = Set(v))
    assert(TuiModel.label(rs(0), root) == "  t (incomplete)")
    assert(TuiModel.label(rs(1), root) == "→   t/v (incomplete)")
    assert(TuiModel.summary(rs) == "Tasks: 1 queued / 2 pending")
  }

  test("renderScreen: cursor line inverse, footer keys present") {
    val (root, _, _, batch) = tree()
    val rs = TuiModel.rows(batch, root, Set.empty)
    val screen = TuiModel.renderScreen(rs, cursor = 1, root, message = "hi")
    assert(screen.contains("\u001b[7m→") || screen.contains("\u001b[7m  "))
    assert(screen.linesIterator.exists(l =>
      l.startsWith("\u001b[7m") && l.contains("t/v")))
    assert(screen.contains("Tasks: 0 queued / 2 pending"))
    assert(screen.contains("hi"))
    assert(screen.contains("q quit"))
  }

  test("decodeKey: arrows, enter, printables, garbage") {
    assert(TuiModel.decodeKey(Array(0x1b, '[', 'A')) == 'k')
    assert(TuiModel.decodeKey(Array(0x1b, '[', 'B')) == 'j')
    assert(TuiModel.decodeKey(Array(13)) == '\n')
    assert(TuiModel.decodeKey(Array('x'.toInt)) == 'x')
    assert(TuiModel.decodeKey(Array(0x1b, 'Z', 'Z')) == 0.toChar)
  }
}
