package graft.tui

import org.apache.hadoop.fs.{Path => HPath}

import graft.core.{Batch, SidecarFs}

/** Pure view model for the terminal UI — all layout/label logic lives
  * here so it is unit-testable without a terminal (the reference keeps the
  * same split: screens compose widgets, `format_task_label` and tree
  * assembly are plain functions, repype/textual/batch.py:29-160).
  */
object TuiModel {

  /** One row of the task tree. */
  final case class TaskRow(path: HPath, depth: Int, pending: String,
                           runnable: Boolean, queued: Boolean)

  /** Task rows in tree order (path sort = parents before children),
    * depth = nesting below `root`. Pending states come from fresh
    * contexts, like the reference's `update_task_tree`. */
  def rows(batch: Batch, root: HPath, queued: Set[HPath]): Vector[TaskRow] = {
    val pendingByPath = batch.contexts.map(c => c.task.path -> c.pending).toMap
    val croot = SidecarFs.canon(root)
    batch.tasks.values.toVector.sortBy(_.path.toString).map { t =>
      val rel = SidecarFs.relativize(croot, t.path)
      val depth = if (rel.isEmpty) 0 else rel.count(_ == '/')
      TaskRow(t.path, depth, pendingByPath.getOrElse(t.path, ""),
        t.runnable, queued.contains(t.path))
    }
  }

  /** Task label: queue marker, basename, pending state — mirroring the
    * reference's `format_task_label` (queued `→`, pending suffix). */
  def label(row: TaskRow, root: HPath): String = {
    val name = {
      val rel = SidecarFs.relativize(SidecarFs.canon(root), row.path)
      if (rel.isEmpty) "." else rel
    }
    val marker = if (row.queued) "→ " else "  "
    val state =
      if (!row.runnable) " (not runnable)"
      else if (row.pending.nonEmpty) s" (${row.pending})"
      else " (completed)"
    marker + "  " * row.depth + name + state
  }

  /** Summary line (reference: `update_summary`). */
  def summary(rs: Vector[TaskRow]): String =
    s"Tasks: ${rs.count(_.queued)} queued / " +
      s"${rs.count(r => r.runnable && r.pending.nonEmpty)} pending"

  private val Inverse = "\u001b[7m"
  private val Reset = "\u001b[0m"
  private val Dim = "\u001b[2m"

  /** Full-screen render: header, tree with inverse-video cursor line,
    * summary, message line, key footer. Plain string of ANSI + newlines —
    * the caller owns clearing/positioning. */
  def renderScreen(rs: Vector[TaskRow], cursor: Int, root: HPath,
                   message: String, height: Int = 40): String = {
    val sb = new StringBuilder
    sb.append(s"${Inverse} graft — ${SidecarFs.canon(root)} ${Reset}\r\n\r\n")
    val visible = rs.zipWithIndex.slice(
      math.max(0, cursor - (height - 8)), rs.length)
    for ((row, i) <- visible.take(height - 7)) {
      val line = label(row, root)
      if (i == cursor) sb.append(s"$Inverse$line$Reset\r\n")
      else sb.append(line + "\r\n")
    }
    sb.append("\r\n" + summary(rs) + "\r\n")
    if (message.nonEmpty) sb.append(message + "\r\n")
    sb.append(s"$Dim ↑/↓ move · x queue · r run · R reset · e edit · " +
      s"a add sub-task · d delete · q quit$Reset\r\n")
    sb.toString
  }

  /** Decode one key press from raw-mode bytes: printable chars pass
    * through; CSI arrows map to 'k'/'j'; Enter → '\n'; unknown → 0. */
  def decodeKey(bytes: Array[Int]): Char = bytes match {
    case Array(0x1b, '[', 'A', _*) => 'k' // up
    case Array(0x1b, '[', 'B', _*) => 'j' // down
    case Array(13, _*) | Array(10, _*) => '\n'
    case Array(c, _*) if c >= 32 && c < 127 => c.toChar
    case _ => 0.toChar
  }
}
