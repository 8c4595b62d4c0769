package graft.core

import org.apache.hadoop.fs.{Path => HPath}

/** stage × input table of run-time seconds, persisted as CSV — same layout
  * as the reference (repype/benchmark.py:21-115): header row = input ids,
  * first column = stage ids. Driver-side and tiny by construction.
  *
  * I/O goes through [[SidecarFs]] (Hadoop FileSystem), so times.csv lives
  * wherever the task tree lives — local disk, HDFS, or an object store —
  * and the save is an atomic tmp+rename publish (a concurrent times
  * reader on a remote store never sees a torn CSV).
  */
final class Benchmark(val filepath: HPath) {

  private var rows: Vector[String] = Vector.empty          // stage ids
  private var cols: Vector[String] = Vector.empty          // input ids
  private var values = Map.empty[(String, String), Double]

  def get(stageId: String, inputId: InputId): Option[Double] =
    values.get((stageId, inputId.render))

  def set(stageId: String, inputId: InputId, seconds: Double): Unit = {
    val c = inputId.render
    if (!rows.contains(stageId)) rows :+= stageId
    if (!cols.contains(c)) cols :+= c
    values += ((stageId, c) -> seconds)
  }

  /** Adopt all values from `other` (repype/benchmark.py:54-66). */
  def setAll(other: Benchmark): Benchmark = {
    other.rows.foreach(r => if (!rows.contains(r)) rows :+= r)
    other.cols.foreach(c => if (!cols.contains(c)) cols :+= c)
    values ++= other.values
    this
  }

  /** Subset rows/cols, preserving the given order (repype/benchmark.py:68-88). */
  def retain(stageIds: Seq[String], inputIds: Seq[InputId]): Unit = {
    val keepC = inputIds.map(_.render)
    rows = stageIds.toVector.filter(rows.contains)
    cols = keepC.toVector.filter(cols.contains)
    values = values.filter { case ((r, c), _) => rows.contains(r) && cols.contains(c) }
  }

  def save(): Unit = {
    Option(filepath.getParent).foreach(p => SidecarFs.mkdirs(p.toString))
    val header = ("" +: cols).mkString(",")
    val body = rows.map(r =>
      (r +: cols.map(c => values.get((r, c)).map(_.toString).getOrElse(""))).mkString(","))
    SidecarFs.writeStringAtomic(filepath.toString,
      (header +: body).mkString("", "\n", "\n"))
  }

  def shape: (Int, Int) = (rows.length, cols.length)
}

object Benchmark {
  def load(filepath: HPath): Benchmark = {
    val b = new Benchmark(filepath)
    SidecarFs.readString(filepath.toString).foreach { text =>
      val lines = text.split("\n", -1).toSeq.filter(_.nonEmpty)
      if (lines.nonEmpty) {
        val cols = lines.head.split(",", -1).drop(1)
        lines.drop(1).foreach { line =>
          val parts = line.split(",", -1)
          cols.zip(parts.drop(1)).foreach { case (c, v) =>
            if (v.nonEmpty) b.set(parts(0), InputId(c), v.toDouble)
          }
        }
      }
    }
    b
  }
}
