package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the plan
  * evidence the optimization rounds commit under `plans/<round>/`.
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> <q1,q2,...>
  * Writes `<outDir>/<query>_<suffix>.txt` per query. Lifecycle queries
  * (index write + probe) explain the FINAL returned frame — the probe
  * plan over the index the run just wrote — which is the per-batch plan
  * a production user re-runs, and the one the join-strategy/pushdown
  * claims in OPTIMIZATION_*.md are checked against.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
      println(s"[explain] wrote $outDir/${n}_$suffix.txt " +
        s"(${plan.linesIterator.length} lines)")
    }
    spark.stop()
  }
}
