package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Execution-trace dump for LIFECYCLE queries, whose returned frame is a
  * checkpoint/one-row report that hides the interesting plans:
  * registers a QueryExecutionListener and appends EVERY executed
  * action's formatted physical plan — index writes, per-round
  * `localCheckpoint`s, gauge collects, the final noop write — with its
  * wall duration, so plan claims (exchange counts, join strategies) are
  * checkable per phase and the phase costs are attributable in one run.
  *
  * Usage: runMain graft.tools.PlanTrace <outFile> <query> [sfDir] [cpus]
  */
object PlanTrace {
  def main(args: Array[String]): Unit = {
    val outFile = args(0)
    val name = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 3) args(3) else "8"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Option(Paths.get(outFile).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(outFile),
      s"== PlanTrace $name sf=$sfDir cpus=$cpus ==\n")
    val listener = new QueryExecutionListener {
      private var n = 0
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = synchronized {
        n += 1
        val plan = qe.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outFile),
          f"%n---- action #$n%d [$funcName] ${durationNs / 1e9}%.3f s ----%n" +
            plan,
          StandardOpenOption.APPEND)
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    // the listener delivers asynchronously off the listener bus — drain
    // before reporting so every action's plan is on disk
    org.apache.spark.graftshim.GraftSparkInternals
      .drainListenerBus(spark.sparkContext)
    Files.writeString(Paths.get(outFile),
      f"%n== total $total%.3f s ==%n", StandardOpenOption.APPEND)
    println(f"[plantrace] $name total $total%.3f s -> $outFile")
    spark.stop()
  }
}
