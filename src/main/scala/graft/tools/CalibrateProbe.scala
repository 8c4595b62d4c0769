package graft.tools

import org.apache.spark.sql.SparkSession

/** Re-freeze helper for [[graft.Bench.CalibrationFrozenSec]]: runs the
  * bench's fixed-work calibration probe a few times on the current
  * machine and prints each measurement. Run on an IDLE host (check
  * `uptime` first — load avg should be < 0.3) and copy the min into
  * Bench.CalibrationFrozenSec + BASELINE.md whenever the probe work or
  * the host changes. */
object CalibrateProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.calibrate(spark, cpus.toInt) // warmup, untimed
    for (i <- 1 to 4)
      println(f"[calibrate] probe $i (best-of-3): " +
        f"${graft.Bench.calibrate(spark, cpus.toInt)}%.3f s")
    spark.stop()
  }
}
