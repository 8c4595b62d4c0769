package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic sources for tests and demos — seeded, schema-
  * compatible with the driver testdata, generated distributed (no
  * driver-side row materialization beyond `spark.range`).
  */
object SyntheticSources {

  /** events-shaped table: `event_id, ts, user_id, event_type, value, props`
    * — same schema as testdata `events` (µs timestamps), generated from
    * `spark.range` so it scales to any row count without driver memory. */
  def events(spark: SparkSession, rows: Long, users: Int = 50,
             startTs: String = "2024-01-01 00:00:00", seed: Long = 42L): DataFrame =
    spark.range(rows).select(
      col("id").as("event_id"),
      (to_timestamp(lit(startTs)) +
        make_dt_interval(lit(0), lit(0), lit(0),
          pmod(xxhash64(col("id"), lit(seed)), lit(86400)).cast("double")))
        .as("ts"),
      pmod(xxhash64(col("id"), lit(seed + 1)), lit(users.toLong)).as("user_id"),
      element_at(array(lit("click"), lit("view"), lit("purchase")),
        (pmod(xxhash64(col("id"), lit(seed + 2)), lit(3)) + 1).cast("int"))
        .as("event_type"),
      (pmod(xxhash64(col("id"), lit(seed + 3)), lit(100000)) / lit(1000.0))
        .as("value"),
      concat(lit("""{"k": """),
        pmod(xxhash64(col("id"), lit(seed + 4)), lit(100)), lit("}"))
        .as("props"))

  /** Plain numbers table (`n: long`) for quick fixtures. */
  def numbers(spark: SparkSession, rows: Long): DataFrame =
    spark.range(rows).withColumnRenamed("id", "n")
}
