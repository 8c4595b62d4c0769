package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query plus (optionally) the equivalent DuckDB SQL the
  * driver's oracle runs over the same parquet tables.
  *
  * Conventions that make the oracle compare deterministic:
  *   - every query ends in an explicit ORDER BY over its output keys;
  *   - floating-point aggregates are rounded (2-4 decimals) on BOTH sides;
  *   - output column names are identical on both sides (the driver sorts
  *     columns by name before hashing);
  *   - `events.ts` is nanosecond-precision parquet which Spark truncates to
  *     microseconds, so raw `ts` is never emitted — always a truncation.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    sql: Option[String] = None,
)

object Tables {
  /** All testdata tables (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4's reader
    * rejects outright (PARQUET_TYPE_ILLEGAL). Read it as Long nanos
    * (legacy flag) and convert to a µs timestamp — lossless here: the
    * driver-generated values are exactly µs-aligned. `ts div 1000` stays
    * in integer arithmetic (a double division would lose precision above
    * 2^53 ns). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = {
      if (name == "events")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
    }
    if (name == "events"
        && raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions
        .expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Register every table as a temp view (for spark.sql-based queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Money in exact integer cents: floor(x·100 + 0.5) — pure IEEE double
    * ops that evaluate bit-identically in Spark and DuckDB for either
    * sign, unlike round() (Spark HALF_UP on BigDecimal vs DuckDB on the
    * raw binary double). THE one conversion every money-summing query
    * uses; SQL mirror: `CAST(floor(x * 100 + 0.5) AS BIGINT)`. */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions
      .floor(c * 100 + 0.5).cast("long")
}
