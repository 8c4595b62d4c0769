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
  *   - `events.ts` loads as a µs TimestampType regardless of the parquet's
  *     physical encoding (see [[Tables.load]]) — queries never assume a
  *     finer precision than microseconds.
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

  /** Load a testdata table with its timestamp columns normalized to ONE
    * contract: every loaded timestamp is session-local `TimestampType`
    * (all sessions here run UTC, so values are unchanged). The physical
    * encoding of the driver's parquet has drifted between rounds and this
    * loader absorbs every variant seen so far:
    *
    *   - µs `timestamp` WITHOUT timezone (the current testdata, and the
    *     pandas/pyarrow default): Spark 4 infers TIMESTAMP_NTZ, which
    *     `withWatermark` / `unix_micros` / LTZ comparisons all reject at
    *     analysis time — cast to TimestampType (lossless under the UTC
    *     session timezone; the DuckDB oracle already reads ts naively).
    *   - LEGACY: TIMESTAMP(NANOS), which Spark 4's reader rejects outright
    *     (PARQUET_TYPE_ILLEGAL) — read as Long nanos (legacy flag) and
    *     convert via `timestamp_micros(ts div 1000)`; integer division so
    *     no precision loss above 2^53 ns. Earlier testdata generations
    *     used this encoding for `events.ts`; kept as defensive code.
    *
    * TestdataContractSpec asserts the raw physical types at suite start so
    * the NEXT drift fails with one clear message instead of 13 scattered
    * analysis errors. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = {
      if (name == "events")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
    }
    val nanosFixed =
      if (name == "events" && raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    nanosFixed.schema.fields
      .filter(_.dataType == TimestampNTZType)
      .foldLeft(nanosFixed) { (df, f) =>
        df.withColumn(f.name, col(f.name).cast(TimestampType))
      }
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
