package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for the shapes that break at 100 TB: skewed keys and
  * repeated fact-fact joins.
  *
  * AQE (`spark.sql.adaptive.skewJoin`) already splits skewed sort-merge
  * partitions at runtime; [[saltedJoin]] is the explicit fallback for the
  * cases AQE cannot fix (e.g. a broadcast-ineligible dimension with one
  * pathological key, or aggregations keyed on the skewed column).
  * [[writeBucketed]] pre-shuffles a table once so every later equi-join or
  * aggregation on the bucket key runs shuffle-free — the classic
  * amortize-the-exchange trade for tables joined many times.
  */
object ScaleJoins {

  /** Equi-join where `left` is heavily skewed on `key`: salt the left side
    * into `salts` sub-keys and replicate the right side to every salt, so
    * one hot key spreads over `salts` reducers instead of one.
    *
    * Result-identical to `left.join(right, key)` (inner); costs a
    * `salts`× blowup of the right side — use with a small-ish right side
    * that still exceeds the broadcast threshold.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // deterministic pseudo-random salt per left row: hash of all columns
    // spreads replicas of the same key value across salt buckets
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight,
        saltedLeft(key) === saltedRight(key)
          && saltedLeft("_salt") === saltedRight("_salt"))
      .drop(saltedRight(key)).drop("_salt")
  }

  /** Persist `df` bucketed (and sorted) by `key` into the session catalog —
    * the co-location contract: subsequent equi-joins between two tables
    * bucketed with the same `numBuckets` on the same key plan with ZERO
    * exchanges (verified in ScaleJoinsSpec by inspecting the physical
    * plan). At cluster scale this is the "shuffle once, join many times"
    * pattern for fact tables.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", s"$path/$table")
      .saveAsTable(table)
}
