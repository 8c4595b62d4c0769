package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan pruning at scale.
  *
  * Parquet/ORC readers prune row groups and files by min/max statistics.
  * A linear sort clusters only its leading column; Z-ordering (Morton
  * interleave) keeps EVERY interleaved column's per-file range narrow, so
  * selective filters on any of them skip most files — the difference
  * between scanning 100 TB and scanning 100 GB for a point-ish query.
  * This is a write-time layout choice, pure Spark: compute the code,
  * range-partition + sort by it, write.
  */
object DataLayout {

  /** Morton (Z-curve) code: bit-interleave the low `bits` bits of two
    * non-negative integral columns. Plain builtin expressions — codegen'd,
    * no UDF; 16 bits per side is plenty for file-level clustering. */
  def mortonCode(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Write `df` clustered on the Z-curve of (colA, colB) into `files`
    * roughly equal files. Range partition + in-partition sort on the
    * code = globally Z-ordered layout. */
  def zorderWrite(df: DataFrame, colA: String, colB: String,
                  path: String, files: Int): Unit =
    df.withColumn("__z", mortonCode(col(colA), col(colB)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** N-column Z-ordered write ([[ScaleJoins.zorderN]] code) — the 3-4
    * dimension layout real tables tune for (date × key × domain). */
  def zorderWriteN(df: DataFrame, cols: Seq[String], path: String,
                   files: Int, bits: Int = 16): Unit =
    df.withColumn("__z", ScaleJoins.zorderN(cols.map(col), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Hilbert-ordered write ([[ScaleJoins.hilbert2]] index): same
    * mechanics as [[zorderWrite]] with the better-range-locality curve. */
  def hilbertWrite(df: DataFrame, colA: String, colB: String,
                   path: String, files: Int, bits: Int = 16): Unit =
    df.withColumn("__h", ScaleJoins.hilbert2(col(colA), col(colB), bits))
      .repartitionByRange(files, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)

  /** Mean per-file min/max span of `c` under the layout at `path` — the
    * statistic scan pruning actually uses (smaller = more skipping). */
  def meanFileSpan(df: DataFrame, c: String): Double = {
    val spans = df.groupBy(input_file_name())
      .agg((max(col(c)) - min(col(c))).cast("double").as("span"))
    spans.agg(avg(col("span"))).head.getDouble(0)
  }

  /** Write with per-column parquet BLOOM FILTERS — the data-skipping
    * complement to [[zorderWrite]]: min/max statistics prune RANGE
    * predicates but are useless for point lookups on high-cardinality
    * identifier columns scattered across files (every file's [min, max]
    * spans the whole id domain). A bloom filter per row group answers
    * "id definitely absent" and lets the reader skip the group without
    * decoding it — at 100 TB the difference between touching every row
    * group and touching the handful that might hold the key. `bloomCols`
    * maps column → expected distinct count (sizes the filter; parquet
    * targets ~1% false positives at that NDV). Pure write options — the
    * reader side is automatic when `parquet.filter.bloom.enabled` (on by
    * default) sees an equality pushdown. */
  def writeWithBloomFilters(df: DataFrame, path: String,
                            bloomCols: Map[String, Long]): Unit = {
    require(bloomCols.nonEmpty, "bloomCols must name at least one column")
    bloomCols.foldLeft(df.write.mode("overwrite")) {
      case (w, (c, ndv)) =>
        w.option(s"parquet.bloom.filter.enabled#$c", "true")
          .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }.parquet(path)
  }

  // NOTE: the bucketed co-located join layout (bucketBy + sortBy external
  // table; two co-bucketed tables join with ZERO exchanges) lives in
  // [[ScaleJoins.writeBucketed]] with its plan-asserted spec — kept there
  // because bucketing is a JOIN co-location contract, while this object
  // owns scan-pruning layouts.

  /** Range compaction — the small-files answer for append-heavy tables:
    * rewrite into ~⌈n / targetRows⌉ files, range-partitioned AND sorted on
    * `sortCol`, so (a) file count is bounded regardless of how many tiny
    * increments were appended, and (b) per-file `sortCol` ranges don't
    * overlap — a time-range scan prunes to the few covering files. The
    * single `count()` sizes the job (a scalar action, not data to the
    * driver); `maxRecordsPerFile` caps stragglers from range skew.
    * Returns the planned file count. */
  def compactByRange(df: DataFrame, sortCol: String, path: String,
                     targetRows: Long): Int = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRows).toInt)
    df.repartitionByRange(files, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRows)
      .parquet(path)
    files
  }
}
