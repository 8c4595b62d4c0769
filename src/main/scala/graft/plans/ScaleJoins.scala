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

  /** Point-in-interval join rewritten as a bin equi-join — the scale path
    * for range joins. A theta join (`lo <= p AND p < hi`) plans as a
    * nested-loop: O(points × intervals), fatal once neither side
    * broadcasts. Quantizing the range axis into fixed-width bins turns it
    * into a shuffled equi-join: each interval is replicated to the bins it
    * overlaps (`floor(lo/W) .. floor(hi/W)` — ~(hi-lo)/W rows), each point
    * lands in exactly one bin, and the exact `[lo, hi)` predicate runs as
    * a post-join filter. Cost scales with data × average interval span /
    * W, never with points × intervals.
    *
    * Pick `binWidth` near the median interval span: too small replicates
    * intervals; too large packs unrelated rows into one bin (the filter
    * then discards them post-shuffle). Column names of the two inputs must
    * be disjoint (standard equi-join hygiene; asserted).
    */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Double,
                      maxReplication: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "points and intervals must not share column names")
    require(!(points.columns ++ intervals.columns).contains("_bin"),
      "inputs must not carry a _bin column (reserved by the bin explode)")
    // Fail LOUDLY on an interval spanning more than `maxReplication`
    // bins: one unbounded interval would silently replicate into millions
    // of rows — at cluster scale that reads as a hung stage, not an
    // error. The guard is woven into the sequence's upper bound (a free-
    // standing guard column would be pruned as dead code); raise_error
    // fires only on the offending row, costing one codegen'd comparison.
    // An INVERTED interval (lo > hi) must also fail here: sequence()
    // with start > stop generates a DESCENDING range, so a single
    // garbage row would otherwise replicate unboundedly right past the
    // span check.
    val loBin = floor(col(loCol) / binWidth).cast("long")
    val hiBin = floor(col(hiCol) / binWidth).cast("long")
    val hiBinGuarded = when(
      hiBin - loBin >= maxReplication || col(loCol) > col(hiCol),
      raise_error(concat(
        lit(s"binnedRangeJoin: interval inverted or spanning >= " +
          s"$maxReplication bins of width $binWidth ["),
        col(loCol), lit(", "), col(hiCol),
        lit(") — fix the interval or raise binWidth/maxReplication")))
        .cast("long"))
      .otherwise(hiBin)
    // null-bounded intervals match nothing under the theta semantics
    // (point >= lo AND point < hi is null-rejecting) — drop explicitly
    // so behavior doesn't depend on optimizer pushdown order (same
    // contract as intervalOverlapJoin)
    val binnedIntervals = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull)
      .withColumn("_bin", explode(sequence(loBin, hiBinGuarded)))
    val binnedPoints = points.withColumn("_bin",
      floor(col(pointCol) / binWidth).cast("long"))
    binnedPoints.join(binnedIntervals, Seq("_bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bin")
  }

  /** Interval × interval OVERLAP join ([loA, hiA) ∩ [loB, hiB) ≠ ∅ ⇔
    * loA < hiB AND loB < hiA) — the temporal/genomic sibling of
    * [[binnedRangeJoin]]. Same equi-join-on-bin scale shape: both sides
    * explode to the width-`binWidth` bins they touch, the join runs on
    * the bin key (co-partitioned, never a theta cross product), and the
    * residual predicate verifies the actual overlap. A pair sharing
    * several bins would duplicate, so each pair is emitted ONLY from its
    * first shared bin — max(loBinA, loBinB), a codegen'd comparison
    * instead of a global distinct. Same loud guards as binnedRangeJoin:
    * inverted or over-wide intervals raise in-plan rather than silently
    * replicating. Sides must not share column names. */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
                          loA: String, hiA: String,
                          loB: String, hiB: String,
                          binWidth: Long,
                          maxReplication: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "overlap-join sides must not share column names")
    require(!(a.columns ++ b.columns).contains("_bin"),
      "inputs must not carry a _bin column (reserved by the bin explode)")
    def binned(df: DataFrame, lo: String, hi: String) = {
      val loBin = floor(col(lo) / binWidth).cast("long")
      // half-open: an interval's last occupied bin holds hi - 1
      val hiBin = floor((col(hi) - 1) / binWidth).cast("long")
      val hiBinGuarded = when(
        hiBin - loBin >= maxReplication || col(lo) >= col(hi),
        raise_error(concat(
          lit(s"intervalOverlapJoin: interval empty/inverted or " +
            s"spanning >= $maxReplication bins of width $binWidth ["),
          col(lo), lit(", "), col(hi), lit(")"))).cast("long"))
        .otherwise(hiBin)
      // null bounds match NOTHING — the SQL comparison semantics the
      // theta formulation (loA < hiB AND loB < hiA) has anyway; drop
      // them explicitly so the behavior doesn't depend on whether the
      // optimizer pushes the null-rejecting residual below the explode
      df.filter(col(lo).isNotNull && col(hi).isNotNull)
        .withColumn("_bin", explode(sequence(loBin, hiBinGuarded)))
    }
    binned(a, loA, hiA).join(binned(b, loB, hiB), Seq("_bin"))
      .filter(col(loA) < col(hiB) && col(loB) < col(hiA))
      .filter(col("_bin") === greatest(
        floor(col(loA) / binWidth).cast("long"),
        floor(col(loB) / binWidth).cast("long")))
      .drop("_bin")
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

  /** Z-order (Morton) value of two non-negative int columns: bit b of `x`
    * lands at position 2b, bit b of `y` at 2b+1, interleaving the two key
    * spaces so that rows close in EITHER dimension cluster together in
    * the sort order. Sorting a write by this value is the standard
    * data-skipping layout for multi-dimensional scans at 100 TB: files
    * (or row groups) then cover small rectangles of the (x, y) space and
    * parquet min/max statistics prune scans filtered on EITHER column —
    * a single-column sort only ever prunes one. Pure bit arithmetic
    * (shift/and/multiply) — codegen-friendly, and exactly expressible in
    * the DuckDB oracle so the layout is hash-checkable.
    *
    * Keys MUST fit in `bits` bits: bits at or above position `bits` are
    * not interleaved, so silently accepting a wider key would collapse
    * distinct keys onto one z-value and quietly destroy the rectangle
    * property the layout exists for. Out-of-range rows therefore raise
    * in-plan (a `when`-guarded `raise_error`, still codegen'd) instead
    * of degrading the layout — callers widen `bits` to fit their key
    * domain.
    */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column =
    zorderN(Seq(x, y), bits)

  /** N-dimensional Z-order (Morton) value: bit b of column i lands at
    * position N·b + i, generalizing [[zorder2]] to the 3-4 column
    * layouts real tables tune for (e.g. date × key × domain). Same
    * contract: keys must fit `bits` bits (out-of-range raises in-plan —
    * a silently collapsed key space would quietly destroy the
    * hyper-rectangle property), N·bits must fit a BIGINT, and the value
    * is a plain sum of shift/mask terms — codegen'd, and stated
    * term-for-term by the DuckDB oracle. */
  def zorderN(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.length
    require(n >= 2, s"zorderN needs at least 2 columns, got $n")
    require(bits >= 1 && n * bits <= 62,
      s"need 1 <= bits and n*bits <= 62, got n=$n bits=$bits")
    val lim = lit(1L << bits)
    val interleaved = (for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield (shiftright(c, b) % 2) * lit(1L << (n * b + i))).reduce(_ + _)
    val inRange = cols.map(c => c.geq(lit(0)).and(c.lt(lim))).reduce(_ and _)
    val shown = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(lit(s" c$i="), c.cast("string"))
    }
    when(inRange, interleaved).otherwise(raise_error(concat(
      lit(s"zorder: key outside [0, 2^$bits):") +: shown: _*)))
  }

  /** Hilbert-curve index of two non-negative int columns — the
    * range-locality upgrade over [[zorder2]]: consecutive Hilbert values
    * are ALWAYS grid neighbors (Morton jumps across the space at every
    * power-of-two boundary), so equal-width buckets of the sorted curve
    * cover tighter, never-split rectangles and parquet min/max pruning
    * keeps more of its promise on range predicates. The per-row loop
    * lives in a native codegen'd expression ([[graft.functions]] tier —
    * unrolling the bit-level rotations as nested Column `when`s would
    * blow the expression tree up exponentially); out-of-range keys
    * raise in-plan exactly like [[zorderN]]. */
  def hilbert2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val lim = lit(1L << bits)
    val inRange =
      x.geq(lit(0)).and(x.lt(lim)).and(y.geq(lit(0))).and(y.lt(lim))
    when(inRange, Hilbert.index(x, y, bits)).otherwise(raise_error(concat(
      lit(s"hilbert2: key outside [0, 2^$bits): x="), x.cast("string"),
      lit(" y="), y.cast("string"))))
  }
}
