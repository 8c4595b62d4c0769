package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Correctness + plan-shape tests for the scale-join toolkit. */
class ScaleJoinsSpec extends SparkSpec {

  test("saltedJoin result-identical to plain inner join") {
    val lineitem = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = lineitem.join(orders, "l_orderkey")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("s"))
    val salted = ScaleJoins.saltedJoin(lineitem, orders, "l_orderkey", salts = 4)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("s"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("binnedRangeJoin result-identical to the theta range join") {
    val points = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    // overlapping intervals (stride < span) so multi-match is exercised
    val intervals = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey").as("band"),
        (col("n_nationkey") * 20000.0).as("lo"),
        (col("n_nationkey") * 20000.0 + 50000.0).as("hi"))
    val theta = points.join(intervals,
      points("o_totalprice") >= intervals("lo")
        && points("o_totalprice") < intervals("hi"))
      .select(col("o_orderkey"), col("band"))
    val binned = ScaleJoins.binnedRangeJoin(
        points, intervals, "o_totalprice", "lo", "hi", binWidth = 25000.0)
      .select(col("o_orderkey"), col("band"))
    assert(binned.exceptAll(theta).isEmpty && theta.exceptAll(binned).isEmpty)
  }

  test("intervalOverlapJoin result-identical to the theta overlap join, " +
      "each pair exactly once") {
    import graft.SparkSpec.spark.implicits._
    // spans >> binWidth so pairs share MANY bins — the first-shared-bin
    // dedup is what's under test (a naive bin join would multi-emit)
    val a = Seq((1L, 0L, 50L), (2L, 40L, 90L), (3L, 200L, 210L))
      .toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 45L, 60L), (11L, 89L, 95L), (12L, 300L, 310L),
        (13L, 0L, 220L))
      .toDF("b_id", "b_lo", "b_hi")
    val theta = a.join(b, a("a_lo") < b("b_hi") && b("b_lo") < a("a_hi"))
      .select(col("a_id"), col("b_id"))
    val binned = ScaleJoins.intervalOverlapJoin(a, b,
        "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 8L)
      .select(col("a_id"), col("b_id"))
    assert(binned.count() == binned.distinct().count(), "pair multi-emit")
    assert(binned.exceptAll(theta).isEmpty && theta.exceptAll(binned).isEmpty)
  }

  private def messageChain(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")

  test("intervalOverlapJoin fails loudly on an empty/inverted interval") {
    import graft.SparkSpec.spark.implicits._
    val a = Seq((1L, 10L, 10L)).toDF("a_id", "a_lo", "a_hi") // empty
    val b = Seq((2L, 0L, 20L)).toDF("b_id", "b_lo", "b_hi")
    val e = intercept[Exception] {
      ScaleJoins.intervalOverlapJoin(a, b,
        "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 8L).collect()
    }
    // the GUARD's message specifically — any-exception would also accept
    // an unrelated analysis error and leave the guard untested
    assert(messageChain(e).contains("intervalOverlapJoin"), messageChain(e))
  }

  test("intervalOverlapJoin: null-bounded interval matches nothing — the " +
      "theta semantics — and non-null rows still join") {
    import graft.SparkSpec.spark.implicits._
    val a = Seq((1L, Some(0L), Option.empty[Long]),
        (2L, Some(0L), Some(10L)))
      .toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 5L, 20L)).toDF("b_id", "b_lo", "b_hi")
    val out = ScaleJoins.intervalOverlapJoin(a, b,
        "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 8L)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((2L, 10L)), out.toSeq)
  }

  test("binnedRangeJoin plans as an equi-join, not a nested loop") {
    val points = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val intervals = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey").as("band"),
        (col("n_nationkey") * 20000.0).as("lo"),
        (col("n_nationkey") * 20000.0 + 50000.0).as("hi"))
    val p = ScaleJoins.binnedRangeJoin(
        points, intervals, "o_totalprice", "lo", "hi", binWidth = 25000.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("binnedRangeJoin fails loudly on an interval spanning too many bins") {
    import graft.SparkSpec.spark.implicits._
    val points = Seq((1L, 5.0)).toDF("pid", "p")
    val intervals = Seq((1L, 0.0, 1e9)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      ScaleJoins.binnedRangeJoin(points, intervals, "p", "lo", "hi",
        binWidth = 1.0, maxReplication = 100).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("binnedRangeJoin")), msgs(e).toString)
  }

  test("binnedRangeJoin fails loudly on an inverted interval") {
    // sequence(start > stop) counts DOWN — without its own guard branch
    // one garbage row would replicate unboundedly past the span check
    import graft.SparkSpec.spark.implicits._
    val points = Seq((1L, 5.0)).toDF("pid", "p")
    val intervals = Seq((1L, 1e9, 0.0)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      ScaleJoins.binnedRangeJoin(points, intervals, "p", "lo", "hi",
        binWidth = 1.0, maxReplication = 100).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("binnedRangeJoin")), msgs(e).toString)
  }

  test("AQE splits a skewed join partition without manual salting") {
    // The runtime counterpart of saltedJoin: plant a 95%-one-key fact
    // table, lower the skew thresholds to test scale, and assert the
    // final adaptive plan actually rewrote the sort-merge join with
    // skew-split partitions (the `skew=true` marker). This is the
    // mechanism that saves the 100 TB job when the skew is discovered at
    // runtime rather than known up front.
    import SparkSpec.spark.implicits._
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val fact = (0 until 120000)
        .map(i => (if (i % 20 == 0) (i % 97).toLong + 1 else 0L,
          s"payload_padding_padding_$i"))
        .toDF("k", "p").repartition(8)
      val dim = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "d")
      val joined = fact.join(dim, "k")
      // execute joined's OWN queryExecution (count() would plan a separate
      // aggregate query and leave this one unexecuted / non-final)
      assert(joined.collect().length == 120000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join with zero exchanges") {
    val warehouse = tempDir("warehouse").toString
    // below the broadcast threshold the planner would broadcast and hide
    // the exchange question entirely — disable to observe the bucket effect
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      ScaleJoins.writeBucketed(
        Tables.load(spark, sfDir, "orders"), "orders_b", "o_orderkey", 4, warehouse)
      ScaleJoins.writeBucketed(
        Tables.load(spark, sfDir, "lineitem")
          .withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", "o_orderkey", 4, warehouse)
      val joined = spark.table("lineitem_b").join(spark.table("orders_b"), "o_orderkey")
        .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      // and it is still correct
      val expected = Tables.load(spark, sfDir, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
        .join(Tables.load(spark, sfDir, "orders"), "o_orderkey")
        .select(col("o_orderkey"), col("q"))
      assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("zorder2 interleaves bits exactly") {
    import SparkSpec.spark.implicits._
    // z(x, y): bit b of x → 2b, bit b of y → 2b+1.
    // z(1,0)=1, z(0,1)=2, z(3,5)= (1+4) + (2+32) = 39, z(65535,0) fills
    // the even positions of 32 bits.
    val out = Seq((1, 0), (0, 1), (3, 5), (65535, 0), (0, 65535))
      .toDF("x", "y")
      .select(ScaleJoins.zorder2(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L, 39L, 0x55555555L, 0xAAAAAAAAL))
  }

  test("zorder buckets cover small rectangles of the key space") {
    // the data-skipping property the layout exists for: bucketing the
    // z-sorted space bounds BOTH keys per bucket far more tightly than
    // the global range (a single-key sort bounds only its own key).
    // Uniform 256×256 grid: 64 equal z-ranges each cover a 2^10-point
    // region = a 32×32 rectangle, so per-bucket spans are 31 on both
    // axes vs a 255 global span. (On skewed-cardinality keys — e.g.
    // lineitem's 10 suppliers vs thousands of parts — z-order correctly
    // spends its buckets on the wide axis; the symmetric guarantee needs
    // comparable bit widths, which is why this pins the grid case.)
    import SparkSpec.spark.implicits._
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y => (x, y)))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        ScaleJoins.zorder2(col("x"), col("y")).as("zv"))
    val zmax = grid.agg(max(col("zv"))).head.getLong(0)
    assert(zmax == 65535L) // 16 bits fully used: 256×256 → z ∈ [0, 2^16)
    val width = zmax / 64 + 1
    val rects = grid.groupBy(expr(s"zv div $width").as("bucket"))
      .agg((max(col("x")) - min(col("x"))).as("dx"),
        (max(col("y")) - min(col("y"))).as("dy"))
      .collect()
    assert(rects.length == 64)
    // every bucket is exactly the 32×32 rectangle
    assert(rects.forall(r => r.getInt(1) == 31 && r.getInt(2) == 31),
      s"buckets are not tight rectangles: ${rects.take(3).toSeq}")
  }
}
