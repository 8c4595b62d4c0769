package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: Morton-code correctness and the pruning property it
  * exists for — under Z-order, BOTH interleaved columns have narrow
  * per-file min/max spans, while a linear sort only clusters its leading
  * column. */
class DataLayoutSpec extends SparkSpec {

  test("mortonCode interleaves bits") {
    import SparkSpec.spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (5L, 9L))
      .toDF("a", "b")
      .select(DataLayout.mortonCode(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    // z(a,b) with a-bits at odd positions, b-bits at even positions:
    // (0,0)=0, (1,0)=2, (0,1)=1, (1,1)=3,
    // (2,3): a bit1→8, b bit0→1, b bit1→4 = 13
    // (5,9): a bits{0,2}→2+32, b bits{0,3}→1+64 = 99
    assert(rows.toSeq == Seq(0L, 2L, 1L, 3L, 13L, 99L))
  }

  test("compactByRange bounds file count and keeps per-file ranges disjoint") {
    import SparkSpec.spark.implicits._
    // simulate an append-heavy table: 40 tiny input files
    val df = (0 until 4000).map(i => (i.toLong, s"v$i")).toDF("ts", "v")
      .repartition(40)
    val base = s"/root/repo/target/tmp/compact_${System.nanoTime()}"
    df.write.parquet(s"$base/small")
    val smallIn = spark.read.parquet(s"$base/small")
    assert(smallIn.inputFiles.length >= 30, "fixture should be many files")

    val planned = DataLayout.compactByRange(smallIn, "ts", s"$base/out",
      targetRows = 1000)
    assert(planned == 4)
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 4000)
    // range partitioning is sampling-based: a partition that lands over
    // targetRows is split by maxRecordsPerFile (each split is a contiguous
    // sorted slice, so disjointness below still holds). The contract is
    // "bounded", not "exact": ~planned, never the 40 input shards
    val nf = out.inputFiles.length
    assert(nf >= planned && nf <= 2 * planned, s"got $nf files")
    // per-file ts ranges must not overlap (the pruning property)
    val ranges = out.groupBy(input_file_name())
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, s"overlap: $ranges")
      case _ =>
    }
  }

  test("z-order narrows per-file spans on BOTH columns; linear sort does not") {
    import SparkSpec.spark.implicits._
    val n = 1 << 12
    // two independent uniform columns — worst case for a linear sort
    val rnd = new scala.util.Random(1)
    val df = (0 until n).map(_ => (rnd.nextInt(4096).toLong,
      rnd.nextInt(4096).toLong)).toDF("a", "b")
    val base = s"/root/repo/target/tmp/zorder_${System.nanoTime()}"

    DataLayout.zorderWrite(df, "a", "b", s"$base/z", files = 16)
    df.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.parquet(s"$base/lin")

    val z = spark.read.parquet(s"$base/z")
    val lin = spark.read.parquet(s"$base/lin")
    // same data either way
    assert(z.count() == n && lin.count() == n)

    val zA = DataLayout.meanFileSpan(z, "a")
    val zB = DataLayout.meanFileSpan(z, "b")
    val linA = DataLayout.meanFileSpan(lin, "a")
    val linB = DataLayout.meanFileSpan(lin, "b")
    // linear sort: a tightly clustered, b spans ~the full domain
    assert(linA < 0.2 * linB)
    // z-order: both columns well below the full domain (~4096) — each
    // file covers a quadrant-ish region, so spans shrink on BOTH axes
    assert(zA < 0.45 * linB && zB < 0.45 * linB)
  }

  test("3-column z-order narrows per-file spans on ALL THREE axes; " +
      "linear sort narrows only its own") {
    import SparkSpec.spark.implicits._
    val n = 1 << 12
    val rnd = new scala.util.Random(7)
    val df = (0 until n).map(_ => (rnd.nextInt(4096).toLong,
      rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
      .toDF("a", "b", "c")
    val base = s"/root/repo/target/tmp/zorder3_${System.nanoTime()}"

    // 64 files = 2^6 z-ranges over a cube → each axis splits ~4× (two
    // top interleaved bits per dimension); 16 files would only halve
    // each axis and prove nothing
    DataLayout.zorderWriteN(df, Seq("a", "b", "c"), s"$base/z", files = 64)
    df.repartitionByRange(64, col("a")).sortWithinPartitions(col("a"))
      .write.parquet(s"$base/lin")

    val z = SparkSpec.spark.read.parquet(s"$base/z")
    val lin = SparkSpec.spark.read.parquet(s"$base/lin")
    assert(z.count() == n && lin.count() == n)
    val linB = DataLayout.meanFileSpan(lin, "b")
    // the generalized rectangle-shrink property: every interleaved axis
    // is bounded well below the ~4096 global span (each file covers a
    // sub-box), where the linear layout leaves two axes at full span
    for (cn <- Seq("a", "b", "c"))
      assert(DataLayout.meanFileSpan(z, cn) < 0.5 * linB,
        s"axis $cn not clustered")
    assert(DataLayout.meanFileSpan(lin, "a") < 0.2 * linB)
  }

  test("hilbert index is a bijection on the grid and consecutive curve " +
      "positions are always grid neighbors (Morton is not)") {
    val bits = 5
    val side = 1 << bits
    // bijectivity: every cell maps to a distinct position in [0, 4^bits)
    val ds = for (x <- 0L until side; y <- 0L until side)
      yield Hilbert.xy2d(bits, x, y)
    assert(ds.toSet.size == side * side)
    assert(ds.min == 0L && ds.max == side.toLong * side - 1)
    // round-trip + THE Hilbert property: |step| in Manhattan distance is
    // exactly 1 between consecutive positions — Morton jumps (e.g. 3→4
    // crosses from (1,1) to (2,0): distance 2) — this adjacency is what
    // keeps equal-width buckets of the sorted curve spatially compact
    var prev = Hilbert.d2xy(bits, 0L)
    for (d <- 1L until (side.toLong * side)) {
      val cur = Hilbert.d2xy(bits, d)
      assert(Hilbert.xy2d(bits, cur._1, cur._2) == d) // inverse round-trip
      val manhattan = math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2)
      assert(manhattan == 1, s"jump at d=$d: $prev -> $cur")
      prev = cur
    }
  }

  test("hilbert2 expression equals the reference loop and raises on " +
      "out-of-range keys") {
    import SparkSpec.spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = (0 until 500).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val out = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ScaleJoins.hilbert2(col("x"), col("y"), 16).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (x, y, h) =>
      assert(h == Hilbert.xy2d(16, x, y), s"($x,$y)")
    }
    val err = intercept[Exception] {
      Seq((70000L, 1L)).toDF("x", "y")
        .select(ScaleJoins.hilbert2(col("x"), col("y"), 16)).collect()
    }
    assert(err.getMessage.contains("hilbert2"))
  }

  test("hilbert layout's per-file boxes are at least as tight as " +
      "morton's on uniform grids") {
    import SparkSpec.spark.implicits._
    val side = 128
    val df = (for (x <- 0 until side; y <- 0 until side)
      yield (x.toLong, y.toLong)).toDF("a", "b")
    val base = s"/root/repo/target/tmp/hilbert_${System.nanoTime()}"
    DataLayout.hilbertWrite(df, "a", "b", s"$base/h", files = 16, bits = 7)
    DataLayout.zorderWrite(df, "a", "b", s"$base/z", files = 16)
    val h = SparkSpec.spark.read.parquet(s"$base/h")
    val z = SparkSpec.spark.read.parquet(s"$base/z")
    val hSpan = DataLayout.meanFileSpan(h, "a") + DataLayout.meanFileSpan(h, "b")
    val zSpan = DataLayout.meanFileSpan(z, "a") + DataLayout.meanFileSpan(z, "b")
    // the never-split-rectangle property: equal-width Hilbert buckets
    // cover boxes no looser than Morton's (strictly tighter when the
    // bucket count is off the curve's power-of-four alignment)
    assert(hSpan <= zSpan * 1.01, s"hilbert $hSpan vs morton $zSpan")
  }

  // bucketed co-located join coverage lives in ScaleJoinsSpec
  // ("bucketed tables join with zero exchanges") next to its
  // ScaleJoins.writeBucketed implementation

  test("writeWithBloomFilters materializes a bloom filter for the named " +
      "column only, and filtered reads stay correct") {
    import SparkSpec.spark.implicits._
    val df = (0 until 20000)
      .map(i => (s"user_${i * 7919 % 100000}", i.toLong)).toDF("uid", "v")
    val base = s"/root/repo/target/tmp/bloom_${System.nanoTime()}"
    DataLayout.writeWithBloomFilters(df, base, Map("uid" -> 20000L))

    // read the parquet footer: the bloomed column's chunks carry a
    // filter offset; the un-bloomed column's chunks do not
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(base).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    val offsets = files.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try reader.getRowGroups.toArray.toSeq.flatMap { bm =>
        bm.asInstanceOf[org.apache.parquet.hadoop.metadata.BlockMetaData]
          .getColumns.toArray.toSeq.map { cc =>
            val c = cc.asInstanceOf[
              org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]
            c.getPath.toDotString -> c.getBloomFilterOffset
          }
      } finally reader.close()
    }
    assert(offsets.exists { case (p, off) => p == "uid" && off > 0 },
      s"no bloom filter for uid: $offsets")
    assert(offsets.filter(_._1 == "v").forall(_._2 <= 0),
      s"unexpected bloom on v: $offsets")

    // equality lookups through the bloom-enabled reader remain exact
    val out = spark.read.parquet(base)
      .filter(col("uid") === "user_7919").count()
    assert(out == df.filter(col("uid") === "user_7919").count())
  }
}
