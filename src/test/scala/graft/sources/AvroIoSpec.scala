package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Avro container contracts: write∘read identity over the full
  * supported type surface (incl. nulls, binary, array<float> — the
  * embeddings shape), schema fidelity from the container header,
  * quarantine rules (non-Avro file empty; truncated container keeps
  * its decoded blocks), and the loud refusal beyond the type surface. */
class AvroIoSpec extends SparkSpec {

  test("roundtrip preserves every supported type, null markers, and " +
    "field order; nullability survives the header") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = false),
      StructField("blob", BinaryType, nullable = true),
      StructField("vec", ArrayType(FloatType, containsNull = false),
        nullable = true)))
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, Array[Byte](1, 2, 3),
        Seq(0.25f, -1.0f)),
      Row(2L, null, null, false, null, null),
      Row(3L, "gamma", -0.0, true, Array.emptyByteArray, Seq.empty[Float]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tempDir("avro_rt").toString
    assert(AvroIo.writeAvro(df, dir, numFiles = 2) === 3L)
    val back = AvroIo.readAvro(spark, dir)
    assert(back.schema === schema)
    val got = back.orderBy("id").collect()
    assert(got.length === 3)
    assert(got(0).getLong(0) === 1L && got(0).getString(1) === "alpha")
    assert(got(0).getAs[Array[Byte]]("blob").toSeq === Seq[Byte](1, 2, 3))
    assert(got(0).getAs[scala.collection.Seq[Float]]("vec").toSeq
      === Seq(0.25f, -1.0f))
    assert(got(1).isNullAt(1) && got(1).isNullAt(2) && got(1).isNullAt(4)
      && got(1).isNullAt(5))
    assert(got(2).getAs[Array[Byte]]("blob").isEmpty
      && got(2).getAs[scala.collection.Seq[Float]]("vec").isEmpty)
  }

  test("embeddings table roundtrips exactly (the array<float> corpus " +
    "shape)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 50)
    val dir = tempDir("avro_emb").toString
    AvroIo.writeAvro(emb, dir, numFiles = 3)
    val back = AvroIo.readAvro(spark, dir)
    assert(back.count() === emb.count())
    // exact float equality: the container stores IEEE floats verbatim
    assert(back.unionByName(emb).distinct().count() === emb.count())
  }

  test("a non-Avro file quarantines whole; a valid sibling still reads") {
    val dir = tempDir("avro_corrupt")
    import SparkSpec.spark.implicits._
    AvroIo.writeAvro(Seq((1L, "x")).toDF("id", "v"), dir.toString,
      numFiles = 1)
    Files.write(dir.resolve("junk.avro"), "definitely not avro".getBytes)
    val got = AvroIo.readAvro(spark, dir.toString).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("a truncated container keeps its decoded blocks and quarantines " +
    "the remainder") {
    val dir = tempDir("avro_trunc")
    val good = tempDir("avro_good")
    import SparkSpec.spark.implicits._
    // enough rows for several deflate blocks (default 64 KB sync
    // interval), so a 60% cut leaves whole decoded blocks behind it
    val n = 100000L
    val df = (0L until n).map(i => (i, s"row_${i}_${"p" * 20}"))
      .toDF("id", "v")
    AvroIo.writeAvro(df, good.toString, numFiles = 1)
    val f = Files.list(good).toArray.map(_.toString)
      .filter(_.endsWith(".avro")).head
    val bytes = Files.readAllBytes(Paths.get(f))
    Files.write(dir.resolve("part_00000.avro"),
      java.util.Arrays.copyOfRange(bytes, 0, bytes.length * 3 / 5))
    val got = AvroIo.readAvro(spark, dir.toString).collect()
    assert(got.length < n && got.nonEmpty)
    val ids = got.map(_.getLong(0)).toSet
    assert(ids.forall(_ < n))
  }

  test("a container with a DIFFERENT embedded schema quarantines whole " +
    "instead of positionally transposing values") {
    val dir = tempDir("avro_mixed")
    import SparkSpec.spark.implicits._
    AvroIo.writeAvro(Seq((1L, "x")).toDF("id", "v"), dir.toString,
      numFiles = 1)
    // second container under a DIFFERENT field list — write elsewhere,
    // move in under a name that sorts after the first
    val other = tempDir("avro_other")
    AvroIo.writeAvro(Seq(("y", 2L)).toDF("v", "id"), other.toString,
      numFiles = 1)
    val src = Files.list(other).toArray.map(_.toString)
      .filter(_.endsWith(".avro")).head
    Files.copy(Paths.get(src), dir.resolve("part_zz.avro"))
    val got = AvroIo.readAvro(spark, dir.toString).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("decodeBlobs ≡ readAvro on the same directory, corrupt container " +
    "included — the streamed and batch decode paths cannot drift") {
    val dir = tempDir("avro_parity")
    import SparkSpec.spark.implicits._
    AvroIo.writeAvro(
      Seq((1L, "x"), (2L, "y"), (3L, null: String)).toDF("id", "v"),
      dir.toString, numFiles = 2)
    Files.write(dir.resolve("junk.avro"), "nope".getBytes)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val batch = AvroIo.readAvro(spark, dir.toString)
    val schemaJson = AvroIo.schemaJsonOf(spark, dir.toString)
    val blobs = AvroIo.decodeBlobs(
      spark.read.format("binaryFile").load(dir.toString)
        .filter(col("path").endsWith(".avro")), schemaJson)
    assert(canon(blobs) === canon(batch))
    assert(batch.count() === 3)
  }

  test("types outside the surface refuse loudly at write") {
    import SparkSpec.spark.implicits._
    val df = Seq((1L, Map("k" -> 1))).toDF("id", "m")
    val e = intercept[IllegalArgumentException] {
      AvroIo.writeAvro(df, tempDir("avro_bad").toString)
    }
    assert(e.getMessage.contains("unsupported Spark type"))
  }

  test("timestamp-micros and decimal logical types roundtrip exactly " +
      "(pre-epoch, sub-second, negative and null cells included)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = true),
      StructField("amt", DecimalType(14, 4), nullable = true)))
    def ts(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    val rows = Seq(
      Row(1L, ts(1234567890123456L), new java.math.BigDecimal("1234567890.1234")),
      Row(2L, ts(-987654321L), new java.math.BigDecimal("-0.0001")),
      Row(3L, null, null),
      Row(4L, ts(0L), new java.math.BigDecimal("0.0000")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tempDir("avro_logical").toString
    AvroIo.writeAvro(df, dir, numFiles = 2)
    val back = AvroIo.readAvro(spark, dir)
    assert(back.schema === schema)
    val got = back.orderBy("id").collect()
    assert(got(0).getTimestamp(1) === ts(1234567890123456L))
    assert(got(0).getDecimal(2) === new java.math.BigDecimal("1234567890.1234"))
    assert(got(1).getTimestamp(1) === ts(-987654321L)) // pre-epoch floor
    assert(got(1).getDecimal(2) === new java.math.BigDecimal("-0.0001"))
    assert(got(2).isNullAt(1) && got(2).isNullAt(2))
    assert(got(3).getTimestamp(1) === ts(0L))
  }
}
