package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travel as opaque `binary` columns with typed metadata,
  * and per-row decode / feature-extraction runs as partition-local batch
  * functions — the Scala counterpart of `mapInPandas` batch UDFs.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[FakeCodec]] is a deterministic stand-in that "decodes" a
  * synthetic header instead of real JPEG/WAV bytes. Everything around it —
  * schema, batching, partitioning, null handling — is real Spark plumbing
  * and is what matters at 100 TB: decode is embarrassingly parallel,
  * shuffle-free, and streams batch-by-batch through `mapPartitions` without
  * materializing a partition in memory.
  */
object Multimodal {

  /** Typed metadata schema accompanying every media blob. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("content", BinaryType, nullable = true),   // opaque bytes
    StructField("mime", StringType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** STUB codec — deterministic fake in place of a real decoder.
    *
    * Fake wire format (produced by [[syntheticMedia]]): 16-byte header =
    * [width:int32][height:int32][channels:int32][seed:int32], then payload
    * bytes generated from the seed. A real deployment swaps `decode` for
    * an actual image/audio library call with the same signature.
    */
  object FakeCodec {
    final case class Decoded(width: Int, height: Int, channels: Int,
                             pixels: Array[Byte])

    def encode(width: Int, height: Int, channels: Int, seed: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + width * height * channels)
      bb.putInt(width).putInt(height).putInt(channels).putInt(seed)
      val rnd = new java.util.Random(seed)
      val payload = new Array[Byte](width * height * channels)
      rnd.nextBytes(payload)
      bb.put(payload)
      bb.array()
    }

    def decode(bytes: Array[Byte]): Decoded = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val (w, h, c) = (bb.getInt, bb.getInt, bb.getInt)
      bb.getInt // seed
      val payload = new Array[Byte](w * h * c)
      bb.get(payload)
      Decoded(w, h, c, payload)
    }
  }

  /** Deterministic synthetic media table (the fixture source — testdata has
    * no media table; seeded so tests are stable). */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    val rows = (0 until n).map { i =>
      val rnd = new java.util.Random(seed + i)
      val w = 4 + rnd.nextInt(28)
      val h = 4 + rnd.nextInt(28)
      Row(i.toLong, "image",
        FakeCodec.encode(w, h, 3, (seed + i).toInt), "image/fake",
        Map("camera" -> s"cam${i % 3}"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, n / 64)), mediaSchema)
  }

  /** Typed row for the decode input (media_id + opaque bytes). */
  final case class MediaBlob(media_id: Long, content: Array[Byte])
  /** Typed decode/feature output row. */
  final case class MediaFeatures(media_id: Long, width: Int, height: Int,
                                 channels: Int, n_bytes: Int,
                                 mean_intensity: Double)
  /** Typed sampled-frame output row (1→N explode). */
  final case class MediaFrame(media_id: Long, frame_idx: Int,
                              frame: Array[Byte])

  /** Decode + feature-extract, partition-local (typed Dataset
    * `mapPartitions` over an iterator — never materializes a partition;
    * the mapInPandas batch-UDF shape, but staying inside one codegen'd
    * plan instead of dropping to the RDD boundary). Output: one feature
    * row per media row. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[MediaBlob]
      .mapPartitions(_.flatMap { blob =>
        Option(blob.content).map { bytes =>
          val d = FakeCodec.decode(bytes)
          val mean = if (d.pixels.isEmpty) 0.0
            else d.pixels.map(b => (b & 0xff).toDouble).sum / d.pixels.length
          MediaFeatures(blob.media_id, d.width, d.height, d.channels,
            d.pixels.length, math.rint(mean * 10000) / 10000)
        }
      })
      .toDF()
  }

  /** "Resize": re-encode to the target dimensions via the stub codec
    * (nearest-neighbor over the fake payload) — exercises the
    * binary-in/binary-out transform shape. */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    val resizeUdf = udf { bytes: Array[Byte] =>
      if (bytes == null) null
      else {
        val d = FakeCodec.decode(bytes)
        val out = java.nio.ByteBuffer.allocate(16 + width * height * d.channels)
        out.putInt(width).putInt(height).putInt(d.channels).putInt(0)
        for (y <- 0 until height; x <- 0 until width; c <- 0 until d.channels) {
          val sx = x * d.width / width
          val sy = y * d.height / height
          out.put(d.pixels((sy * d.width + sx) * d.channels + c))
        }
        out.array()
      }
    }
    media.withColumn("content", resizeUdf(col("content")))
  }

  /** Frame sampling for (fake) video: treat the payload as `frames` equal
    * slices and keep every `stride`-th — 1→N row explode via the
    * partition-local iterator, the `flatMap` table-function shape. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[MediaBlob]
      .mapPartitions(_.flatMap { blob =>
        Option(blob.content).toSeq.flatMap { bytes =>
          val d = FakeCodec.decode(bytes)
          // each "frame" = one row of the fake image
          (0 until d.height by stride).map { y =>
            MediaFrame(blob.media_id, y,
              d.pixels.slice(y * d.width * d.channels,
                (y + 1) * d.width * d.channels))
          }
        }
      })
      .toDF()
  }
}
