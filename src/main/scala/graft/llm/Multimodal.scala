package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travel as opaque `binary` columns with typed metadata,
  * and per-row decode / feature-extraction runs as partition-local batch
  * functions — the Scala counterpart of `mapInPandas` batch UDFs.
  *
  * The codec is REAL: [[ImageCodec]] encodes/decodes PNG via
  * `javax.imageio` (pure JVM, lossless), so the feature path exercises an
  * actual byte-level image decode, not a synthetic header. The Spark
  * plumbing is what matters at 100 TB: decode is embarrassingly parallel,
  * shuffle-free, and streams batch-by-batch through `mapPartitions`
  * without materializing a partition in memory. Corrupt blobs are dropped
  * (quarantine-by-skip), never job-killers.
  *
  * Reference anchor: the reference's shipped example pipeline processes
  * real images through Download/Unzip/Segmentation stages
  * (`tests/test_repype.py:27-102`); this is the engine-side equivalent
  * capability over binary columns.
  */
object Multimodal {

  /** Typed metadata schema accompanying every media blob. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("content", BinaryType, nullable = true),   // opaque bytes
    StructField("mime", StringType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Real PNG codec over `javax.imageio`. Pixels travel as an RGB raster
    * (`(y*width + x)*3 + c`, c ∈ {r,g,b}) — `getRGB`/`setRGB` keep the
    * channel order independent of the reader's internal buffer layout
    * (PNG decodes as BGR byte buffers on the JVM; raster order here is
    * the contract). PNG is lossless, so encode→decode round-trips the
    * raster exactly. */
  object ImageCodec {
    final case class Decoded(width: Int, height: Int, channels: Int,
                             pixels: Array[Byte])

    /** Encode an RGB raster (length = width·height·3) as PNG bytes. */
    def encodePng(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
      require(pixels.length == width * height * 3,
        s"raster must be width*height*3 bytes, got ${pixels.length}")
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val i = (y * width + x) * 3
          img.setRGB(x, y,
            ((pixels(i) & 0xff) << 16) | ((pixels(i + 1) & 0xff) << 8) |
              (pixels(i + 2) & 0xff))
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Decode image bytes (any ImageIO-supported format — PNG/BMP/GIF…)
      * to the RGB raster. Throws on undecodable bytes; callers that must
      * survive corrupt blobs wrap in [[tryDecode]]. */
    def decode(bytes: Array[Byte]): Decoded = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image bytes")
      val (w, h) = (img.getWidth, img.getHeight)
      val pixels = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val i = (y * w + x) * 3
          pixels(i) = ((rgb >> 16) & 0xff).toByte
          pixels(i + 1) = ((rgb >> 8) & 0xff).toByte
          pixels(i + 2) = (rgb & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Decoded(w, h, 3, pixels)
    }

    /** [[decode]] that quarantines corrupt blobs as None instead of
      * failing the task — the 100 TB posture (one bad file must not kill
      * a 1000-executor job). */
    def tryDecode(bytes: Array[Byte]): Option[Decoded] =
      try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))).map { _ => decode(bytes) }
      catch { case _: Exception => None }
  }

  /** Deterministic pixel value of synthetic image `id` at raster index
    * `j`: the closed form BOTH the generator and the DuckDB oracle
    * compute, which is what lets q_multimodal_features hash-match a real
    * PNG decode. */
  @inline private def synthPixel(id: Long, j: Int): Byte =
    ((id * 31 + j) % 256).toByte

  /** Synthetic image dims: width 4..31, height 4..31, derived from the id
    * alone (no RNG — the oracle recomputes them). */
  private def synthDims(id: Long): (Int, Int) =
    ((4 + id % 28).toInt, (4 + (id * 7) % 28).toInt)

  /** Deterministic synthetic media table of REAL PNGs (the fixture source
    * — testdata has no media table). Pixels follow [[synthPixel]], so any
    * decoder output is independently checkable from the id alone. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val (w, h) = synthDims(i.toLong)
      val raster = Array.tabulate(w * h * 3)(j => synthPixel(i.toLong, j))
      Row(i.toLong, "image", ImageCodec.encodePng(w, h, raster), "image/png",
        Map("camera" -> s"cam${i % 3}"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, n / 64)), mediaSchema)
  }

  /** Typed row for the decode input (media_id + opaque bytes). */
  final case class MediaBlob(media_id: Long, content: Array[Byte])
  /** Typed decode/feature output row. `mean_micro` is the mean pixel
    * intensity in exact integer micro-units (Σpixels·10⁶ div count) — no
    * float division, so the DuckDB oracle matches bit-for-bit. */
  final case class MediaFeatures(media_id: Long, width: Int, height: Int,
                                 channels: Int, n_bytes: Long,
                                 mean_micro: Long)
  /** Typed sampled-frame output row (1→N explode); `frame_sum` is the
    * frame's unsigned-byte sum (content checkable without shipping the
    * bytes to an oracle). */
  final case class MediaFrame(media_id: Long, frame_idx: Int,
                              frame: Array[Byte], frame_sum: Long)

  /** Decode + feature-extract, partition-local (typed Dataset
    * `mapPartitions` over an iterator — never materializes a partition;
    * the mapInPandas batch-UDF shape, but staying inside one codegen'd
    * plan instead of dropping to the RDD boundary). One feature row per
    * decodable media row; null/corrupt blobs are skipped. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[MediaBlob]
      .mapPartitions(_.flatMap { blob =>
        Option(blob.content).flatMap(ImageCodec.tryDecode).map { d =>
          var s = 0L
          var i = 0
          while (i < d.pixels.length) { s += (d.pixels(i) & 0xff); i += 1 }
          MediaFeatures(blob.media_id, d.width, d.height, d.channels,
            d.pixels.length.toLong,
            if (d.pixels.isEmpty) 0L else s * 1000000L / d.pixels.length)
        }
      })
      .toDF()
  }

  /** Resize to the target dimensions (nearest-neighbor over the decoded
    * raster, re-encoded as PNG) — the binary-in/binary-out transform
    * shape. Corrupt blobs pass through as null. */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    val resizeUdf = udf { bytes: Array[Byte] =>
      if (bytes == null) null
      else ImageCodec.tryDecode(bytes).map { d =>
        val out = new Array[Byte](width * height * 3)
        for (y <- 0 until height; x <- 0 until width; c <- 0 until 3) {
          val sx = x * d.width / width
          val sy = y * d.height / height
          out((y * width + x) * 3 + c) = d.pixels((sy * d.width + sx) * 3 + c)
        }
        ImageCodec.encodePng(width, height, out)
      }.orNull
    }
    media.withColumn("content", resizeUdf(col("content")))
  }

  /** Frame sampling: every `stride`-th raster row as one frame (the video
    * frame-sample shape over the decoded image) — 1→N row explode via the
    * partition-local iterator, the `flatMap` table-function shape. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[MediaBlob]
      .mapPartitions(_.flatMap { blob =>
        Option(blob.content).flatMap(ImageCodec.tryDecode).toSeq.flatMap { d =>
          (0 until d.height by stride).map { y =>
            val frame = d.pixels.slice(y * d.width * 3, (y + 1) * d.width * 3)
            var s = 0L
            var i = 0
            while (i < frame.length) { s += (frame(i) & 0xff); i += 1 }
            MediaFrame(blob.media_id, y, frame, s)
          }
        }
      })
      .toDF()
  }
}
