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

    /** Encode an RGB raster as JPEG at an explicit `quality` (0..1).
      * JPEG is LOSSY: decode(encodeJpeg(...)) returns approximately the
      * input raster — close enough that brightness-comparison features
      * ([[Multimodal.dhash64]]) survive, exact enough for nothing else.
      * Crawled corpora are JPEG-dominated, so the perceptual-dedup path
      * must decode a lossy format, not just lossless PNG. */
    def encodeJpeg(width: Int, height: Int, pixels: Array[Byte],
                   quality: Float): Array[Byte] = {
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
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(quality)
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.write(null,
          new javax.imageio.IIOImage(img, null, null), params)
      } finally {
        ios.close()
        writer.dispose()
      }
      out.toByteArray
    }

    /** Decode image bytes (any ImageIO-supported format — PNG/JPEG/BMP/
      * GIF…) to the RGB raster. Throws on undecodable bytes; callers that
      * must survive corrupt blobs wrap in [[tryDecode]]. */
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

  /** Stage 64 synthetic PNGs as REAL FILES (img_<id>.png, pixels =
    * [[synthPixel]] — the q_multimodal_features closed form) plus one
    * corrupt img_999.png, under a per-JVM temp dir, and return the
    * directory: the fixture for the `binaryFile` INGEST path (scan real
    * files → decode → features), as opposed to the in-memory fixtures
    * the other multimodal queries use. Memoized per JVM; deleted on
    * exit. */
  lazy val pngIngestDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-media-png-")
    graft.core.Fs.deleteOnExit(dir, "graft-media-png-cleanup")
    (0 until 64).foreach { i =>
      val (w, h) = synthDims(i.toLong)
      java.nio.file.Files.write(dir.resolve(s"img_$i.png"),
        ImageCodec.encodePng(w, h,
          Array.tabulate(w * h * 3)(j => synthPixel(i.toLong, j))))
    }
    java.nio.file.Files.write(dir.resolve("img_999.png"),
      Array.tabulate[Byte](48)(i => (i * 41).toByte))
    dir.toString
  }

  // ------------------------------------------------------------------
  // Perceptual hash (dHash) — image NEAR-duplicate detection over the
  // decoded raster: the standard image-corpus dedup signature (two
  // re-encodes/resizes of one photo hash within a few bits; unrelated
  // photos differ in ~32 of 64).
  // ------------------------------------------------------------------

  /** 64-bit difference hash of a decoded raster: nearest-neighbor
    * downscale to a 9×8 grayscale grid (same sampling rule as [[resize]]:
    * src = dst·srcDim/dstDim), gray = (r+g+b) div 3, and bit (y·8+x) set
    * iff gray(x+1,y) > gray(x,y) — 8 horizontal comparisons per row × 8
    * rows. Every step is integer arithmetic on the raster, which is what
    * lets the q_dedup_phash oracle recompute the hash from the synthetic
    * fixture's closed-form pixels. Brightness/contrast shifts preserve
    * the comparisons; per-pixel noise flips isolated bits — hamming
    * distance is the dissimilarity. */
  def dhash64(d: ImageCodec.Decoded): Long = {
    var hash = 0L
    var gy = 0
    while (gy < 8) {
      val sy = gy * d.height / 8
      var gx = 0
      var prev = 0
      while (gx < 9) {
        val sx = gx * d.width / 9
        val i = (sy * d.width + sx) * 3
        val gray = ((d.pixels(i) & 0xff) + (d.pixels(i + 1) & 0xff) +
          (d.pixels(i + 2) & 0xff)) / 3
        if (gx > 0 && gray > prev)
          hash |= 1L << (gy * 8 + (gx - 1))
        prev = gray
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** Typed (media_id, dhash) signature row. */
  final case class MediaSig(media_id: Long, sim: Long)

  /** Per-image dHash signature table — partition-local decode + hash,
    * corrupt blobs quarantined by skip (same posture as
    * [[extractFeatures]]). Column names match [[Dedup.simhash]]'s
    * signature contract so the hamming band machinery applies as-is. */
  def dhashSignatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[MediaBlob]
      .mapPartitions(_.flatMap { blob =>
        Option(blob.content).flatMap(ImageCodec.tryDecode)
          .map(d => MediaSig(blob.media_id, dhash64(d)))
      })
      .toDF("doc_id", "sim")
  }

  /** Closed-form pixel for the perceptual-hash fixture: a per-id
    * pseudo-random-looking but fully deterministic pattern (the linear
    * [[synthPixel]] ramp would give every image a near-identical dHash —
    * a useless fixture for a SIMILARITY operator). The quadratic term
    * breaks the linearity; the DuckDB oracle recomputes it verbatim. */
  @inline private def phashPixel(id: Long, j: Int): Byte =
    ((id * 7919L + j.toLong * 131L + (j.toLong * j.toLong % 1009L)) % 256L)
      .toByte

  /** Fixture for q_dedup_phash: `n` base PNGs with [[phashPixel]] pixels
    * and id-derived dims, plus `twins` EXACT pixel copies of images
    * 0..twins−1 under ids n+k (the planted distance-0 pairs), plus
    * `twins` NOISY copies under ids 2n+k (+1 on every 97th raster byte
    * — the re-encode-with-slight-noise near-dup, landing at a small but
    * usually nonzero hamming distance), plus one corrupt blob (id 3n)
    * that must quarantine, not fail the job. Special ids are DERIVED
    * from n — fixed offsets would collide with base ids at large scale
    * factors (see [[syntheticFingerprintAudio]]). */
  def syntheticPhashMedia(spark: SparkSession, n: Int,
                          twins: Int = 4): DataFrame = {
    require(twins <= n, s"twins ($twins) must be <= n ($n)")
    def png(src: Long, noise: Boolean): Array[Byte] = {
      val (w, h) = synthDims(src)
      ImageCodec.encodePng(w, h, Array.tabulate(w * h * 3) { j =>
        val bump = if (noise && j % 97 == 0) 1 else 0
        (((phashPixel(src, j) & 0xff) + bump) % 256).toByte
      })
    }
    val base = (0 until n).map(i =>
      Row(i.toLong, "image", png(i.toLong, noise = false), "image/png",
        Map("camera" -> s"cam${i % 3}")))
    val twinRows = (0 until twins).map(k =>
      Row(n.toLong + k, "image", png(k.toLong, noise = false), "image/png",
        Map("camera" -> "twin")))
    val noisyRows = (0 until twins).map(k =>
      Row(2L * n + k, "image", png(k.toLong, noise = true), "image/png",
        Map("camera" -> "noisy")))
    val corrupt = Seq(Row(3L * n, "image",
      Array.tabulate[Byte](64)(i => (i * 37).toByte), "image/png",
      Map("camera" -> "corrupt")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(base ++ twinRows ++ noisyRows ++ corrupt,
        math.max(1, n / 16)), mediaSchema)
  }
  /** Fixture for q_dedup_phash_jpeg — the LOSSY-format twin of
    * [[syntheticPhashMedia]]: `n` base images as REAL JPEGs (quality
    * 0.92) of the [[phashPixel]] rasters, plus `twins` BYTE-IDENTICAL
    * copies of images 0..twins−1 under ids n+k (identical bytes decode
    * identically regardless of JPEG loss — the planted distance-0
    * pairs), plus `twins` RE-ENCODED copies under ids 2n+k (decode the
    * base JPEG, re-encode at quality 0.75 — the real-crawl "same photo
    * saved again" near-dup, whose compression artifacts perturb pixels
    * but leave most brightness comparisons intact), plus one corrupt
    * blob (id 3n) that must quarantine. Unlike the PNG fixture, pixels
    * after decode have NO closed form (JPEG loss), so the oracle pins
    * the planted-pair OUTCOMES, not recomputed hashes. */
  def syntheticJpegPhashMedia(spark: SparkSession, n: Int,
                              twins: Int = 4): DataFrame = {
    require(twins <= n, s"twins ($twins) must be <= n ($n)")
    def baseJpeg(src: Long): Array[Byte] = {
      val (w, h) = synthDims(src)
      ImageCodec.encodeJpeg(w, h,
        Array.tabulate(w * h * 3)(j => phashPixel(src, j)), 0.92f)
    }
    val baseBytes = (0 until n).map(i => baseJpeg(i.toLong))
    val base = (0 until n).map(i =>
      Row(i.toLong, "image", baseBytes(i), "image/jpeg",
        Map("camera" -> s"cam${i % 3}")))
    val twinRows = (0 until twins).map(k =>
      Row(n.toLong + k, "image", baseBytes(k), "image/jpeg",
        Map("camera" -> "twin")))
    val reencoded = (0 until twins).map { k =>
      val d = ImageCodec.decode(baseBytes(k))
      Row(2L * n + k, "image",
        ImageCodec.encodeJpeg(d.width, d.height, d.pixels, 0.75f),
        "image/jpeg", Map("camera" -> "reenc"))
    }
    val corrupt = Seq(Row(3L * n, "image",
      Array.tabulate[Byte](64)(i => (i * 37).toByte), "image/jpeg",
      Map("camera" -> "corrupt")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(base ++ twinRows ++ reencoded ++ corrupt,
        math.max(1, n / 16)), mediaSchema)
  }

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

  // ------------------------------------------------------------------
  // Audio: real WAV (RIFF / PCM16 mono little-endian) codec over the
  // JDK's javax.sound.sampled — the second modality, same contract as
  // the image path: opaque binary column in, typed features out, the
  // decode exercising an actual byte-level container parse.
  // ------------------------------------------------------------------

  object AudioCodec {
    final case class DecodedAudio(sampleRate: Int, channels: Int,
                                  samples: Array[Short])

    /** Encode mono PCM16 samples as a WAV container. */
    def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val raw = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false) // signed, little-endian
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Decode WAV bytes back to PCM16 samples (real RIFF header parse via
      * AudioSystem — rate/width/endianness come from the container, not
      * from the caller). Throws on undecodable bytes. */
    def decode(bytes: Array[Byte]): DecodedAudio = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian && fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        s"unsupported audio format: $fmt")
      val raw = ais.readAllBytes()
      val samples = new Array[Short](raw.length / 2)
      var i = 0
      while (i < samples.length) {
        samples(i) =
          (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort
        i += 1
      }
      DecodedAudio(fmt.getSampleRate.toInt, 1, samples)
    }

    /** [[decode]] quarantining corrupt blobs as None (same 100 TB posture
      * as [[ImageCodec.tryDecode]]). */
    def tryDecode(bytes: Array[Byte]): Option[DecodedAudio] =
      try Some(decode(bytes)) catch { case _: Exception => None }
  }

  // ------------------------------------------------------------------
  // Video: a length-indexed container of PNG frames ("GVID"). The
  // container framing is ours (magic + frame count + per-frame lengths);
  // every frame inside is a REAL PNG that decodes through [[ImageCodec]]
  // — so the video path exercises genuine offset/length parsing plus a
  // genuine image decode per frame, the shape a real demuxer has, while
  // staying dependency-free (no ffmpeg in this container; the brief's
  // "make the plumbing real" contract).
  // ------------------------------------------------------------------

  object VideoCodec {
    private val Magic = Array[Byte]('G', 'V', 'I', 'D')

    /** Container layout: "GVID" | int32 n | n × int32 frameLen | frames. */
    def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(out)
      dos.write(Magic)
      dos.writeInt(frames.length)
      frames.foreach(f => dos.writeInt(f.length))
      frames.foreach(dos.write)
      out.toByteArray
    }

    /** Parse the container back to its PNG frame blobs. Throws on bad
      * magic, truncated index, or truncated frame data. */
    def decode(bytes: Array[Byte]): Seq[Array[Byte]] = {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val magic = new Array[Byte](4)
      in.readFully(magic)
      require(java.util.Arrays.equals(magic, Magic), "bad GVID magic")
      val n = in.readInt()
      require(n >= 0 && n < (1 << 20), s"implausible frame count $n")
      val lens = Array.fill(n)(in.readInt())
      lens.map { len =>
        require(len >= 0, "negative frame length")
        val f = new Array[Byte](len)
        in.readFully(f)
        f
      }.toSeq
    }

    def tryDecode(bytes: Array[Byte]): Option[Seq[Array[Byte]]] =
      try Some(decode(bytes)) catch { case _: Exception => None }
  }

  /** Closed-form pixel of video `id`, frame `f`, raster index `j` (the
    * image closed form with the frame folded into the id lane). */
  @inline private def synthVideoPixel(id: Long, f: Int, j: Int): Byte =
    ((id * 31 + f * 17 + j) % 256).toByte

  private def synthVideoParams(id: Long): (Int, Int, Int) =
    ((4 + id % 28).toInt, (4 + (id * 7) % 28).toInt, (4 + id % 8).toInt)

  /** Deterministic synthetic video table: real GVID containers of real
    * PNG frames, dims and frame count derived from the id. */
  def syntheticVideo(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val (w, h, nf) = synthVideoParams(i.toLong)
      val frames = (0 until nf).map { f =>
        ImageCodec.encodePng(w, h,
          Array.tabulate(w * h * 3)(j => synthVideoPixel(i.toLong, f, j)))
      }
      Row(i.toLong, "video", VideoCodec.encode(frames), "video/x-gvid",
        Map("camera" -> s"cam${i % 3}"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, n / 64)), mediaSchema)
  }

  /** Typed per-sampled-frame output: every `stride`-th frame decodes
    * through the real PNG codec; `pix_sum` is its unsigned byte sum. */
  final case class VideoFrameRow(media_id: Long, frame_idx: Int,
                                 width: Int, height: Int, pix_sum: Long)

  /** Demux + frame-sample + per-frame decode, partition-local (1→N
    * explode; corrupt containers AND corrupt member frames both
    * quarantine by skip). */
  def sampleVideoFrames(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[MediaBlob]
      .mapPartitions(_.flatMap { blob =>
        Option(blob.content).flatMap(VideoCodec.tryDecode).toSeq.flatMap {
          frames =>
            frames.zipWithIndex
              .filter { case (_, idx) => idx % stride == 0 }
              .flatMap { case (png, idx) =>
                ImageCodec.tryDecode(png).map { d =>
                  var s = 0L
                  var i = 0
                  while (i < d.pixels.length) { s += (d.pixels(i) & 0xff); i += 1 }
                  VideoFrameRow(blob.media_id, idx, d.width, d.height, s)
                }
              }
        }
      })
      .toDF()
  }

  /** Closed-form sample value of synthetic clip `id` at index `j` — what
    * the generator writes and the DuckDB oracle recomputes:
    * ((id·7919 + j·131) mod 65536) − 32768, the full signed-16 range. */
  @inline private def synthSample(id: Long, j: Int): Short =
    (((id * 7919 + j * 131L) % 65536L) - 32768L).toShort

  private def synthAudioParams(id: Long): (Int, Int) =
    ((8000 + (id % 3) * 4000).toInt, (512 + (id % 7) * 128).toInt)

  /** Deterministic synthetic audio table of REAL WAV blobs (rate and
    * length derived from the id; samples follow [[synthSample]]). */
  def syntheticAudio(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val (rate, len) = synthAudioParams(i.toLong)
      val samples = Array.tabulate(len)(j => synthSample(i.toLong, j))
      Row(i.toLong, "audio", AudioCodec.encodeWav(rate, samples),
        "audio/wav", Map("mic" -> s"mic${i % 2}"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, n / 64)), mediaSchema)
  }

  /** Typed audio feature row — all-integer so the oracle matches exactly:
    * `energy` = Σ s², `peak` = max |s| (no float RMS; energy is the exact
    * sufficient statistic RMS derives from). */
  final case class AudioFeatures(media_id: Long, sample_rate: Int,
                                 n_samples: Long, duration_micros: Long,
                                 energy: Long, peak: Long)

  /** Decode + feature-extract for audio blobs: partition-local, corrupt
    * blobs quarantined by skip — the audio twin of [[extractFeatures]]. */
  def extractAudioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[MediaBlob]
      .mapPartitions(_.flatMap { blob =>
        Option(blob.content).flatMap(AudioCodec.tryDecode).map { d =>
          var energy = 0L
          var peak = 0L
          var i = 0
          while (i < d.samples.length) {
            val s = d.samples(i).toLong
            energy += s * s
            val a = math.abs(s)
            if (a > peak) peak = a
            i += 1
          }
          AudioFeatures(blob.media_id, d.sampleRate, d.samples.length.toLong,
            d.samples.length.toLong * 1000000L / d.sampleRate, energy, peak)
        }
      })
      .toDF()
  }

  // ------------------------------------------------------------------
  // Audio perceptual fingerprint (Haitsma-Kalker 2002 energy-delta
  // shape, time-domain simplification): re-encoded/re-leveled copies of
  // one clip hash within a few bits; unrelated clips differ in ~32 of
  // 64. The audio twin of [[dhash64]].
  // ------------------------------------------------------------------

  /** 64-bit audio fingerprint: split the clip into 65 equal frames
    * (frameLen = n div 65; the sub-frame tail is dropped), per-frame
    * energy Σs² in exact integers, bit f set iff energy(f+1) >
    * energy(f). Energy ratios survive resampling and mild noise while
    * unrelated content randomizes the 64 comparisons — and every step is
    * integer arithmetic on the decoded samples, so the q_dedup_audiofp
    * oracle recomputes the hash from the fixture's closed-form samples.
    * Clips shorter than 65 samples fingerprint to 0. */
  def audioFingerprint64(d: AudioCodec.DecodedAudio): Long = {
    val flen = d.samples.length / 65
    if (flen == 0) return 0L
    val en = new Array[Long](65)
    var f = 0
    while (f < 65) {
      var e = 0L
      var j = f * flen
      val end = j + flen
      while (j < end) {
        val s = d.samples(j).toLong
        e += s * s
        j += 1
      }
      en(f) = e
      f += 1
    }
    var h = 0L
    f = 0
    while (f < 64) {
      if (en(f + 1) > en(f)) h |= 1L << f
      f += 1
    }
    h
  }

  /** Per-clip fingerprint signature table — partition-local decode +
    * hash, corrupt blobs quarantined by skip. Column names match
    * [[Dedup.simhash]]'s signature contract so the hamming band
    * machinery applies as-is (same bridge as [[dhashSignatures]]). */
  def audioFingerprintSignatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[MediaBlob]
      .mapPartitions(_.flatMap { blob =>
        Option(blob.content).flatMap(AudioCodec.tryDecode)
          // sub-65-sample clips have no frames: a shared 0 fingerprint
          // would pair every such stub at distance 0 — skip them instead
          .filter(_.samples.length >= 65)
          .map(d => MediaSig(blob.media_id, audioFingerprint64(d)))
      })
      .toDF("doc_id", "sim")
  }

  /** Closed-form sample for the fingerprint fixture — the audio analog
    * of [[phashPixel]] (the linear [[synthSample]] ramp would give every
    * clip a near-identical delta profile): full signed-16 range with a
    * quadratic wobble, recomputed verbatim by the DuckDB oracle. The
    * noisy variant adds +4096 to every 7th sample (clamped away from
    * overflow) — loud enough to move frame energies, small enough that
    * the twin stays within a couple of fingerprint bits. */
  @inline private def fingerprintSample(src: Long, j: Int,
                                        noisy: Boolean): Short = {
    val s0 = ((src * 7919L + j.toLong * 131L + (j.toLong * j.toLong) % 1009L)
      % 65536L - 32768L).toShort
    if (noisy && j % 7 == 0)
      (if (s0 <= 32767 - 4096) s0 + 4096 else s0 - 4096).toShort
    else s0
  }

  /** Fixture for q_dedup_audiofp: `n` base WAV clips with
    * [[fingerprintSample]] samples and id-derived rate/length, plus
    * `twins` EXACT copies of clips 0..twins−1 under ids n+k (planted
    * distance-0 pairs), plus `twins` NOISY copies under ids 2n+k (the
    * re-encode-with-audible-noise near-dup, hamming ≤ a few bits), plus
    * one corrupt blob (id 3n) that must quarantine, not fail the job.
    * Special ids are DERIVED from n — fixed offsets (1000+k et al.)
    * would silently collide with base ids once a ScaleCheck factor
    * pushes n past the offset. */
  def syntheticFingerprintAudio(spark: SparkSession, n: Int,
                                twins: Int = 4): DataFrame = {
    require(twins <= n, s"twins ($twins) must be <= n ($n)")
    def wav(src: Long, noisy: Boolean): Array[Byte] = {
      val (rate, len) = synthAudioParams(src)
      AudioCodec.encodeWav(rate,
        Array.tabulate(len)(j => fingerprintSample(src, j, noisy)))
    }
    val base = (0 until n).map(i =>
      Row(i.toLong, "audio", wav(i.toLong, noisy = false), "audio/wav",
        Map("mic" -> s"mic${i % 2}")))
    val twinRows = (0 until twins).map(k =>
      Row(n.toLong + k, "audio", wav(k.toLong, noisy = false), "audio/wav",
        Map("mic" -> "twin")))
    val noisyRows = (0 until twins).map(k =>
      Row(2L * n + k, "audio", wav(k.toLong, noisy = true), "audio/wav",
        Map("mic" -> "noisy")))
    val corrupt = Seq(Row(3L * n, "audio",
      Array.tabulate[Byte](64)(i => (i * 37).toByte), "audio/wav",
      Map("mic" -> "corrupt")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(base ++ twinRows ++ noisyRows ++ corrupt,
        math.max(1, n / 16)), mediaSchema)
  }

  // ------------------------------------------------------------------
  // Crawled-media MANIFESTS without decode: real MP3 (MPEG-1 Layer III)
  // frame-header walks and real MP4 (ISO BMFF) box walks extract the
  // duration/bitrate/track features a curation pipeline filters on,
  // from headers alone — full PCM/pixel decode of these formats stays
  // documented OUT OF SCOPE (no bundled demuxer in a zero-dependency
  // build; the decodable formats here are PNG/JPEG/WAV/GVID above).
  // Where decode is impossible offline, the manifest IS the curation
  // input: duration outliers, absurd bitrates, track-less containers,
  // and corrupt files are all visible from the walk. Both walks follow
  // the Warc salvage discipline: junk bytes resync (MP3) / a malformed
  // box quarantines the remainder (MP4), parsed prefixes are kept, and
  // a file with nothing parseable flags `quarantined` instead of
  // failing the job. Reference anchor: repype/pipeline.py:79-118
  // (stages consuming upstream artifact fields — here the media table).
  // ------------------------------------------------------------------

  /** MPEG-1 Layer III framing (public spec: ISO/IEC 11172-3). Header =
    * 32 bits: 11-bit sync, version (11 = MPEG-1), layer (01 = III),
    * protection (1 = none) — together 0xFF 0xFB — then 4-bit bitrate
    * index, 2-bit sample-rate index, 1 padding bit. Frame length =
    * 144000·kbps/rate + padding bytes; 1152 samples per frame. */
  object Mp3Codec {
    /** kbps by bitrate index (1-14 valid; 0 = free, 15 = bad). */
    val BitrateKbps: Array[Int] =
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
    /** Hz by sample-rate index (0-2 valid; 3 = reserved). */
    val SampleRates: Array[Int] = Array(44100, 48000, 32000)
    val SamplesPerFrame = 1152

    def frameBytes(bitrateIdx: Int, srIdx: Int, padding: Int): Int =
      144000 * BitrateKbps(bitrateIdx) / SampleRates(srIdx) + padding

    /** One complete frame: 4-byte header + deterministic filler. The
      * filler generator must never emit 0xFF (fixtures keep sync bytes
      * unambiguous so the oracle's closed form is exact). */
    def encodeFrame(bitrateIdx: Int, srIdx: Int, padding: Int,
                    fill: Int => Byte): Array[Byte] = {
      val len = frameBytes(bitrateIdx, srIdx, padding)
      val out = new Array[Byte](len)
      out(0) = 0xFF.toByte
      out(1) = 0xFB.toByte
      out(2) = ((bitrateIdx << 4) | (srIdx << 2) | (padding << 1)).toByte
      out(3) = 0x00
      var j = 4
      while (j < len) { out(j) = fill(j - 4); j += 1 }
      out
    }

    final case class Mp3Meta(nFrames: Long, sampleRate: Int,
                             bitrateKbpsSum: Long, isVbr: Boolean,
                             durationMicros: Long, nTagBytes: Long,
                             nJunkBytes: Long, quarantined: Boolean)

    /** Header walk: an ID3v2 tag at offset 0 is skipped by its DECLARED
      * syncsafe size (counted as `nTagBytes`, not junk) — this is a
      * correctness rule, not accounting: tag payloads (album art)
      * routinely contain 0xFF 0xFB byte runs that a naive resync scan
      * would misparse as frames. Then: scan to the next valid sync,
      * validate the indexes, jump the whole frame — O(file bytes), no
      * decode. Junk bytes (garbage, mid-file damage) are counted and
      * resync'd over; a valid header whose frame overruns the buffer is
      * a truncated tail — its bytes count as junk and the walk stops
      * (parsed frames are KEPT); a file yielding zero frames is
      * `quarantined`. */
    def walk(bytes: Array[Byte]): Mp3Meta = {
      var i = 0
      var junk = 0L
      var tagBytes = 0L
      // ID3v2 header: "ID3" major minor flags size4(syncsafe — high bit
      // of each byte must be 0, else it is not a tag and falls through
      // to the junk scan); flags bit 4 = a 10-byte footer follows
      if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
          bytes(2) == '3' &&
          (bytes(6) & 0x80) == 0 && (bytes(7) & 0x80) == 0 &&
          (bytes(8) & 0x80) == 0 && (bytes(9) & 0x80) == 0) {
        val sz = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
          ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
        val footer = if ((bytes(5) & 0x10) != 0) 10 else 0
        val total = 10 + sz + footer
        if (total <= bytes.length) { tagBytes = total; i = total }
        else { // lying tag size: nothing after the header is trustable
          junk = bytes.length
          i = bytes.length
        }
      }
      var frames = 0L
      var kbpsSum = 0L
      var sr = 0
      val kbpsSeen = scala.collection.mutable.Set.empty[Int]
      while (i < bytes.length) {
        val canHeader = i + 4 <= bytes.length &&
          bytes(i) == 0xFF.toByte && bytes(i + 1) == 0xFB.toByte
        if (!canHeader) { junk += 1; i += 1 }
        else {
          val b2 = bytes(i + 2) & 0xFF
          val bi = b2 >> 4
          val si = (b2 >> 2) & 0x3
          val pad = (b2 >> 1) & 0x1
          if (bi < 1 || bi > 14 || si > 2) { junk += 1; i += 1 }
          else {
            val len = frameBytes(bi, si, pad)
            if (i + len > bytes.length) { // truncated tail: quarantine rest
              junk += bytes.length - i
              i = bytes.length
            } else {
              frames += 1
              kbpsSum += BitrateKbps(bi)
              kbpsSeen += BitrateKbps(bi)
              sr = SampleRates(si)
              i += len
            }
          }
        }
      }
      val duration =
        if (frames == 0) 0L
        else frames * SamplesPerFrame * 1000000L / sr
      Mp3Meta(frames, if (frames == 0) 0 else sr, kbpsSum,
        kbpsSeen.size > 1, duration, tagBytes, junk, frames == 0)
    }
  }

  /** Closed-form MP3 fixture parameters — what [[syntheticMp3]] writes
    * and the q_multimodal_mp3_meta oracle recomputes: garbage files at
    * id%31==30 (no sync anywhere), leading junk at id%5==0, an ID3v2
    * tag (payload carrying a FAKE frame header the declared-size skip
    * must never parse) at id%6==1 when no lead junk, a truncated tail
    * header at id%7==3, CBR at id%4==0 and a VBR ramp otherwise. */
  private[llm] def synthMp3Params(id: Long): (Int, Int) =
    ((id % 3).toInt, (3 + id % 6).toInt) // (srIdx, nFrames)
  private[llm] def synthMp3BitrateIdx(id: Long, f: Int): Int =
    if (id % 4 == 0) (1 + id % 14).toInt else (1 + (id + f) % 14).toInt

  /** The id-closed-form MP3 fixture bytes — shared by the in-memory
    * table ([[syntheticMp3]]) and the on-disk file staging
    * ([[mp3IngestDir]]) so the batch and streaming manifests see
    * byte-identical files and ONE oracle covers both. */
  private[llm] def synthMp3Bytes(i: Int): Array[Byte] = {
    val id = i.toLong
    if (i % 31 == 30) Array.tabulate((40 + i).toInt)(j => ((i + j) % 127).toByte)
    else {
      val (srIdx, nf) = synthMp3Params(id)
      val lead: Array[Byte] =
        if (i % 5 == 0)
          Array.tabulate(7 + i % 11)(j => ((i + j) % 127).toByte)
        else if (i % 6 == 1) {
          // real ID3v2.3 tag: payload size 20 + i%13, with a plausible
          // FRAME HEADER planted at payload offset 5 (album-art bytes in
          // the wild) — parseable only by a walk that ignores the
          // declared size
          val sz = 20 + i % 13
          val payload = Array.tabulate(sz)(j => ((i + j) % 127).toByte)
          payload(5) = 0xFF.toByte
          payload(6) = 0xFB.toByte
          payload(7) = 0x92.toByte // bitrateIdx 9, srIdx 0, padding 1
          Array[Byte]('I', 'D', '3', 3, 0, 0,
            ((sz >> 21) & 0x7F).toByte, ((sz >> 14) & 0x7F).toByte,
            ((sz >> 7) & 0x7F).toByte, (sz & 0x7F).toByte) ++ payload
        } else Array.emptyByteArray
      val frames = (0 until nf).flatMap { f =>
        Mp3Codec.encodeFrame(synthMp3BitrateIdx(id, f), srIdx,
          padding = ((i + f) % 2), fill = j => ((i * 37 + f * 11 + j) % 127).toByte)
      }
      val tail: Array[Byte] =
        if (i % 7 == 3) {
          val h = Mp3Codec.encodeFrame(1 + (i % 14), srIdx, padding = 0,
            fill = j => ((i + j) % 127).toByte)
          h.take(9) // valid header, frame cut off after 5 filler bytes
        } else Array.emptyByteArray
      lead ++ frames ++ tail
    }
  }

  /** Deterministic synthetic MP3 table: real MPEG frame sequences with
    * junk/truncation/garbage planted by closed forms of the id. Filler
    * and junk bytes are all < 0x7F, so no accidental sync patterns. */
  def syntheticMp3(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      Row(i.toLong, "audio", synthMp3Bytes(i), "audio/mpeg",
        Map("src" -> s"crawl${i % 4}"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, n / 16)), mediaSchema)
  }

  /** Staged on-disk copies of the 64 fixture MP3s (`mp3_NNN.mp3`) — the
    * binaryFile-stream front door's input, ids recoverable from the
    * filename exactly like the image-ingest fixture. */
  lazy val mp3IngestDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mp3-ing-")
    graft.core.Fs.deleteOnExit(dir, "graft-mp3-ing-cleanup")
    (0 until 64).foreach { i =>
      java.nio.file.Files.write(dir.resolve(f"mp3_$i%03d.mp3"),
        synthMp3Bytes(i))
    }
    dir.toString
  }

  /** Per-file MP3 manifest row (header walk, no decode). */
  final case class Mp3MetaRow(media_id: Long, n_frames: Long,
                              sample_rate: Int, bitrate_kbps_sum: Long,
                              is_vbr: Boolean, duration_micros: Long,
                              n_tag_bytes: Long, n_junk_bytes: Long,
                              quarantined: Boolean)

  def mp3Meta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[MediaBlob]
      .map { blob =>
        val m = Mp3Codec.walk(Option(blob.content).getOrElse(Array.emptyByteArray))
        Mp3MetaRow(blob.media_id, m.nFrames, m.sampleRate, m.bitrateKbpsSum,
          m.isVbr, m.durationMicros, m.nTagBytes, m.nJunkBytes,
          m.quarantined)
      }
      .toDF()
  }

  /** ISO BMFF (MP4) box framing (public spec: ISO/IEC 14496-12): a file
    * is a sequence of boxes `[int32 size][4cc type][payload]`; `moov`
    * contains `mvhd` (timescale at payload offset 12, duration at 16
    * for version 0) and one `trak` per track. The walk reads sizes and
    * types only — no sample decode. */
  object Mp4Codec {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length)
      b.put(tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      b.put(payload)
      b.array()
    }

    def ftyp(brand: String): Array[Byte] =
      box("ftyp", brand.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        ++ Array[Byte](0, 0, 0, 0)
        ++ "mp41".getBytes(java.nio.charset.StandardCharsets.US_ASCII))

    def mvhd(timescale: Int, durationUnits: Int): Array[Byte] = {
      val p = java.nio.ByteBuffer.allocate(24)
      p.putInt(0)             // version 0 + flags
      p.putInt(0)             // creation time
      p.putInt(0)             // modification time
      p.putInt(timescale)
      p.putInt(durationUnits)
      p.putInt(0x00010000)    // rate 1.0
      box("mvhd", p.array())
    }

    def moov(timescale: Int, durationUnits: Int, nTracks: Int): Array[Byte] =
      box("moov", mvhd(timescale, durationUnits)
        ++ (0 until nTracks).flatMap(_ => box("trak", Array.emptyByteArray)).toArray)

    final case class Mp4Meta(brand: String, timescale: Long,
                             durationUnits: Long, durationMicros: Long,
                             nTracks: Long, quarantined: Boolean)

    private def readInt(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
        ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

    private def fourCc(b: Array[Byte], i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private def readLong(b: Array[Byte], i: Int): Long = {
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (b(i + k) & 0xFFL); k += 1 }
      v
    }

    /** Top-level box walk + one-level moov walk, including the two
      * ISO BMFF size escapes real crawled media uses: declared size 1 =
      * a 64-bit `largesize` follows the 4cc (files > 4 GB frame their
      * mdat this way), declared size 0 = the box extends to END OF FILE
      * (legal for the last top-level box only). Any other size < 8, an
      * overrun, or a largesize box too short for its own header
      * quarantines the REMAINDER (parsed boxes are kept, the Warc
      * resync spirit — box framing has no sync word to resync on, so
      * the rest of the file is opaque). */
    def walk(bytes: Array[Byte]): Mp4Meta = {
      var i = 0
      var brand = ""
      var timescale = 0L
      var duration = 0L
      var tracks = 0L
      var sawBox = false
      var corrupt = false
      while (i + 8 <= bytes.length && !corrupt) {
        val size32 = readInt(bytes, i)
        val tpe = fourCc(bytes, i + 4)
        val (size, hdr) =
          if (size32 == 1L && i + 16 <= bytes.length)
            (readLong(bytes, i + 8), 16L) // largesize after the 4cc
          else if (size32 == 0L) ((bytes.length - i).toLong, 8L) // to EOF
          else (size32, 8L)
        if (size < hdr || i + size > bytes.length) corrupt = true
        else {
          sawBox = true
          tpe match {
            case "ftyp" if size >= hdr + 4 =>
              brand = fourCc(bytes, i + hdr.toInt)
            case "moov" =>
              var k = i + hdr.toInt
              val end = (i + size).toInt
              while (k + 8 <= end) {
                val cs = readInt(bytes, k)
                val ct = fourCc(bytes, k + 4)
                if (cs < 8 || k + cs > end) { corrupt = true; k = end }
                else {
                  if (ct == "mvhd" && cs >= 28) {
                    timescale = readInt(bytes, k + 8 + 12)
                    duration = readInt(bytes, k + 8 + 16)
                  }
                  if (ct == "trak") tracks += 1
                  k += cs.toInt
                }
              }
            case _ => ()
          }
          i = (i + size).toInt
        }
      }
      if (i < bytes.length) corrupt = true // trailing partial box header
      val micros =
        if (timescale == 0) 0L else duration * 1000000L / timescale
      Mp4Meta(brand, timescale, duration, micros, tracks,
        corrupt || !sawBox)
    }
  }

  /** Deterministic synthetic MP4 table: ftyp + moov(mvhd + trak×k),
    * with a malformed trailing box planted at id%9==5 (declared size 4
    * < header size — the walk must keep the parsed boxes and flag the
    * remainder). id%31==30 is pure garbage (quarantines whole). */
  def syntheticMp4(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val bytes: Array[Byte] =
        if (i % 31 == 30) Array.tabulate(48 + i)(j => ((i + j) % 127).toByte)
        else {
          val body = Mp4Codec.ftyp("isom") ++
            Mp4Codec.moov(600 + (i % 5) * 100, 1200 + i * 7, 1 + i % 3)
          if (i % 9 == 5)
            body ++ Array[Byte](0, 0, 0, 4) ++ "junk".getBytes("US-ASCII")
          else body
        }
      Row(i.toLong, "video", bytes, "video/mp4", Map("src" -> s"crawl${i % 4}"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, n / 16)), mediaSchema)
  }

  /** Per-file MP4 manifest row (box walk, no decode). `quarantined`
    * means SOMETHING was unparseable — a garbage file (no boxes at
    * all: every feature zero/empty) or a malformed trailing box
    * (parsed features kept). */
  final case class Mp4MetaRow(media_id: Long, brand: String,
                              timescale: Long, duration_units: Long,
                              duration_micros: Long, n_tracks: Long,
                              quarantined: Boolean)

  def mp4Meta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[MediaBlob]
      .map { blob =>
        val m = Mp4Codec.walk(Option(blob.content).getOrElse(Array.emptyByteArray))
        Mp4MetaRow(blob.media_id, m.brand, m.timescale, m.durationUnits,
          m.durationMicros, m.nTracks, m.quarantined)
      }
      .toDF()
  }
}
