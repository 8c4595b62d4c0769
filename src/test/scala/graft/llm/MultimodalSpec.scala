package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ground truth for the multimodal path with the REAL javax.imageio PNG
  * codec: byte-exact raster round-trips, closed-form feature recovery,
  * corrupt-blob quarantine. */
class MultimodalSpec extends SparkSpec {

  test("PNG encode/decode round-trips the RGB raster byte-exactly") {
    val (w, h) = (8, 6)
    val raster = Array.tabulate(w * h * 3)(j => ((j * 13 + 7) % 256).toByte)
    val bytes = Multimodal.ImageCodec.encodePng(w, h, raster)
    // real PNG magic, not a synthetic header
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte &&
      bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte)
    val d = Multimodal.ImageCodec.decode(bytes)
    assert(d.width == 8 && d.height == 6 && d.channels == 3)
    assert(java.util.Arrays.equals(d.pixels, raster))
  }

  test("corrupt and non-image bytes are quarantined, not task-killers") {
    assert(Multimodal.ImageCodec.tryDecode("not a png".getBytes).isEmpty)
    assert(Multimodal.ImageCodec.tryDecode(Array[Byte](0x89.toByte, 'P', 'N',
      'G', 13, 10, 26, 10, 0, 0)).isEmpty)
    val media = Multimodal.syntheticMedia(spark, 5)
    import SparkSpec.spark.implicits._
    val corrupt = Seq((99L, "image", "garbage".getBytes, "image/png",
      Map("camera" -> "camX"))).toDF("media_id", "kind", "content", "mime", "meta")
    val feats = Multimodal.extractFeatures(media.unionByName(corrupt)).collect()
    assert(feats.length == 5, "corrupt blob must be skipped, valid ones kept")
  }

  test("extractFeatures recovers the closed-form pixel stats per media") {
    val n = 50
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, n))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5))).toMap
    assert(feats.size == n)
    (0 until n).foreach { i =>
      val w = 4 + i % 28
      val h = 4 + (i * 7) % 28
      val cnt = w * h * 3
      val sum = (0 until cnt).map(j => (i.toLong * 31 + j) % 256).sum
      assert(feats(i.toLong) == (w, h, 3, cnt.toLong, sum * 1000000L / cnt),
        s"media $i decoded features diverge from the closed form")
    }
  }

  test("resize produces target dims, preserves channels") {
    val media = Multimodal.syntheticMedia(spark, 10)
    val feats = Multimodal.extractFeatures(
      Multimodal.resize(media, 16, 12)).collect()
    assert(feats.length == 10)
    assert(feats.forall(r => r.getInt(1) == 16 && r.getInt(2) == 12 &&
      r.getInt(3) == 3))
  }

  test("sampleFrames explodes height/stride rows with exact row content") {
    val media = Multimodal.syntheticMedia(spark, 10)
    val frames = Multimodal.sampleFrames(media, stride = 4).collect()
    val byMedia = frames.groupBy(_.getLong(0))
    (0 until 10).foreach { i =>
      val w = 4 + i % 28
      val h = 4 + (i * 7) % 28
      val mine = byMedia(i.toLong)
      assert(mine.length == (h + 3) / 4)
      mine.foreach { r =>
        val y = r.getInt(1)
        val expected = (0 until w * 3)
          .map(k => (i.toLong * 31 + y * w * 3 + k) % 256).sum
        assert(r.getLong(3) == expected,
          s"frame (media $i, row $y) byte sum diverges")
      }
    }
  }

  test("AudioCodec WAV encode→decode round-trips samples and rate exactly") {
    val samples = Array.tabulate(1000)(j =>
      (((j * 131L + 7919L) % 65536L) - 32768L).toShort)
    val wav = Multimodal.AudioCodec.encodeWav(16000, samples)
    // real RIFF container: starts with the magic, carries a parsed header
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val d = Multimodal.AudioCodec.decode(wav)
    assert(d.sampleRate == 16000 && d.channels == 1)
    assert(d.samples.toSeq == samples.toSeq)
  }

  test("extractAudioFeatures quarantines corrupt blobs and keeps the rest") {
    val media = Multimodal.syntheticAudio(spark, 8)
    // corrupt blob 3 (truncated header) and null out blob 5
    val broken = media.withColumn("content",
      when(col("media_id") === 3, expr("substring(content, 1, 10)"))
        .when(col("media_id") === 5, lit(null).cast("binary"))
        .otherwise(col("content")))
    val out = Multimodal.extractAudioFeatures(broken).collect()
    assert(out.map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 4L, 6L, 7L))
    // surviving rows carry the closed-form energy (spot-check id 0)
    val n0 = 512L
    val expEnergy = (0L until n0).map { j =>
      val s = ((0L * 7919 + j * 131) % 65536) - 32768; s * s
    }.sum
    assert(out.find(_.getLong(0) == 0L).get.getLong(4) == expEnergy)
  }

  test("VideoCodec container round-trips frames; truncation quarantines") {
    val frames = (0 until 3).map { f =>
      Multimodal.ImageCodec.encodePng(4, 4,
        Array.tabulate(48)(j => ((f * 17 + j) % 256).toByte))
    }
    val blob = Multimodal.VideoCodec.encode(frames)
    val back = Multimodal.VideoCodec.decode(blob)
    assert(back.length == 3)
    assert(back.zip(frames).forall { case (a, b) => a.sameElements(b) })
    // truncated container (index promises more bytes than present) → None
    assert(Multimodal.VideoCodec.tryDecode(blob.dropRight(5)).isEmpty)
    // bad magic → None
    assert(Multimodal.VideoCodec.tryDecode("nope".getBytes ++ blob).isEmpty)
  }

  test("sampleVideoFrames decodes every stride-th frame with exact content") {
    val out = Multimodal.sampleVideoFrames(
        Multimodal.syntheticVideo(spark, 6), stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(4)))
    (0 until 6).foreach { i =>
      val (w, h, nf) = (4 + i % 28, 4 + (i * 7) % 28, 4 + i % 8)
      val mine = out.filter(_._1 == i.toLong)
      assert(mine.map(_._2).toSeq == (0 until nf by 2).toSeq)
      mine.foreach { case (_, f, sum) =>
        val exp = (0 until w * h * 3).map(j => (i * 31 + f * 17 + j) % 256).sum
        assert(sum == exp, s"video $i frame $f pixel sum diverges")
      }
    }
  }

  test("imageDhashPairs surfaces pixel-identical twins at distance 0 and " +
      "quarantines the corrupt blob") {
    val pairs = Dedup.imageDhashPairs(
        Multimodal.syntheticPhashMedia(spark, 16, twins = 2), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // planted twins: EXACT pixel copies must pair with their source at 0
    // (twin ids are n+k = 16+k for this n=16 fixture)
    assert(pairs.contains((0L, 16L, 0)), s"twin of 0 missing: ${pairs.toSeq}")
    assert(pairs.contains((1L, 17L, 0)), s"twin of 1 missing: ${pairs.toSeq}")
    // noisy twins (ids 2n+k = 32+k) are byte-DIFFERENT PNGs (+1 on every
    // 97th raster byte) that still pair — the perceptual matching an
    // exact hash would miss
    assert(pairs.exists(p => p._1 == 0L && p._2 == 32L),
      s"noisy twin of 0 missing: ${pairs.toSeq}")
    // the corrupt blob (id 3n = 48) contributes no signature, hence no pair
    assert(!pairs.exists(p => p._1 == 48L || p._2 == 48L))
    // canonical pair orientation
    assert(pairs.forall(p => p._1 < p._2))
  }

  test("JPEG: lossy decode keeps dims exact and mean within a tolerance " +
      "window; byte-identical twins hash to 0; re-encodes stay within " +
      "the perceptual bar; corrupt blobs quarantine") {
    val n = 16
    val media = Multimodal.syntheticJpegPhashMedia(spark, n, twins = 2)
    // decode gate: JPEG loses pixel values but never dims; the mean
    // survives within a small window (DC coefficients dominate)
    val feats = Multimodal.extractFeatures(media)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2),
        r.getLong(5))).toMap
    assert(!feats.contains(3L * n), "corrupt JPEG must quarantine")
    (0 until n).foreach { i =>
      val (w, h) = ((4 + i % 28), (4 + (i * 7) % 28))
      val (dw, dh, mean) = feats(i.toLong)
      assert((dw, dh) == (w, h), s"dims of $i: got ($dw,$dh) want ($w,$h)")
      // raster mean of the phash pixel form is near-uniform over 0..255
      // (~127.5); JPEG keeps the block DC means, so the decoded mean
      // stays within a ±12 window of mid-gray in micro-units
      assert(math.abs(mean - 127500000L) < 12000000L,
        s"mean of $i drifted: $mean")
    }
    val sigs = Multimodal.dhashSignatures(media)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0 until 2).foreach { k =>
      assert(sigs(k.toLong) == sigs(n.toLong + k),
        s"byte-identical twin $k must hash identically")
      val reH = java.lang.Long.bitCount(sigs(k.toLong) ^ sigs(2L * n + k))
      info(s"re-encode hamming for $k: $reH")
      // JPEG artifacts flip more comparison bits than PNG noise — the
      // radius the 16-band bucketing exists to cover losslessly
      assert(reH <= 12, s"re-encoded copy of $k drifted to hamming $reH")
    }
    // unrelated base pairs stay far — the perceptual margin
    val farH = java.lang.Long.bitCount(sigs(2L) ^ sigs(9L))
    assert(farH > 12, s"unrelated images too close: $farH")
    // the 16-band candidate path surfaces both planted pair kinds and
    // equals brute force at radius 12 (pigeonhole: lossless < 16)
    val banded = Dedup.imageDhashPairs(media, maxHamming = 12, numBands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (id1, s1) <- sigs.toSeq; (id2, s2) <- sigs.toSeq if id1 < id2
      h = java.lang.Long.bitCount(s1 ^ s2) if h <= 12
    } yield (id1, id2, h)).toSet
    assert(banded == brute,
      s"banded missing ${brute -- banded}, extra ${banded -- brute}")
    (0 until 2).foreach { k =>
      assert(banded.contains((k.toLong, n.toLong + k, 0)))
      assert(banded.exists(p => p._1 == k.toLong && p._2 == 2L * n + k))
    }
  }

  test("banded dhash pair surface equals brute force (pigeonhole at <8)") {
    val media = Multimodal.syntheticPhashMedia(spark, 24, twins = 3)
    val sigs = Multimodal.dhashSignatures(media)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (id1, s1) <- sigs; (id2, s2) <- sigs if id1 < id2
      h = java.lang.Long.bitCount(s1 ^ s2) if h <= 6
    } yield (id1, id2, h)).toSet
    val banded = Dedup.imageDhashPairs(media, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute,
      s"banded missing ${brute -- banded}, extra ${banded -- brute}")
  }

  test("audioFingerprintPairs surfaces sample-identical twins at 0, noisy " +
      "twins within the bar, and quarantines the corrupt blob") {
    val pairs = Dedup.audioFingerprintPairs(
        Multimodal.syntheticFingerprintAudio(spark, 16, twins = 2),
        maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // planted twins: EXACT sample copies must pair with their source at 0
    // (twin ids are n+k = 16+k for this n=16 fixture)
    assert(pairs.contains((0L, 16L, 0)), s"twin of 0 missing: ${pairs.toSeq}")
    assert(pairs.contains((1L, 17L, 0)), s"twin of 1 missing: ${pairs.toSeq}")
    // noisy twins (ids 2n+k = 32+k) are byte-DIFFERENT WAVs (+4096 on
    // every 7th sample) that still pair — the perceptual matching an
    // exact hash would miss
    assert(pairs.exists(p => p._1 == 0L && p._2 == 32L),
      s"noisy twin of 0 missing: ${pairs.toSeq}")
    // the corrupt blob (id 3n = 48) contributes no signature, hence no pair
    assert(!pairs.exists(p => p._1 == 48L || p._2 == 48L))
    assert(pairs.forall(p => p._1 < p._2))
  }

  test("banded audio fingerprint pair surface equals brute force") {
    val media = Multimodal.syntheticFingerprintAudio(spark, 24, twins = 3)
    val sigs = Multimodal.audioFingerprintSignatures(media)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (id1, s1) <- sigs; (id2, s2) <- sigs if id1 < id2
      h = java.lang.Long.bitCount(s1 ^ s2) if h <= 4
    } yield (id1, id2, h)).toSet
    val banded = Dedup.audioFingerprintPairs(media, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute,
      s"banded missing ${brute -- banded}, extra ${banded -- brute}")
  }

  test("Mp3Codec.walk: resync over junk, frame accounting, VBR flag, " +
      "truncated-tail quarantine keeps parsed frames, garbage " +
      "quarantines whole") {
    import Multimodal.Mp3Codec
    def frame(bi: Int, si: Int, pad: Int) =
      Mp3Codec.encodeFrame(bi, si, pad, j => (j % 100).toByte)
    // clean CBR file: 3 identical-bitrate frames
    val cbr = Array.concat(frame(9, 0, 0), frame(9, 0, 1), frame(9, 0, 0))
    val m1 = Mp3Codec.walk(cbr)
    assert(m1.nFrames == 3 && m1.sampleRate == 44100 && !m1.isVbr)
    assert(m1.bitrateKbpsSum == 3 * 128)
    assert(m1.durationMicros == 3L * 1152 * 1000000L / 44100)
    assert(m1.nJunkBytes == 0 && !m1.quarantined)
    // leading ID3-ish junk resyncs; mixed bitrates flag VBR
    val junk = Array.tabulate[Byte](11)(j => (j % 90).toByte)
    val m2 = Mp3Codec.walk(junk ++ frame(1, 1, 0) ++ frame(14, 1, 0))
    assert(m2.nFrames == 2 && m2.sampleRate == 48000 && m2.isVbr)
    assert(m2.bitrateKbpsSum == 32 + 320)
    assert(m2.nJunkBytes == 11)
    // truncated tail: a valid header whose frame overruns — the parsed
    // prefix is KEPT, the tail bytes count as junk
    val m3 = Mp3Codec.walk(frame(5, 2, 0) ++ frame(5, 2, 0).take(9))
    assert(m3.nFrames == 1 && m3.nJunkBytes == 9 && !m3.quarantined)
    // pure garbage (no sync anywhere): quarantined, everything zero
    val m4 = Mp3Codec.walk(Array.tabulate[Byte](64)(j => (j % 120).toByte))
    assert(m4.quarantined && m4.nFrames == 0 && m4.sampleRate == 0
      && m4.durationMicros == 0 && m4.nJunkBytes == 64)
    // a sync with an invalid bitrate index (15) is JUNK, not a frame
    val bad = frame(9, 0, 0)
    bad(2) = 0xF0.toByte
    val m5 = Mp3Codec.walk(bad)
    assert(m5.nFrames == 0 && m5.quarantined)
  }

  test("Mp3Codec.walk: an ID3v2 tag skips by its DECLARED syncsafe size " +
      "— a fake frame header inside the tag payload must never parse — " +
      "and a lying tag size quarantines") {
    import Multimodal.Mp3Codec
    def frame(bi: Int, si: Int, pad: Int) =
      Mp3Codec.encodeFrame(bi, si, pad, j => (j % 100).toByte)
    def id3(payload: Array[Byte]): Array[Byte] = {
      val sz = payload.length
      Array[Byte]('I', 'D', '3', 3, 0, 0,
        ((sz >> 21) & 0x7F).toByte, ((sz >> 14) & 0x7F).toByte,
        ((sz >> 7) & 0x7F).toByte, (sz & 0x7F).toByte) ++ payload
    }
    // album-art shape: tag payload carrying plausible frame-header bytes
    val art = Array.tabulate[Byte](40)(j => (j % 100).toByte)
    art(5) = 0xFF.toByte; art(6) = 0xFB.toByte; art(7) = 0x92.toByte
    val m1 = Mp3Codec.walk(id3(art) ++ frame(9, 0, 0) ++ frame(9, 0, 0))
    assert(m1.nFrames == 2, s"fake in-tag header parsed as a frame: $m1")
    assert(m1.nTagBytes == 50 && m1.nJunkBytes == 0 && !m1.quarantined)
    // the same bytes WITHOUT the tag framing WOULD parse a bogus frame
    // region — proving the skip (not luck) protects the walk
    val naive = Mp3Codec.walk(art)
    assert(naive.nFrames >= 1 || naive.nJunkBytes == 40)
    // lying declared size (larger than the file): nothing trustable
    val lying = id3(art).take(20)
    val m2 = Mp3Codec.walk(lying)
    assert(m2.quarantined && m2.nFrames == 0 && m2.nJunkBytes == 20
      && m2.nTagBytes == 0)
    // a non-syncsafe size byte means NOT a tag: the 50 header+payload
    // bytes fall through to the junk scan, the real frame still parses
    val cleanArt = Array.tabulate[Byte](40)(j => (j % 100).toByte)
    val bogus = id3(cleanArt)
    bogus(6) = 0x80.toByte
    val m3 = Mp3Codec.walk(bogus ++ frame(1, 1, 0))
    assert(m3.nFrames == 1 && m3.nTagBytes == 0 && m3.nJunkBytes == 50)
    // footer flag adds 10 to the skip
    val withFooter = id3(art)
    withFooter(5) = 0x10.toByte
    val m4 = Mp3Codec.walk(
      withFooter ++ Array.fill[Byte](10)(0x21) ++ frame(9, 0, 0))
    assert(m4.nFrames == 1 && m4.nTagBytes == 60 && m4.nJunkBytes == 0)
  }

  test("Mp4Codec.walk: ftyp brand, mvhd timescale/duration, trak count; " +
      "malformed box quarantines the remainder keeping parsed features") {
    import Multimodal.Mp4Codec
    val clean = Mp4Codec.ftyp("isom") ++ Mp4Codec.moov(1000, 2500, 2)
    val m1 = Mp4Codec.walk(clean)
    assert(m1.brand == "isom" && m1.timescale == 1000
      && m1.durationUnits == 2500 && m1.nTracks == 2 && !m1.quarantined)
    assert(m1.durationMicros == 2500L * 1000000L / 1000)
    // malformed trailing box (declared size < 8): parsed features kept,
    // remainder quarantined
    val m2 = Mp4Codec.walk(clean
      ++ Array[Byte](0, 0, 0, 4) ++ "junk".getBytes("US-ASCII"))
    assert(m2.brand == "isom" && m2.nTracks == 2 && m2.quarantined)
    // a child box overrunning its moov parent also quarantines
    val evilMoov = Mp4Codec.box("moov",
      Array[Byte](0, 0, 8, 0) ++ "mvhd".getBytes("US-ASCII"))
    val m3 = Mp4Codec.walk(Mp4Codec.ftyp("isom") ++ evilMoov)
    assert(m3.brand == "isom" && m3.quarantined)
    // pure garbage: nothing parses
    val m4 = Mp4Codec.walk(Array.tabulate[Byte](32)(j => (j % 120).toByte))
    assert(m4.quarantined && m4.brand == "" && m4.nTracks == 0)
    // size==1 largesize framing (the >4 GB mdat shape): the box walk
    // must jump by the 64-bit size, not treat it as corrupt
    def large(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16 + payload.length)
      b.putInt(1)
      b.put(tpe.getBytes("US-ASCII"))
      b.putLong(16L + payload.length)
      b.put(payload)
      b.array()
    }
    val moovBytes = Mp4Codec.moov(1000, 2500, 2)
    val moovPayload = java.util.Arrays.copyOfRange(
      moovBytes, 8, moovBytes.length)
    val m5 = Mp4Codec.walk(Mp4Codec.ftyp("isom") ++ large("moov", moovPayload))
    assert(m5.brand == "isom" && m5.timescale == 1000 && m5.nTracks == 2
      && !m5.quarantined, m5.toString)
    // size==0 = box extends to end of file (legal for the LAST box)
    val eofBox = {
      val p = Array.tabulate[Byte](24)(j => (j % 100).toByte)
      val b = java.nio.ByteBuffer.allocate(8 + p.length)
      b.putInt(0)
      b.put("mdat".getBytes("US-ASCII"))
      b.put(p)
      b.array()
    }
    val m6 = Mp4Codec.walk(clean ++ eofBox)
    assert(m6.brand == "isom" && m6.nTracks == 2 && !m6.quarantined)
    // a largesize header cut off mid-way quarantines the remainder
    val m7 = Mp4Codec.walk(clean ++ large("mdat", new Array[Byte](32)).take(12))
    assert(m7.brand == "isom" && m7.nTracks == 2 && m7.quarantined)
  }
}
