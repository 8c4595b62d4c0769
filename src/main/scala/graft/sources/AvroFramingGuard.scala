package graft.sources

import java.io.InputStream

/** Framing validator for UNTRUSTED Avro object-container streams — the
  * Avro member of the bounded-allocation family (ArrowIo.allocBound,
  * the tar/WARC chunked reads): `DataFileStream` allocates its block
  * buffer (`new byte[blockSize]`, up to 2 GiB) straight from the block
  * header's length varint BEFORE reading a single payload byte, so one
  * corrupted length in a corrupt/adversarial container costs
  * claim-sized heap instead of data-sized heap — the r14 Arrow attack
  * class, one format over.
  *
  * The guard sits between the raw stream and `DataFileStream`, parsing
  * the container framing (magic, metadata map, sync, then
  * [count][byteSize][payload][sync] blocks) AHEAD of delivery: every
  * length field (metadata key/value/size, block byteSize) must be
  * non-negative and no larger than the bytes that PHYSICALLY remain
  * (`totalLen` is ground truth — the blob's array length or the file's
  * status length). A violating block header is WITHHELD entirely, so
  * the consumer sees a clean EOF at the last valid block boundary —
  * exactly the established truncation contract (decoded blocks kept,
  * remainder quarantined) — and the lying allocation never happens.
  * A violation inside the file header truncates there, which
  * `DataFileStream` construction reports as a structurally unreadable
  * container (quarantine whole), again the established rule.
  *
  * Pass-through cost: O(1) state for uncompressed and small-compressed
  * blocks (payload bytes stream through with a countdown), one small
  * staging buffer for the framing scalars — with ONE stated exception:
  * a deflate block larger than
  * [[AvroFramingGuard.PrecheckThresholdBytes]] is buffered ONCE
  * (data-sized heap — the bytes physically exist, capped at
  * [[AvroFramingGuard.MaxBufferedCompressedBytes]]) so its decompressed
  * size can be counted by a streaming inflate BEFORE the decoder is
  * allowed to allocate it; snappy blocks instead have their leading
  * size claim peeked (≤ 5 bytes, no buffering). Valid containers are
  * byte-identical through the guard.
  */
private[sources] final class AvroFramingGuard(in: InputStream,
                                              totalLen: Long)
  extends InputStream {

  private var consumed = 0L // bytes pulled from `in`
  private def remaining: Long = math.max(totalLen - consumed, 0L)

  // validated bytes ready to deliver
  private var staged: Array[Byte] = Array.emptyByteArray
  private var stagedPos = 0
  // a pre-checked large-block payload, delivered AFTER `staged` (kept
  // as its own array — routing it through the staging BAOS would copy
  // it twice more and break the max-array ceiling near 2 GiB)
  private var stagedPayload: Array[Byte] = Array.emptyByteArray
  private var stagedPayloadPos = 0
  // > 0: that many payload bytes stream through without staging
  private var passThrough = 0L
  private var dead = false // EOF to the consumer, forever

  // parser position: 0=magic, 1=meta map, 2=header sync, 3=block loop
  private var state = 0
  // the container's declared compression codec (avro.codec metadata,
  // captured while the map streams through; "" / "null" = none):
  // large compressed blocks get the inflate pre-check below
  private var codecName = ""
  private def compressed: Boolean =
    codecName.nonEmpty && codecName != "null"

  private def pull(): Int = {
    if (remaining <= 0) return -1
    val b = try in.read() catch { case _: java.io.IOException => -1 }
    if (b >= 0) consumed += 1
    b
  }

  /** Read one Avro varint (zigzag long, ≤ 10 bytes) from `in` into
    * `buf`; returns the decoded value, or None on EOF/overlong. */
  private def varint(buf: java.io.ByteArrayOutputStream): Option[Long] = {
    var u = 0L
    var shift = 0
    var i = 0
    while (i < 10) {
      val b = pull()
      if (b < 0) return None
      buf.write(b)
      u |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return Some((u >>> 1) ^ -(u & 1L))
      shift += 7
      i += 1
    }
    None // an 11-byte varint is not a long
  }

  /** Parse + stage the next validated segment. Sets `dead` on a
    * framing violation or clean end. */
  private def stageNext(): Unit = {
    val out = new java.io.ByteArrayOutputStream(64)
    def fixed(n: Int): Boolean = { // raw bytes, no length semantics
      var i = 0
      var eof = false
      while (i < n && !eof) {
        val b = pull()
        if (b < 0) eof = true else { out.write(b); i += 1 }
      }
      !eof
    }
    // a length that claims more than physically remains is the attack
    // (the Int ceiling also keeps the .toInt casts below exact)
    def lenOk(n: Long): Boolean =
      n >= 0 && n <= remaining && n <= Int.MaxValue
    state match {
      case 0 => // magic: 4 raw bytes (DataFileStream validates content)
        if (!fixed(4)) dead = true
        state = 1
      case 1 => // metadata map: one count + its entries per call
        varint(out) match {
          case None => dead = true
          case Some(0) => state = 2
          case Some(nRaw) =>
            var ok = true
            if (nRaw < 0) { // negative count: a byteSize long precedes
              ok = varint(out).exists(lenOk)
            }
            val entries = math.abs(nRaw)
            var e = 0L
            while (ok && e < entries) {
              ok = varint(out).filter(lenOk).exists { kLen => // key
                val kFrom = out.size()
                fixed(kLen.toInt) && {
                  val key = new String(out.toByteArray, kFrom, kLen.toInt,
                    java.nio.charset.StandardCharsets.UTF_8)
                  varint(out).filter(lenOk).exists { vLen =>
                    val vFrom = out.size()
                    fixed(vLen.toInt) && {
                      if (key == "avro.codec") {
                        codecName = new String(out.toByteArray, vFrom,
                          vLen.toInt, java.nio.charset.StandardCharsets.UTF_8)
                      }
                      true
                    }
                  }
                }
              }
              e += 1
            }
            if (!ok) dead = true
        }
      case 2 => // header sync marker
        if (!fixed(16)) dead = true
        state = 3
      case 3 => // one data block: count, byteSize, payload+sync follow
        val t = new java.io.ByteArrayOutputStream(24)
        varint(t) match {
          case None => dead = true // clean EOF at a block boundary
          case Some(count) =>
            varint(t) match {
              case Some(size) if count >= 0 && lenOk(size) &&
                  codecName == "snappy" =>
                // snappy DECLARES its decompressed size up front (the
                // raw-snappy leading varint) and Avro's SnappyCodec
                // allocates exactly that CLAIM before decompressing —
                // so at EVERY block size the claim, not a ratio, is
                // what must be bounded. Peek the varint (≤ 5 bytes),
                // withhold a bomb claim loudly, stream the rest.
                val peek = new Array[Byte](math.min(5L, size).toInt)
                var got = 0
                var eof = false
                while (got < peek.length && !eof) {
                  val n = try in.read(peek, got, peek.length - got)
                  catch { case _: java.io.IOException => -1 }
                  if (n < 0) eof = true
                  else { consumed += n; got += n }
                }
                if (eof) dead = true // truncated payload
                else AvroFramingGuard.snappyClaim(peek) match {
                  case Some(claim)
                      if claim <= AvroFramingGuard.MaxInflatedBlockBytes =>
                    out.write(t.toByteArray)
                    out.write(peek)
                    passThrough = size - peek.length + 16L
                  case _ => // bomb claim or unparseable preamble
                    AvroFramingGuard.noteWithheld(codecName, size)
                    dead = true
                }
              case Some(size) if count >= 0 && lenOk(size) &&
                  (!compressed || (codecName == "deflate" &&
                    size <= AvroFramingGuard.PrecheckThresholdBytes)) =>
                // the no-check fast path: uncompressed blocks decode in
                // place, and deflate's ≤1032:1 ratio bounds a ≤1 MiB
                // block's transient at ~1 GiB. zstd/bzip2/xz ratios are
                // UNBOUNDED (a KB-scale zstd bomb can emit tens of GiB)
                // so they take the counting pre-check at EVERY size
                out.write(t.toByteArray)
                passThrough = size + 16L // payload + block sync
              case Some(size) if count >= 0 && lenOk(size) &&
                  size <= AvroFramingGuard.MaxBufferedCompressedBytes =>
                // LARGE compressed block. A single record > threshold is
                // VALID Avro (a block always holds a whole record), so
                // withholding on input size alone silently drops real
                // data (the r15 advice finding). Instead buffer the
                // payload ONCE (data-sized heap — the bytes physically
                // exist; delivered via stagedPayload, never re-copied)
                // and bound the decompression TRANSIENT: a streaming
                // inflate counts output and only a genuine bomb (output
                // past MaxInflatedBlockBytes) is withheld, loudly.
                val payload = new Array[Byte](size.toInt)
                var got = 0
                var eof = false
                while (got < payload.length && !eof) {
                  val want = math.min(payload.length - got,
                    remaining).toInt
                  val n = if (want == 0) -1
                  else try in.read(payload, got, want)
                  catch { case _: java.io.IOException => -1 }
                  if (n < 0) eof = true
                  else { consumed += n; got += n }
                }
                if (eof) dead = true // truncated payload
                else if (AvroFramingGuard.inflatesWithinCap(
                    codecName, payload)) {
                  out.write(t.toByteArray)
                  stagedPayload = payload
                  stagedPayloadPos = 0
                  passThrough = 16L // block sync
                } else {
                  AvroFramingGuard.noteWithheld(codecName, size)
                  dead = true
                }
              case Some(size) if count >= 0 && lenOk(size) =>
                // compressed block past the 1 GiB buffering ceiling: no
                // legitimate record is this large (string/bytes cells
                // cap at 256 MiB) and buffering it would court the max-
                // array limit — withhold loudly
                AvroFramingGuard.noteWithheld(codecName, size)
                dead = true
              case _ => dead = true // withhold the lying header
            }
        }
      case _ => dead = true
    }
    staged = out.toByteArray
    stagedPos = 0
  }

  override def read(): Int = {
    val one = new Array[Byte](1)
    val n = read(one, 0, 1)
    if (n <= 0) -1 else one(0) & 0xff
  }

  override def read(buf: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    while (!dead && stagedPos >= staged.length &&
        stagedPayloadPos >= stagedPayload.length && passThrough == 0L)
      stageNext()
    if (stagedPos < staged.length) {
      val n = math.min(len, staged.length - stagedPos)
      System.arraycopy(staged, stagedPos, buf, off, n)
      stagedPos += n
      n
    } else if (stagedPayloadPos < stagedPayload.length) {
      val n = math.min(len, stagedPayload.length - stagedPayloadPos)
      System.arraycopy(stagedPayload, stagedPayloadPos, buf, off, n)
      stagedPayloadPos += n
      if (stagedPayloadPos >= stagedPayload.length)
        stagedPayload = Array.emptyByteArray // free the block promptly
      n
    } else if (passThrough > 0L) {
      val want = math.min(len.toLong, math.min(passThrough, remaining))
      if (want == 0L) { dead = true; return -1 } // truncated payload
      val n = try in.read(buf, off, want.toInt)
      catch { case _: java.io.IOException => -1 }
      if (n < 0) { dead = true; -1 }
      else {
        consumed += n
        passThrough -= n
        n
      }
    } else -1
  }

  override def close(): Unit = in.close()
}

private[sources] object AvroFramingGuard {

  /** Compressed blocks at or under this size stream through without a
    * pre-check: deflate expands at most ~1032:1, so the decompression
    * transient inside `DataFileStream` is bounded at ~1 GiB —
    * survivable — without buffering anything. Legitimate blocks are
    * usually sync-interval-sized (Avro's default is 64 KB
    * pre-compression), so almost all real blocks take this zero-cost
    * path. */
  val PrecheckThresholdBytes: Long = 1L << 20

  /** Decompressed-size cap for blocks above the threshold. A block
    * always holds at least one whole record and the engine's own
    * string/bytes limits sit at 256 MiB (AvroIo), so 1 GiB of decoded
    * block is far above any legitimate container and far below the
    * multi-hundred-GiB output of a physically-small deflate bomb (the
    * r15 review's finding). The check bounds the decompression
    * TRANSIENT by counting streaming-inflate OUTPUT — valid containers
    * of any compressed block size pass (the r15 advice's silent-data-
    * loss fix); only genuine bombs are withheld, and loudly. */
  val MaxInflatedBlockBytes: Long = 1L << 30

  /** Buffering ceiling for the deflate pre-check path: a single
    * compressed block past 1 GiB is beyond any legitimate record
    * (string/bytes cells cap at 256 MiB) and buffering it would court
    * the JVM max-array limit — withheld loudly instead. */
  val MaxBufferedCompressedBytes: Long = 1L << 30

  /** The decompressed-size CLAIM at the head of a raw-snappy payload
    * (unsigned LEB128 varint — snappy's preamble, which Avro's
    * SnappyCodec allocates verbatim before decompressing). None when
    * the preamble is malformed. */
  private[sources] def snappyClaim(peek: Array[Byte]): Option[Long] = {
    var u = 0L
    var shift = 0
    var i = 0
    while (i < peek.length && shift <= 28) {
      val b = peek(i) & 0xff
      u |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return Some(u)
      shift += 7
      i += 1
    }
    None // ran out of bytes or a >32-bit claim: malformed either way
  }

  /** Blocks withheld by the size check since JVM start — the loud
    * counter the r15 advice asked for (a withheld block must never
    * present as a silent clean EOF). */
  val withheldBlocks = new java.util.concurrent.atomic.AtomicLong

  private[sources] def noteWithheld(codec: String, size: Long): Unit = {
    withheldBlocks.incrementAndGet()
    org.slf4j.LoggerFactory.getLogger(getClass).warn(
      s"AvroFramingGuard: withheld a $size-byte '$codec' block whose " +
        s"decompressed size exceeds $MaxInflatedBlockBytes bytes (or " +
        "whose codec cannot be pre-checked); the remainder of this " +
        "container is quarantined")
  }

  /** True iff `payload` is safe to hand to the decoder: its
    * decompressed size, counted by streaming the codec's own
    * decompressor into a small reused buffer, stays within
    * [[MaxInflatedBlockBytes]]. Avro's deflate codec is RAW deflate
    * (nowrap); zstandard/bzip2/xz count through their commons-
    * compress / zstd-jni streams (Avro's own codecs decompress via
    * growth-to-actual-output, so bounding the counted output bounds
    * the decoder's transient). A payload that FAILS to decompress is
    * safe to deliver — the decoder's failure produces at most what the
    * count saw before the error, and the established decode-ahead
    * quarantine handles it — EXCEPT an xz dictionary claim past the
    * memory limit, which must be withheld (the decoder would allocate
    * the claim). Snappy is pre-checked by its OWN preamble claim
    * ([[snappyClaim]], any block size); an unknown codec name is
    * withheld above the threshold rather than trusted. */
  private[sources] def inflatesWithinCap(codec: String,
                                         payload: Array[Byte]): Boolean = {
    def countStream(
        open: java.io.InputStream => java.io.InputStream): Boolean = {
      val in =
        try open(new java.io.ByteArrayInputStream(payload))
        catch {
          case _: org.apache.commons.compress.MemoryLimitException =>
            return false // a header CLAIM past the limit: withhold
          case scala.util.control.NonFatal(_) =>
            return true // malformed: downstream quarantines it cheaply
        }
      try {
        val buf = new Array[Byte](64 << 10)
        var total = 0L
        var n = 0
        while ({
          n = try in.read(buf)
          catch {
            case _: org.apache.commons.compress.MemoryLimitException =>
              return false
            case scala.util.control.NonFatal(_) => -1
          }
          n >= 0
        }) {
          total += n
          if (total > MaxInflatedBlockBytes) return false
        }
        true
      } finally {
        try in.close()
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    codec match {
      case "deflate" =>
        val inf = new java.util.zip.Inflater(true)
        try {
          inf.setInput(payload)
          val buf = new Array[Byte](64 << 10)
          var total = 0L
          var done = false
          while (!done && !inf.finished()) {
            val n =
              try inf.inflate(buf)
              catch {
                case _: java.util.zip.DataFormatException => return true
              }
            if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
              done = true // truncated/odd stream: downstream quarantines
            total += n
            if (total > MaxInflatedBlockBytes) return false
          }
          true
        } finally inf.end()
      case "zstandard" =>
        countStream(s =>
          new com.github.luben.zstd.ZstdInputStreamNoFinalizer(s))
      case "bzip2" =>
        countStream(s => new org.apache.commons.compress.compressors
          .bzip2.BZip2CompressorInputStream(s))
      case "xz" =>
        // memory limit in KiB: an xz dict claim past 1 GiB withholds
        countStream(s => new org.apache.commons.compress.compressors
          .xz.XZCompressorInputStream(s, false, 1 << 20))
      case _ => false
    }
  }
}
