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
  * Pass-through cost: O(1) state, no payload buffering (payload bytes
  * stream through with a countdown), one small staging buffer for the
  * framing scalars. Valid containers are byte-identical through the
  * guard.
  */
private[sources] final class AvroFramingGuard(in: InputStream,
                                              totalLen: Long)
  extends InputStream {

  private var consumed = 0L // bytes pulled from `in`
  private def remaining: Long = math.max(totalLen - consumed, 0L)

  // validated bytes ready to deliver
  private var staged: Array[Byte] = Array.emptyByteArray
  private var stagedPos = 0
  // > 0: that many payload bytes stream through without staging
  private var passThrough = 0L
  private var dead = false // EOF to the consumer, forever

  // parser position: 0=magic, 1=meta map, 2=header sync, 3=block loop
  private var state = 0
  // whether the container declares a compression codec (avro.codec
  // metadata, captured while the map streams through): compressed
  // blocks get the tighter size cap below
  private var compressed = false

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
                        val codec = new String(out.toByteArray, vFrom,
                          vLen.toInt, java.nio.charset.StandardCharsets.UTF_8)
                        compressed = codec.nonEmpty && codec != "null"
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
                  (!compressed ||
                    size <= AvroFramingGuard.MaxCompressedBlockBytes) =>
                out.write(t.toByteArray)
                passThrough = size + 16L // payload + block sync
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
    while (!dead && stagedPos >= staged.length && passThrough == 0L)
      stageNext()
    if (stagedPos < staged.length) {
      val n = math.min(len, staged.length - stagedPos)
      System.arraycopy(staged, stagedPos, buf, off, n)
      stagedPos += n
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

  /** Compressed-block size cap. The physical-remainder check bounds
    * what a block header can CLAIM, but a compressed block decompresses
    * whole into heap BEFORE any record decode (DataFileStream grows a
    * buffer to the full decompressed size), and deflate expands up to
    * ~1032:1 — so without this cap a physically-present 10 MB bomb
    * block still means a ~10 GB fatal allocation (the r15 review's
    * deflate-bomb finding). 1 MiB compressed bounds the decompression
    * transient at ~1 GB worst-case — survivable and catch-adjacent —
    * while legitimate blocks are sync-interval-sized (Avro's default is
    * 64 KB pre-compression; the engine's own writer uses the default),
    * so real containers sit 16× under the cap. An oversized block
    * truncates cleanly at the previous block boundary (decoded rows
    * kept), the established quarantine rule — never a crash. Null-codec
    * blocks decode in place and need only the physical bound. */
  val MaxCompressedBlockBytes: Long = 1L << 20
}
