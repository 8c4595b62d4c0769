package graft.sources

import java.io.InputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset tar shards — the published multimodal training-data
  * interchange (Aizman et al., "High Performance I/O For Large Scale
  * Deep Learning"; github.com/webdataset/webdataset): a dataset is a
  * set of POSIX tar files ("shards"); member files group into SAMPLES
  * by basename — everything up to the FIRST dot is the sample key,
  * the rest is the member extension (`000017.jpg`, `000017.json`,
  * `000017.seg.png` are one sample) — and a sample's members must be
  * stored contiguously so a dataloader can stream the shard without an
  * index.
  *
  * This is the engine's dataloader boundary in BOTH directions: a
  * curated multimodal corpus re-publishes as shards
  * ([[writeShards]]), and published shards crack back into rows
  * ([[readSamples]]) for curation/dedup/stats.
  *
  * Scale shape (the [[Warc]] discipline on both halves):
  *  - WRITE is one shuffle (repartition by sample key — co-locating a
  *    sample's members is the contiguity contract, and at production
  *    scale `numShards` ≈ corpusBytes / 1 GB) followed by
  *    embarrassingly parallel partition-local streaming: each task
  *    writes its tar member-by-member through a Hadoop FS output
  *    stream — O(member) heap, any Spark-visible filesystem — to an
  *    attempt-suffixed temp file renamed into place (retried or
  *    speculative tasks last-win on their own shard).
  *  - READ is path-streaming: only the `path` column of the
  *    `binaryFile` listing enters the task, the shard opens as a
  *    Hadoop FS stream inside it, and the 512-byte-block walk holds
  *    O(member) heap. One task per shard file — the format's own unit
  *    of parallelism.
  *
  * Corruption contract: tar has no resync marker (unlike WARC's
  * per-record magic), so a shard quarantines from the FIRST invalid
  * header block onward — members before the corruption are kept,
  * everything after is unrecoverable and dropped; a member whose data
  * is truncated mid-stream is dropped. [[shardReport]] makes the
  * quarantines visible (the [[Warc.segmentReport]] rule: silent
  * skipping is invisible data loss).
  *
  * Determinism: headers write mtime 0, mode 0644, uid/gid 0 — byte-
  * identical shards for identical input partitions, so roundtrip
  * queries hash-check the full write∘read composition.
  */
object WebDataset {

  private val BlockSize = 512

  // ---------------------------------------------------------------- tar

  /** One USTAR header block. `name` must fit the 100-byte name field —
    * sample keys are caller-controlled basenames, so overflow is a
    * caller bug, not a truncation case. */
  private def tarHeader(name: String, size: Long): Array[Byte] = {
    val nameB = name.getBytes(StandardCharsets.UTF_8)
    require(nameB.length <= 100,
      s"tar member name exceeds 100 bytes: $name")
    require(size >= 0, s"negative member size: $size")
    val h = new Array[Byte](BlockSize)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, h, off, b.length)
    }
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    put(100, "0000644\u0000") // mode
    put(108, "0000000\u0000") // uid
    put(116, "0000000\u0000") // gid
    put(124, f"$size%011o\u0000")
    put(136, "00000000000\u0000") // mtime 0: deterministic shards
    put(148, "        ") // chksum field is spaces while summing
    h(156) = '0' // typeflag: regular file
    put(257, "ustar\u000000") // magic + version
    put(329, "0000000\u0000") // devmajor
    put(337, "0000000\u0000") // devminor
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
    put(148, f"$sum%06o\u0000 ")
    h
  }

  private def pad(size: Long): Int =
    ((BlockSize - (size % BlockSize)) % BlockSize).toInt

  /** Parse one tar stream into (memberName, bytes) pairs — lazily, one
    * member in memory at a time. Stops (quarantining the remainder) at
    * the end-of-archive zero block, an invalid header (bad magic or
    * checksum), or truncated member data; skips non-regular members
    * (directories, links) by advancing past their data. */
  private[graft] def parseMembers(
      in: InputStream): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var nextM: (String, Array[Byte]) = _
      private var done = false
      advance()
      override def hasNext: Boolean = nextM != null
      override def next(): (String, Array[Byte]) = {
        val m = nextM; advance(); m
      }
      private def readFully(buf: Array[Byte]): Boolean = {
        var off = 0
        while (off < buf.length) {
          val r = try in.read(buf, off, buf.length - off)
          catch { case _: java.io.IOException => -1 }
          if (r < 0) return false
          off += r
        }
        true
      }
      /** Exactly `n` payload bytes, allocated in grow-as-read chunks
        * (start 64 KiB, double up to `n`): a truncated stream under a
        * lying size field costs O(bytes actually present), and the
        * final exact-size copy only happens once all `n` arrived. */
      private def readChunked(n: Int): Option[Array[Byte]] = {
        var buf = new Array[Byte](math.min(n, 64 * 1024))
        var off = 0
        while (off < n) {
          if (off == buf.length)
            buf = java.util.Arrays.copyOf(buf,
              math.min(n.toLong, buf.length * 2L).toInt)
          val r = try in.read(buf, off, buf.length - off)
          catch { case _: java.io.IOException => -1 }
          if (r < 0) return None
          off += r
        }
        Some(if (buf.length == n) buf else java.util.Arrays.copyOf(buf, n))
      }
      private def headerValid(h: Array[Byte]): Boolean = {
        if (!(h(257) == 'u' && h(258) == 's' && h(259) == 't'
            && h(260) == 'a' && h(261) == 'r')) return false
        var sum = 0L
        var i = 0
        while (i < BlockSize) {
          sum += (if (i >= 148 && i < 156) ' ' else h(i) & 0xff); i += 1
        }
        octal(h, 148, 8).contains(sum)
      }
      /** Octal field parse: digits between leading spaces and the
        * NUL/space terminator; None if no digits or a non-octal char. */
      private def octal(h: Array[Byte], off: Int, len: Int): Option[Long] = {
        var i = off
        val end = off + len
        while (i < end && h(i) == ' ') i += 1
        var v = 0L
        var any = false
        while (i < end && h(i) != 0 && h(i) != ' ') {
          val c = h(i)
          if (c < '0' || c > '7') return None
          v = v * 8 + (c - '0'); any = true; i += 1
        }
        if (any) Some(v) else None
      }
      private def closeQuietly(): Unit =
        try in.close() catch { case _: java.io.IOException => () }
      @annotation.tailrec
      private def advance(): Unit = {
        nextM = null
        if (done) return
        val h = new Array[Byte](BlockSize)
        if (!readFully(h)) { done = true; closeQuietly(); return }
        if (h.forall(_ == 0)) { done = true; closeQuietly(); return }
        if (!headerValid(h)) { done = true; closeQuietly(); return }
        val size = octal(h, 124, 12) match {
          case Some(s) => s
          case None => done = true; closeQuietly(); return
        }
        val nameEnd0 = h.indexWhere(_ == 0)
        val nameEnd = if (nameEnd0 < 0 || nameEnd0 > 100) 100 else nameEnd0
        val name = new String(h, 0, nameEnd, StandardCharsets.UTF_8)
        // members beyond Int range can't materialize as one array —
        // and WebDataset members are sample files, not archives
        if (size > Int.MaxValue - 8) { done = true; closeQuietly(); return }
        // CHUNKED read, never a size-field-sized upfront allocation: a
        // lying size field in a corrupt/adversarial header must cost
        // heap proportional to the bytes that physically exist, not to
        // the claim (the Arrow r14 attack class — ContainerProps pins
        // the allocation bound for all four container formats)
        val data = readChunked(size.toInt) match {
          case Some(d) => d
          case None => done = true; closeQuietly(); return
        }
        val padB = new Array[Byte](pad(size))
        if (padB.nonEmpty && !readFully(padB)) {
          done = true; closeQuietly(); return
        }
        if (h(156) == '0' || h(156) == 0) nextM = (name, data)
        else advance() // non-regular member: skip, keep walking
      }
    }

  /** Gzip-or-plain wrapping + task-completion close guard (the
    * [[Warc]] rule): a broken gzip header quarantines the whole shard
    * instead of failing the task. */
  private def guardedStream(path: String,
                            raw: InputStream): InputStream = {
    val in: InputStream =
      if (path.endsWith(".gz"))
        scala.util.Try(
            new java.util.zip.GZIPInputStream(raw, 64 * 1024): InputStream)
          .getOrElse {
            try raw.close() catch { case _: java.io.IOException => () }
            new java.io.ByteArrayInputStream(Array.emptyByteArray)
          }
      else raw
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ =>
        try in.close() catch { case _: java.io.IOException => () }))
    in
  }

  // -------------------------------------------------------------- write

  /** Write flat sample-member rows as WebDataset tar shards:
    * `keyCol`/`extCol`/`dataCol` are the sample key, member extension,
    * and member bytes; each member lands as `key.ext` in its shard.
    * One shuffle partitions by sample key (a sample's members MUST
    * share a shard) and sorts members contiguously within it — the
    * format's streaming-dataloader contract. Returns members written.
    *
    * `numShards` 0 keeps the session's shuffle partitioning; at
    * production scale pick numShards ≈ corpusBytes / 1 GB.
    *
    * Re-write contract (shared with [[Warc.writeResponses]]): shards
    * are keyed by partition id, so re-running into the SAME dir is a
    * clean overwrite only when the partition count is unchanged — pass
    * an explicit `numShards` (the streaming publisher does; its
    * re-delivered batches rewrite byte-identically) or write into a
    * fresh/keyed directory. */
  def writeShards(samples: DataFrame, dir: String, numShards: Int = 0,
                  keyCol: String = "sample_key", extCol: String = "ext",
                  dataCol: String = "data"): Long = {
    val spark = samples.sparkSession
    val hc = org.apache.spark.graftshim.GraftSparkInternals
      .broadcastHadoopConf(spark.sparkContext)
    import spark.implicits._
    val src = samples.select(col(keyCol).cast("string").as("k"),
      col(extCol).cast("string").as("e"), col(dataCol).as("d"))
    PartFiles.clearStaging(dir, spark.sparkContext.hadoopConfiguration)
    val gen = PartFiles.stagingDir(dir)
    val parted =
      (if (numShards > 0) src.repartition(numShards, col("k"))
       else src.repartition(col("k")))
        .sortWithinPartitions(col("k"), col("e"))
    val counts = parted.as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val name = f"shard_$pid%06d.tar"
          val fin = new org.apache.hadoop.fs.Path(s"$gen/$name")
          val tmp = new org.apache.hadoop.fs.Path(
            f"$gen/.shard_$pid%06d.${tc.taskAttemptId()}.tmp")
          val fs = fin.getFileSystem(hc.conf)
          val out = fs.create(tmp, true)
          var n = 0L
          try {
            it.foreach { case (k, e, d) =>
              out.write(tarHeader(if (e.isEmpty) k else s"$k.$e", d.length))
              out.write(d)
              out.write(new Array[Byte](pad(d.length)))
              n += 1
            }
            out.write(new Array[Byte](2 * BlockSize)) // end-of-archive
          } finally out.close()
          fs.delete(fin, false)
          if (!fs.rename(tmp, fin))
            throw new java.io.IOException(s"rename $tmp -> $fin failed")
          Iterator.single((name, n))
        }
      }.collect() // one (name, count) per shard — bounded driver state
    PartFiles.publishGeneration(dir, "shard_", ".tar",
      counts.map(_._1).toIndexedSeq,
      spark.sparkContext.hadoopConfiguration)
    counts.map(_._2).sum
  }

  // --------------------------------------------------------------- read

  /** Crack a directory of `.tar` / `.tar.gz` shards into flat member
    * rows `(shard, sample_key, ext, data, n_bytes)` — sample key is the
    * basename up to the FIRST dot (the WebDataset grouping rule), ext
    * the rest. One task per shard; O(member) heap (path-streaming). */
  def readSamples(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hc = org.apache.spark.graftshim.GraftSparkInternals
      .broadcastHadoopConf(spark.sparkContext)
    // recursive: a streamed publisher lays shards out as batch-keyed
    // segment subdirs; `.`/`_`-prefixed temps are hidden by the listing
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true").load(dir)
      .select("path").as[String]
      .flatMap { path =>
        val p = new org.apache.hadoop.fs.Path(path)
        val raw: InputStream =
          try p.getFileSystem(hc.conf).open(p): InputStream
          catch {
            case _: java.io.FileNotFoundException =>
              new java.io.ByteArrayInputStream(Array.emptyByteArray)
          }
        val shard = p.getName
        parseMembers(guardedStream(path, raw)).map { case (name, data) =>
          val dot = name.indexOf('.')
          val key = if (dot < 0) name else name.substring(0, dot)
          val ext = if (dot < 0) "" else name.substring(dot + 1)
          (shard, key, ext, data, data.length.toLong)
        }
      }
      .toDF("shard", "sample_key", "ext", "data", "n_bytes")
  }

  /** BLOB-decoding stage for STREAMED shards (the [[Warc.decodeSegments]]
    * contract: this variant exists for the binaryFile stream, where
    * content arrives per micro-batch anyway — batch scans use the
    * path-streaming [[readSamples]]): each row's `content` bytes parse
    * as one tar shard under the same framing/quarantine rules; `path`
    * supplies the shard name. Output schema identical to
    * [[readSamples]]. */
  def decodeShardBlobs(files: DataFrame): DataFrame = {
    import files.sparkSession.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        if (bytes == null) Iterator.empty
        else {
          val shard = new org.apache.hadoop.fs.Path(path).getName
          parseMembers(guardedStream(path,
            new java.io.ByteArrayInputStream(bytes)))
            .map { case (name, data) =>
              val dot = name.indexOf('.')
              val key = if (dot < 0) name else name.substring(0, dot)
              val ext = if (dot < 0) "" else name.substring(dot + 1)
              (shard, key, ext, data, data.length.toLong)
            }
        }
      }
      .toDF("shard", "sample_key", "ext", "data", "n_bytes")
  }

  /** Per-shard scan report: members parsed, distinct samples, member
    * bytes — the quarantine-visibility row ([[Warc.segmentReport]]
    * rule). A shard that parses to zero members (corrupt from the
    * first header, bad gzip) flags `quarantined`. Bounded by shard
    * count. */
  def shardReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hc = org.apache.spark.graftshim.GraftSparkInternals
      .broadcastHadoopConf(spark.sparkContext)
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true").load(dir)
      .select("path").as[String]
      .map { path =>
        val p = new org.apache.hadoop.fs.Path(path)
        val raw: InputStream =
          try p.getFileSystem(hc.conf).open(p): InputStream
          catch {
            case _: java.io.FileNotFoundException =>
              new java.io.ByteArrayInputStream(Array.emptyByteArray)
          }
        var members = 0L
        var bytes = 0L
        val keys = scala.collection.mutable.HashSet.empty[String]
        parseMembers(guardedStream(path, raw)).foreach { case (n, d) =>
          members += 1
          bytes += d.length
          val dot = n.indexOf('.')
          keys += (if (dot < 0) n else n.substring(0, dot))
        }
        (p.getName, members, keys.size.toLong, bytes, members == 0L)
      }
      .toDF("shard", "n_members", "n_samples", "member_bytes",
        "quarantined")
  }
}
