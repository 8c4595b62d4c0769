package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (ISO 28500) container source — the native format of published
  * web corpora (Common Crawl ships ~1 GB `.warc.gz` segment files; every
  * published web-scale curation pipeline starts by cracking these).
  *
  * Spark-first shape: the built-in `binaryFile` source lists and reads
  * the segment files (one row per file), and record extraction is
  * partition-local imperative byte work — the same justified-`flatMap`
  * contract as the multimodal decoders ([[graft.llm.Multimodal]]): the
  * format is sequential framing, not columnar, so there is nothing for
  * Catalyst to push down INTO a segment. Parallelism is file-level by
  * design — `.warc.gz` members are not splittable mid-file without an
  * external index, and the published pipelines treat the ~1 GB segment
  * as the task unit (a 100 TB crawl is ~100k segments → ~100k tasks,
  * ample for a 1000-executor cluster). Zero shuffle: scan → flatMap →
  * downstream filters all stay in one stage.
  *
  * Robustness contract (mirrors the decode-quarantine discipline): a
  * record whose framing is broken (bad header block, missing/invalid
  * Content-Length, truncated payload, unparseable HTTP head) is dropped
  * and the parser RESYNCS at the next `WARC/1.` magic, so one corrupt
  * record never poisons the rest of a multi-GB segment.
  *
  * Reference anchor: repype/task.py:189-213 (inputs enumerated from
  * configured roots; the engine owns format cracking).
  */
object Warc {

  /** One extracted HTTP response document. */
  case class WarcDoc(
      record_id: String,
      url: String,
      warc_date: String,
      http_status: Int,
      content_type: String,
      text: String,
      n_bytes: Long)

  private val Magic = "WARC/1.".getBytes(StandardCharsets.US_ASCII)

  /** Records claiming a payload larger than this are treated as corrupt
    * framing — no real WARC document approaches 64 MB, and trusting an
    * absurd length would let one lying record demand an absurd payload
    * buffer. The parser rescans for the next magic instead. */
  private val MaxRecordBytes: Int = 64 << 20

  private val CharsetRe =
    "(?i)charset\\s*=\\s*(\"[^\"]*\"|[^;\\s]+)".r

  /** The charset declared in a Content-Type header value, when present
    * AND supported by the JVM (`charset=unknown-8bit` and friends fall
    * through to the detection heuristic, not to an error). */
  private[graft] def charsetOf(
      contentType: String): Option[java.nio.charset.Charset] =
    CharsetRe.findFirstMatchIn(contentType).flatMap { m =>
      val name = m.group(1).stripPrefix("\"").stripSuffix("\"").trim
      scala.util.Try(java.nio.charset.Charset.forName(name)).toOption
    }

  /** Decode with replacement (a stray bad byte yields U+FFFD, never an
    * exception — one mojibake character must not drop the record). */
  private def decodeWith(cs: java.nio.charset.Charset, bytes: Array[Byte],
                         off: Int, len: Int): String =
    cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
      .decode(java.nio.ByteBuffer.wrap(bytes, off, len)).toString

  /** windows-1252 with an ISO-8859-1 backstop (only the former can be
    * absent from a JVM, and then only a crippled one). */
  private val Fallback1252: java.nio.charset.Charset =
    scala.util.Try(java.nio.charset.Charset.forName("windows-1252"))
      .getOrElse(StandardCharsets.ISO_8859_1)

  /** Charset-aware HTTP body decode — the CCNet-shape rule real crawls
    * need (~30% of pages are non-UTF-8; decoding them as UTF-8
    * mojibakes the corpus and poisons langid/shingles/quality scores
    * downstream):
    *
    *  1. a declared, supported `charset=` in the Content-Type header
    *     wins (decoded with replacement for stray bad bytes);
    *  2. otherwise STRICT UTF-8 is attempted — ASCII and valid UTF-8
    *     pages (the majority) decode exactly;
    *  3. bytes that are NOT valid UTF-8 decode as windows-1252, the
    *     dominant encoding of undeclared/misdeclared legacy pages
    *     (every byte maps, so this path never fails).
    */
  private[graft] def decodeBody(bytes: Array[Byte], off: Int, len: Int,
                                contentType: String): String =
    charsetOf(contentType) match {
      case Some(cs) => decodeWith(cs, bytes, off, len)
      case None =>
        try StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
          .decode(java.nio.ByteBuffer.wrap(bytes, off, len)).toString
        catch {
          case _: java.nio.charset.CharacterCodingException =>
            decodeWith(Fallback1252, bytes, off, len)
        }
    }

  /** Parse a `Name: value` header block (case-insensitive names). */
  private def parseHeaders(block: String): Map[String, String] =
    block.split("\r\n").iterator.flatMap { line =>
      val c = line.indexOf(':')
      if (c <= 0) None
      else Some(line.substring(0, c).trim.toLowerCase ->
        line.substring(c + 1).trim)
    }.toMap

  /** Extract the HTTP response documents of one WARC segment STREAM, in
    * O(record) memory — the decompressed segment never materializes, so
    * segment size is bounded only by `binaryFile`'s compressed-blob
    * limit (Common Crawl's ~1 GB `.warc.gz` unit fits with headroom).
    * Non-response records (warcinfo, request, metadata, …) are skipped;
    * malformed records are dropped with a rescan for the next magic; a
    * TRUNCATED record (claimed length runs past EOF) resets to just
    * after its own header and rescans, so a lying Content-Length cannot
    * swallow the records behind it; an IO error mid-stream (a corrupt
    * gzip member) ends the iteration with everything already parsed —
    * quarantine-the-remainder, since gzip framing cannot be resynced. */
  private[graft] def parseResponses(
      in0: java.io.InputStream): Iterator[WarcDoc] =
    new Iterator[WarcDoc] {
      // `var`: a truncated record pushes its partially-read payload back
      // as a SequenceInputStream prefix (see advance) — recovery without
      // mark/reset, whose mark(n) would grow and permanently retain the
      // buffered stream's internal buffer up to the largest claimed
      // Content-Length, double-buffering every payload thereafter
      private var in: java.io.InputStream =
        new java.io.BufferedInputStream(in0, 64 * 1024)
      private var nextDoc: WarcDoc = _
      private var finished = false
      advance()

      override def hasNext: Boolean = nextDoc != null
      override def next(): WarcDoc = {
        val d = nextDoc
        advance()
        d
      }

      /** Consume bytes until a whole magic has been read; false at EOF.
        * "WARC/1." repeats its first byte nowhere else, so the restart
        * rule on 'W' is exact. */
      private def scanToMagic(): Boolean = {
        var m = 0
        while (m < Magic.length) {
          val b = in.read()
          if (b < 0) return false
          if (b == Magic(m)) m += 1
          else m = if (b == Magic(0)) 1 else 0
        }
        true
      }

      /** The header block after the magic, through its CRLFCRLF (64 KB
        * cap — a header that long is corrupt framing). */
      private def readHeaderBlock(): Option[Array[Byte]] = {
        val buf = new java.io.ByteArrayOutputStream(512)
        var tail = 0 // matched prefix of \r\n\r\n at the current end
        while (buf.size < 65536) {
          val b = in.read()
          if (b < 0) return None
          buf.write(b)
          tail =
            if (b == "\r\n\r\n".charAt(tail)) tail + 1
            else if (b == '\r') 1
            else 0
          if (tail == 4) return Some(buf.toByteArray)
        }
        None
      }

      /** (payload, bytesRead) — bytesRead < n means the stream ended
        * mid-payload (a truncated or lying Content-Length). Allocated
        * in grow-as-read chunks, NOT `n` upfront: a lying
        * Content-Length (≤ [[MaxRecordBytes]] but far past the bytes
        * that exist) must cost heap proportional to reality — the same
        * allocation discipline as the tar/Arrow walks (ContainerProps).
        * On a full read the returned array is exactly `n` long (the
        * record contract downstream parsing relies on); truncated reads
        * may return a longer buffer, valid through `bytesRead`. */
      private def readUpTo(n: Int): (Array[Byte], Int) = {
        var buf = new Array[Byte](math.min(n, 64 * 1024))
        var off = 0
        var r = 0
        while (off < n && r >= 0) {
          if (off == buf.length)
            buf = java.util.Arrays.copyOf(buf,
              math.min(n.toLong, buf.length * 2L).toInt)
          r = in.read(buf, off, buf.length - off)
          if (r > 0) off += r
        }
        if (off == n && buf.length != n)
          buf = java.util.Arrays.copyOf(buf, n)
        (buf, off)
      }

      private def closeQuietly(): Unit =
        try in.close() catch { case _: java.io.IOException => () }

      private def advance(): Unit = {
        nextDoc = null
        try {
          while (nextDoc == null && !finished) {
            if (!scanToMagic()) { finished = true; closeQuietly() }
            else readHeaderBlock() match {
              case None => // runaway/EOF header: rescan finds EOF or magic
              case Some(block) =>
                val headers = parseHeaders(
                  new String(block, StandardCharsets.UTF_8))
                headers.get("content-length")
                  .flatMap(v => scala.util.Try(v.toLong).toOption) match {
                  case Some(n) if n >= 0 && n <= MaxRecordBytes =>
                    val (payload, got) = readUpTo(n.toInt)
                    if (got < n) {
                      // truncated: push the partial payload back and
                      // rescan it — records that physically exist inside
                      // a lying record's claimed span are recovered,
                      // same semantics as a reset-to-after-header
                      in = new java.io.SequenceInputStream(
                        new java.io.ByteArrayInputStream(payload, 0, got), in)
                    } else if (headers.get("warc-type").contains("response"))
                      httpResponse(payload, headers).foreach(d => nextDoc = d)
                  case _ => // bad/missing/absurd length: rescan at magic
                }
            }
          }
        } catch {
          case _: java.io.IOException =>
            finished = true
            nextDoc = null
            closeQuietly()
        }
      }
    }

  /** In-memory convenience overload (specs, small fixtures). */
  private[graft] def parseResponses(bytes: Array[Byte]): Seq[WarcDoc] =
    parseResponses(new java.io.ByteArrayInputStream(bytes)).toSeq

  /** Split one `application/http` payload into (status, content-type,
    * body); None when the HTTP head is malformed. */
  private def httpResponse(payload: Array[Byte],
                           warcHeaders: Map[String, String]): Option[WarcDoc] = {
    var bodyStart = -1
    var i = 0
    while (bodyStart < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') bodyStart = i + 4
      i += 1
    }
    if (bodyStart < 0) return None
    val head = new String(payload, 0, bodyStart, StandardCharsets.UTF_8)
    val lines = head.split("\r\n")
    val status = lines.headOption.map(_.split(" ")) match {
      case Some(parts) if parts.length >= 2 && parts(0).startsWith("HTTP/") =>
        scala.util.Try(parts(1).toInt).toOption
      case _ => None
    }
    status.map { st =>
      val httpHeaders = parseHeaders(lines.drop(1).mkString("\r\n"))
      val bodyLen = payload.length - bodyStart
      val ctype = httpHeaders.getOrElse("content-type", "")
      WarcDoc(
        record_id = warcHeaders.getOrElse("warc-record-id", ""),
        url = warcHeaders.getOrElse("warc-target-uri", ""),
        warc_date = warcHeaders.getOrElse("warc-date", ""),
        http_status = st,
        content_type = ctype,
        text = decodeBody(payload, bodyStart, bodyLen, ctype),
        n_bytes = bodyLen.toLong)
    }
  }

  /** Scan a directory of `.warc` / `.warc.gz` segments into a DataFrame
    * of HTTP response documents. One task per segment file (see the
    * object doc for why that is the right split unit); the listing's
    * PATH column alone enters the task and the segment opens as a
    * Hadoop FS stream inside it ([[decodeSegmentPaths]]), so the batch
    * scan holds O(64 KB buffers) per in-flight task — never the
    * segment blob. A segment whose gzip header is unreadable
    * quarantines whole (empty iterator) instead of failing the job. */
  def readResponses(spark: SparkSession, dir: String): DataFrame =
    decodeSegmentPaths(spark)(spark.read.format("binaryFile").load(dir))

  /** The shared gzip-or-plain wrapping + task-completion close guard of
    * both decode stages: `raw` is the segment byte stream; a broken
    * gzip header quarantines the whole segment (empty stream) instead
    * of failing the task. */
  private def guardedSegmentStream(path: String,
                                   raw: java.io.InputStream): java.io.InputStream = {
    val in: java.io.InputStream =
      if (path.endsWith(".gz"))
        scala.util.Try(
            new java.util.zip.GZIPInputStream(raw, 64 * 1024): java.io.InputStream)
          .getOrElse {
            try raw.close() catch { case _: java.io.IOException => () }
            new java.io.ByteArrayInputStream(Array.emptyByteArray)
          }
      else raw
    // the parser closes `in` at exhaustion/IO-error; the listener is
    // the backstop for consumers that abandon the iterator early
    // (limit, take) — a GZIPInputStream's native Inflater otherwise
    // waits for GC, and an abandoned FS stream would leak its socket
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ =>
        try in.close() catch { case _: java.io.IOException => () }))
    in
  }

  /** PATH-streaming decode stage — the 100 TB memory contract: only the
    * `path` column of the `binaryFile` listing reaches the task
    * (column pruning means the source never loads file contents), and
    * the segment opens via the Hadoop FileSystem INSIDE the task. Heap
    * per in-flight task is O(64 KB buffers) + O(record), versus the
    * blob variant's O(compressed segment) — at Common Crawl's ~1 GB
    * segments, 32 concurrent blob tasks held ~32 GB of byte arrays
    * (and binaryFile caps files at ~2 GB outright). Parallelism is
    * identical (one task per segment file); output is identical to
    * [[decodeSegments]] (spec-pinned). A file that VANISHED between
    * listing and open quarantines empty, like a corrupt gzip header —
    * but only that case: any other open failure (transient store IO,
    * throttling, permissions) rethrows so Spark's task retry handles
    * it, instead of silently losing the whole segment's documents. */
  def decodeSegmentPaths(spark: SparkSession)(files: DataFrame): DataFrame = {
    import spark.implicits._
    val hc = org.apache.spark.graftshim.GraftSparkInternals
      .broadcastHadoopConf(spark.sparkContext)
    files.select("path").as[String]
      .flatMap { path =>
        val p = new org.apache.hadoop.fs.Path(path)
        val raw: java.io.InputStream =
          try p.getFileSystem(hc.conf).open(p): java.io.InputStream
          catch {
            case _: java.io.FileNotFoundException =>
              new java.io.ByteArrayInputStream(Array.emptyByteArray)
          }
        parseResponses(guardedSegmentStream(path, raw))
      }
      .toDF()
  }

  /** WARC response-segment WRITER — the read path's missing half, so
    * the engine can PRODUCE the published crawl artifact it ingests
    * (re-publishing a filtered/deduped corpus as WARC is the standard
    * interchange step between pipeline stages at Common Crawl scale).
    * Input columns mirror [[readResponses]]' output contract
    * (record_id, url, warc_date, content_type, text), so
    * write∘read and read∘write are identities (spec- and
    * oracle-pinned via the round-trip query q_warc_write_roundtrip).
    *
    * Layout: one `.warc.gz` segment per partition, each record its own
    * gzip member (the Common Crawl member-per-record form, so readers
    * can resync and split); records are WARC/1.0 `response` records
    * with an HTTP/1.1 200 envelope. Writing streams record-by-record
    * through a Hadoop FS output stream — O(record) heap, any
    * Spark-visible filesystem. Each task writes an attempt-suffixed
    * temp file and renames it into place, so a retried or speculative
    * task last-wins on its own segment instead of interleaving bytes.
    * Returns the record count written.
    *
    * Scale shape: embarrassingly parallel, zero shuffle (unless the
    * caller repartitions to set segment count/size); at production
    * scale pick numSegments ≈ corpusBytes / 1 GB to match the
    * published segment sizing. */
  def writeResponses(docs: DataFrame, dir: String,
                     numSegments: Int = 0): Long = {
    val spark = docs.sparkSession
    val hc = org.apache.spark.graftshim.GraftSparkInternals
      .broadcastHadoopConf(spark.sparkContext)
    import spark.implicits._
    val src = docs.select("record_id", "url", "warc_date",
      "content_type", "text")
    PartFiles.clearStaging(dir, spark.sparkContext.hadoopConfiguration)
    val gen = PartFiles.stagingDir(dir)
    val parted = if (numSegments > 0) src.repartition(numSegments) else src
    val counts = parted.as[(String, String, String, String, String)]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val name = f"seg_$pid%05d.warc.gz"
          val fin = new org.apache.hadoop.fs.Path(s"$gen/$name")
          val tmp = new org.apache.hadoop.fs.Path(
            f"$gen/.seg_$pid%05d.${tc.taskAttemptId()}.tmp")
          val fs = fin.getFileSystem(hc.conf)
          val out = fs.create(tmp, true)
          var n = 0L
          try it.foreach { case (rid, url, date, ctype, text) =>
            out.write(gzipMember(
              responseRecordFull(rid, url, date, ctype, text)))
            n += 1
          } finally out.close()
          fs.delete(fin, false)
          if (!fs.rename(tmp, fin))
            throw new java.io.IOException(s"rename $tmp -> $fin failed")
          Iterator.single((name, n))
        }
      }.collect() // one (name, count) per partition — bounded driver state
    PartFiles.publishGeneration(dir, "seg_", ".warc.gz",
      counts.map(_._1).toIndexedSeq,
      spark.sparkContext.hadoopConfiguration)
    counts.map(_._2).sum
  }

  /** A CR/LF inside a header-bound field breaks WARC record framing —
    * a crafted URL could smuggle extra headers or fake records into a
    * re-published corpus. Fail loudly, per field, before framing (the
    * fuzz pin attacks bodies, which are length-framed and safe; header
    * fields are line-framed and are NOT). */
  private def headerSafe(name: String, v: String): String = {
    require(v.indexOf('\r') < 0 && v.indexOf('\n') < 0,
      s"WARC header field $name must not contain CR/LF: ${v.take(80)}")
    v
  }

  private def responseRecordFull(rid: String, uri: String, date: String,
                                 ctype: String,
                                 bodyText: String): Array[Byte] = {
    headerSafe("record_id", rid)
    headerSafe("url", uri)
    headerSafe("warc_date", date)
    headerSafe("content_type", ctype)
    val body = bodyText.getBytes(StandardCharsets.UTF_8)
    val http = crlf(s"""HTTP/1.1 200 OK
                       |Content-Type: $ctype
                       |Content-Length: ${body.length}
                       |
                       |""".stripMargin) ++ body
    record("response", rid,
      s"WARC-Target-URI: $uri\nWARC-Date: $date\n", http)
  }

  /** Per-segment scan REPORT — the operational visibility the silent
    * quarantine rules need (a corrupt-gzip or truncated segment yields
    * zero/partial records by design; without a report that's invisible
    * data loss): one row per segment file with parsed-record counts,
    * OK-status counts, body bytes, and a `quarantined` flag for
    * segments that yielded nothing. Runs the same parser as
    * [[readResponses]] (one task per segment, embarrassingly parallel);
    * the report is bounded by SEGMENT COUNT, not records. A crawl
    * operator diffs n_records against the manifest's expected counts
    * to catch rot before it propagates. */
  def segmentReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hc = org.apache.spark.graftshim.GraftSparkInternals
      .broadcastHadoopConf(spark.sparkContext)
    spark.read.format("binaryFile").load(dir)
      .select("path").as[String]
      .map { path =>
        val p = new org.apache.hadoop.fs.Path(path)
        val raw: java.io.InputStream =
          try p.getFileSystem(hc.conf).open(p): java.io.InputStream
          catch {
            case _: java.io.FileNotFoundException =>
              new java.io.ByteArrayInputStream(Array.emptyByteArray)
          }
        // the stream parse is a ONE-SHOT iterator — fold all three
        // stats in a single pass (`.size` would consume it)
        var n = 0L
        var ok = 0L
        var bytes = 0L
        parseResponses(guardedSegmentStream(path, raw)).foreach { d =>
          n += 1
          if (d.http_status < 400) ok += 1
          bytes += d.n_bytes
        }
        (p.getName, n, ok, bytes)
      }
      .toDF("segment", "n_records", "n_ok", "n_bytes")
      .withColumn("quarantined",
        org.apache.spark.sql.functions.col("n_records") === 0)
  }

  /** Staged fixture for q_warc_report: the standard 36-record two
    * segments PLUS a non-gzip junk segment that must surface as a
    * quarantined row instead of vanishing. */
  lazy val warcReportIngestDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-rep-")
    graft.core.Fs.deleteOnExit(dir, "graft-warc-rep-cleanup")
    val src = java.nio.file.Paths.get(warcIngestDir)
    java.nio.file.Files.copy(src.resolve("seg_0.warc"),
      dir.resolve("seg_0.warc"))
    java.nio.file.Files.copy(src.resolve("seg_1.warc.gz"),
      dir.resolve("seg_1.warc.gz"))
    java.nio.file.Files.write(dir.resolve("junk.warc.gz"),
      "this is not gzip at all".getBytes(StandardCharsets.US_ASCII))
    dir.toString
  }

  /** The (path, content) BLOB decode stage — kept for the
    * continuous-ingest STREAM
    * ([[graft.streaming.EventStreams.runBinaryAvailableNowAppend]]),
    * where the binaryFile streaming source delivers content per
    * micro-batch anyway, and for in-memory fixtures. Batch scans use
    * [[decodeSegmentPaths]]: this variant holds the whole compressed
    * segment on heap per task — fine at streaming micro-batch segment
    * counts, the wrong contract for a 100k-segment batch scan. Same
    * parser, same quarantine rules, ONE decode function two ways —
    * output is spec-pinned identical to the path variant. */
  def decodeSegments(spark: SparkSession)(files: DataFrame): DataFrame = {
    import spark.implicits._
    files
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        parseResponses(guardedSegmentStream(path,
          new java.io.ByteArrayInputStream(content)))
      }
      .toDF()
  }

  // ------------------------------------------------------------------
  // Synthetic fixture — closed-form records so the DuckDB oracle can
  // regenerate every extracted row (the Multimodal.pngIngestDir
  // pattern): seg_0.warc holds records 0..23 in plain WARC with a
  // warcinfo preamble, an interleaved request record per response, and
  // one corrupt record mid-file; seg_1.warc.gz holds records 24..35 as
  // concatenated per-record gzip members.
  // ------------------------------------------------------------------

  private def crlf(s: String): Array[Byte] =
    s.replace("\n", "\r\n").getBytes(StandardCharsets.UTF_8)

  private[graft] def synthBody(i: Int): String =
    s"Record $i body " + ("w" * (i % 13))

  private def record(warcType: String, id: String, extra: String,
                     payload: Array[Byte]): Array[Byte] = {
    val h = crlf(s"""WARC/1.0
                    |WARC-Type: $warcType
                    |WARC-Record-ID: $id
                    |${extra}Content-Length: ${payload.length}
                    |
                    |""".stripMargin)
    h ++ payload ++ crlf("\n\n")
  }

  private def responseRecordBytes(i: Int, body: Array[Byte], status: String,
                                  ctype: String): Array[Byte] = {
    val http = crlf(s"""HTTP/1.1 $status
                       |Content-Type: $ctype
                       |Content-Length: ${body.length}
                       |
                       |""".stripMargin) ++ body
    record("response", f"<urn:uuid:rec-$i%03d>",
      s"WARC-Target-URI: http://site${i % 5}.example/page/$i\n" +
        f"WARC-Date: 2026-01-${i % 27 + 1}%02dT00:00:00Z\n",
      http)
  }

  private def responseRecordWith(i: Int, bodyText: String, status: String,
                                 ctype: String): Array[Byte] =
    responseRecordBytes(i, bodyText.getBytes(StandardCharsets.UTF_8),
      status, ctype)

  private def responseRecord(i: Int, pad: Int = 0): Array[Byte] =
    responseRecordWith(i, synthBody(i) + ("w" * pad),
      if (i % 9 == 0) "404 Not Found" else "200 OK",
      if (i % 6 == 0) "text/plain" else "text/html; charset=utf-8")

  /** Closed-form HTML page for the WET-extraction fixture: a title and
    * heading the strip must flatten, the plain body, and a script block
    * that must vanish whole. */
  private[graft] def synthHtmlBody(i: Int): String =
    s"<html><head><title>R$i</title></head><body><h1>R $i</h1><p>" +
      synthBody(i) + "</p><script>var x = 1;</script></body></html>"

  /** Staged single-segment fixture of HTML response records (WET
    * extraction: q_warc_wet chains this through TextAnalysis.htmlStrip). */
  lazy val warcHtmlIngestDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-html-")
    graft.core.Fs.deleteOnExit(dir, "graft-warc-html-cleanup")
    val seg = (0 until 18).flatMap(i => gzipMember(
      responseRecordWith(i, synthHtmlBody(i), "200 OK",
        "text/html; charset=utf-8"))).toArray
    java.nio.file.Files.write(dir.resolve("seg_0.warc.gz"), seg)
    dir.toString
  }

  /** Closed-form charset-decode fixture cases:
    * (content_type, raw body BYTES, expected decoded text). The bytes
    * exercise every rule of [[decodeBody]] — declared windows-1252 /
    * GBK / quoted iso-8859-1 / utf-8, an UNSUPPORTED declared name, and
    * headerless bodies that are valid UTF-8 (strict path) or legacy
    * windows-1252 (the detection fallback). The expected strings are
    * independent closed-form data the oracle restates verbatim — a
    * decode regression breaks the hash, not just a spec. */
  private[graft] val charsetCases: IndexedSeq[(String, Array[Byte], String)] = {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def a(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)
    IndexedSeq(
      ("text/html; charset=windows-1252",
        a("caf") ++ b(0xE9) ++ a(" ") ++ b(0x93) ++ a("quoted") ++
          b(0x94, 0x20, 0x97) ++ a(" dash"),
        "café “quoted” — dash"),
      ("text/html; charset=gbk",
        b(0xD6, 0xD0, 0xCE, 0xC4) ++ a(" gbk page body"),
        "中文 gbk page body"),
      ("text/html; charset=utf-8",
        "naïve ünicode ✓".getBytes(StandardCharsets.UTF_8),
        "naïve ünicode ✓"),
      ("text/html",
        "müller declared nothing but is valid utf8"
          .getBytes(StandardCharsets.UTF_8),
        "müller declared nothing but is valid utf8"),
      ("text/html",
        a("legacy caf") ++ b(0xE9) ++ a(" page") ++ b(0x97) ++ a("end"),
        "legacy café page—end"),
      ("text/html; charset=\"iso-8859-1\"",
        a("se") ++ b(0xF1) ++ a("or quoted latin1"),
        "señor quoted latin1"),
      ("text/html; charset=x-bogus-name",
        a("unsupported charset name, ascii body"),
        "unsupported charset name, ascii body"),
      ("text/plain", a("plain ascii body"), "plain ascii body"))
  }

  /** Staged single-segment fixture of the [[charsetCases]] records. */
  lazy val warcCharsetIngestDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-cs-")
    graft.core.Fs.deleteOnExit(dir, "graft-warc-cs-cleanup")
    val seg = charsetCases.zipWithIndex.flatMap { case ((ct, body, _), i) =>
      gzipMember(responseRecordBytes(i, body, "200 OK", ct))
    }.toArray
    java.nio.file.Files.write(dir.resolve("seg_0.warc.gz"), seg)
    dir.toString
  }

  /** The charset fixture's expected rows as a DuckDB VALUES list —
    * (record_id, url, content_type, text, n_bytes), the same
    * data-pinning discipline as [[graft.llm.Psl.oracleValuesSql]]: the
    * oracle restates the independent expected DECODED text while the
    * engine decodes the raw bytes, so the two can only hash-match if
    * every decode rule fires correctly. */
  private[graft] def charsetOracleValuesSql: String =
    charsetCases.zipWithIndex.map { case ((ct, body, decoded), i) =>
      val rid = f"<urn:uuid:rec-$i%03d>"
      val url = s"http://site${i % 5}.example/page/$i"
      def q(s: String) = "'" + s.replace("'", "''") + "'"
      s"(${q(rid)}, ${q(url)}, ${q(ct)}, ${q(decoded)}, ${body.length})"
    }.mkString(", ")

  // ------------------------------------------------------------------
  // robots.txt fixture — closed-form bodies + page paths, so the
  // q_warc_robots oracle can restate BOTH and replay the entire
  // RFC 9309 parse + longest-match filter in SQL (bodies are
  // single-quote-free by construction; newlines restate as chr(10)).
  // ------------------------------------------------------------------

  /** Per-host robots.txt bodies exercising every implemented rule:
    * site0 — one `*` group with an Allow override, a mid-segment
    * Disallow (/tmp also blocks /tmpfile), an interleaved ignored
    * directive (crawl-delay must not split the group); site1 — a
    * specific graftbot group ABOVE a `*` group that disallows
    * everything (group choice must pick the specific one and ignore
    * `*` entirely); site2 — the multi-user-agent group form, an exact
    * Allow/Disallow length tie (Allow wins), a trailing comment, a
    * full-line comment, and an empty Disallow (matches nothing). */
  private[graft] val robotsBodies: Seq[(String, String)] = Seq(
    "site0.example" -> Seq(
      "# site0 catch-all group",
      "User-agent: *",
      "Disallow: /private/",
      "Allow: /private/pub/",
      "Disallow: /tmp",
      "Disallow: /*.json$", // RFC 9309 specials: any-run + end anchor
      "Disallow: /media/",
      "Allow: /media/*.html", // wildcard Allow outranks by length
      "Crawl-delay: 10").mkString("\n"),
    "site1.example" -> Seq(
      "User-agent: graftbot",
      "Disallow: /graft-only/",
      "User-agent: *",
      "Disallow: /").mkString("\n"),
    "site2.example" -> Seq(
      "# lead comment",
      "User-agent: alpha",
      "User-agent: graftbot",
      "Disallow: /dup/   # trailing comment",
      "Allow: /dup/",
      "Disallow:").mkString("\n"))

  /** Hosts of the robots fixture's PAGE records — includes
    * site3.example, which serves no robots.txt (everything allowed). */
  private[graft] val robotsHosts: Seq[String] =
    robotsBodies.map(_._1) :+ "site3.example"

  /** Crawled paths staged on EVERY host: each path hits a different
    * rule on at least one host (longest-match override, mid-segment
    * prefix, tie, specific-group shadowing, no-match default). */
  private[graft] val robotsPagePaths: Seq[String] = Seq(
    "/page/1", "/private/x", "/private/pub/y", "/tmp/z", "/tmpfile",
    "/graft-only/a", "/dup/d", "/other",
    // wildcard coverage (rules live on site0; other hosts allow these):
    "/data.json", // blocked by /*.json$ on site0
    "/a/b.json", // deep path still matches the any-run
    "/data.json.bak", // $ anchor: NOT blocked
    "/media/x.html", // wildcard Allow outranks /media/ by length
    "/media/y.png") // plain /media/ Disallow holds

  /** Staged single-segment fixture: one robots.txt response per
    * [[robotsBodies]] host plus one page response per
    * host × [[robotsPagePaths]]. */
  lazy val warcRobotsIngestDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-rob-")
    graft.core.Fs.deleteOnExit(dir, "graft-warc-rob-cleanup")
    val robots = robotsBodies.zipWithIndex.map { case ((host, body), i) =>
      responseRecordUri(900 + i, s"http://$host/robots.txt", body,
        "text/plain")
    }
    val pages = (for {
      (host, hi) <- robotsHosts.zipWithIndex
      (path, pi) <- robotsPagePaths.zipWithIndex
    } yield responseRecordUri(hi * 100 + pi, s"http://$host$path",
      s"page $host$path", "text/html"))
    java.nio.file.Files.write(dir.resolve("seg_0.warc"),
      (robots ++ pages).flatten.toArray)
    dir.toString
  }

  /** Per-host sitemap.xml bodies (closed-form, single-quote-free):
    * site0 — already-crawled entry with lastmod, a fresh allowed entry,
    * a fresh entry under the Disallowed /private/ prefix, a lastmod-less
    * entry, and a /tmpnew entry the mid-segment /tmp rule must block;
    * site1 — an entry under the graftbot-specific Disallow and a fresh
    * allowed one; site2 — whitespace padding inside loc/lastmod (trim is
    * load-bearing) plus an already-crawled path; site3 — no robots.txt
    * on this host (everything allowed) and a nested <sitemap> INDEX
    * block the urlset extraction must ignore. */
  private[graft] val sitemapBodies: Seq[(String, String)] = Seq(
    "site0.example" -> Seq(
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>",
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">",
      "  <url>",
      "    <loc>http://site0.example/page/1</loc>",
      "    <lastmod>2026-01-05</lastmod>",
      "  </url>",
      "  <url><loc>http://site0.example/new/a</loc>" +
        "<lastmod>2026-02-01</lastmod></url>",
      "  <url><loc>http://site0.example/private/new</loc></url>",
      "  <url><loc>http://site0.example/tmpnew</loc>" +
        "<lastmod>2026-01-20</lastmod></url>",
      "</urlset>").mkString("\n"),
    "site1.example" -> Seq(
      "<urlset>",
      "  <url><loc>http://site1.example/graft-only/s</loc></url>",
      "  <url><loc>http://site1.example/fresh</loc>" +
        "<lastmod>2026-02-10</lastmod></url>",
      "</urlset>").mkString("\n"),
    "site2.example" -> Seq(
      "<urlset>",
      "  <url><loc>  http://site2.example/dup/s  </loc>",
      "       <lastmod>  2026-01-30  </lastmod></url>",
      "  <url><loc>http://site2.example/other</loc></url>",
      "</urlset>").mkString("\n"),
    "site3.example" -> Seq(
      "<sitemapindex>",
      "  <sitemap><loc>http://site3.example/sitemap2.xml</loc></sitemap>",
      "</sitemapindex>",
      "<urlset>",
      "  <url><loc>http://site3.example/new/z</loc>" +
        "<lastmod>2026-02-14</lastmod></url>",
      "</urlset>").mkString("\n"))

  /** Staged fixture for the crawl-discovery frontier: the robots fixture
    * (robots.txt per [[robotsBodies]] host + crawled pages on every
    * [[robotsHosts]] host) PLUS one sitemap.xml response per
    * [[sitemapBodies]] host. */
  lazy val warcSitemapIngestDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-map-")
    graft.core.Fs.deleteOnExit(dir, "graft-warc-map-cleanup")
    val robots = robotsBodies.zipWithIndex.map { case ((host, body), i) =>
      responseRecordUri(900 + i, s"http://$host/robots.txt", body,
        "text/plain")
    }
    val maps = sitemapBodies.zipWithIndex.map { case ((host, body), i) =>
      responseRecordUri(950 + i, s"http://$host/sitemap.xml", body,
        "application/xml")
    }
    val pages = (for {
      (host, hi) <- robotsHosts.zipWithIndex
      (path, pi) <- robotsPagePaths.zipWithIndex
    } yield responseRecordUri(hi * 100 + pi, s"http://$host$path",
      s"page $host$path", "text/html"))
    java.nio.file.Files.write(dir.resolve("seg_0.warc"),
      (robots ++ maps ++ pages).flatten.toArray)
    dir.toString
  }

  /** The sitemap bodies as a DuckDB VALUES list (host, body) — the
    * [[robotsOracleRobotsValuesSql]] discipline (quote-free checked;
    * newlines as chr(10)). */
  private[graft] def sitemapOracleValuesSql: String =
    sitemapBodies.map { case (host, body) =>
      require(!body.contains("'"),
        "sitemap fixture bodies must stay single-quote-free")
      val lit = body.split("\n", -1).map(l => s"'$l'")
        .mkString(" || chr(10) || ")
      s"('$host', $lit)"
    }.mkString(", ")

  /** Closed-form HTML pages for the link-extraction fixture
    * (q_warc_links / q_warc_hostgraph / q_graph_linkrank): page0 is the
    * rule-coverage page (every href form, every resolution case, every
    * drop rule of [[Links]]); the rest shape an asymmetric host graph —
    * site0 links out to all three others, site1 and site2 link back,
    * and site3 has NO outbound links (a dangling PageRank node, so the
    * dangling-mass path of the rank sweep is load-bearing in
    * q_graph_linkrank). Bodies may contain single quotes (they are
    * doubled in [[linksOracleValuesSql]]) but no backslashes. */
  private[graft] val linkPageBodies: Seq[(String, String)] = Seq(
    "http://site0.example/a/b/page0.html" -> Seq(
      "<html><body>",
      "<h1>Page zero</h1>",
      "<p>Intro text with no links.</p>",
      "<a href=\"http://site1.example/x\">external absolute</a>",
      "<a href=\"https://site2.example/sec\">secure link</a>",
      "<a href='/rooted/p'>single quoted rooted</a>",
      "<a href=rel/one>unquoted relative</a>",
      "<a href=\"../up/two\">dotdot link</a>",
      "<a href=\"./same/three\">dot link</a>",
      "<a href=\"#frag\">fragment only</a>",
      "<a href=\"next#sec\">fragment strip</a>",
      "<a href=\"javascript:void(0)\">js link</a>",
      "<a href=\"mailto:x@example.com\">mail link</a>",
      "<a href=\"//site3.example/proto\">scheme relative</a>",
      "<A HREF=\"/UPPER\">upper tag</A>",
      "<link href=\"/style.css\">",
      "<a href=\"../../../over/top\">beyond root</a>",
      "<a href=\"search?q=1&amp;r=2\">query link</a>",
      "<a href=\"?sort=asc\">query only</a>",
      "<a href=\"/nested\"><b>Bold</b> anchor</a>",
      "<a href=\"/img\"><img src=\"i.png\"/></a>",
      "<a href=\"/ws\">  spaced",
      "  anchor </a>",
      "<a href=\"../../../../../../../../x\">deep beyond root</a>",
      "<a name=\"here\">no href</a>",
      "</body></html>").mkString("\n"),
    "http://site0.example/index.html" -> Seq(
      "<html><body>",
      "<p>Front page.</p>",
      "<a href=\"http://site1.example/x\">partner one</a>",
      "<a href=\"http://site1.example/x\">partner one</a>",
      "<a href=\"http://site1.example/y\">partner two</a>",
      "<a href=\"http://site2.example/z\">partner three</a>",
      "<a href=\"/a/b/page0.html\">inside</a>",
      "</body></html>").mkString("\n"),
    "http://site1.example/dir/p1.html" -> Seq(
      "<html><body>",
      "<a href=\"http://site0.example/\">home zero</a>",
      "<a href=\"//site2.example/one\">two one</a>",
      "<a href=\"https://site2.example/two\">two two</a>",
      "<a href=\"../local\">sibling</a>",
      "</body></html>").mkString("\n"),
    // query-carrying base URL (RFC 3986 §5.3): a query-only reference
    // REPLACES the base query, and relative merge resolves against the
    // base path SANS query — every link here is intra-host so the
    // host-graph / linkrank fixtures keep their shape
    "http://site1.example/list.html?sort=old&page=1" -> Seq(
      "<html><body>",
      "<a href=\"?sort=asc\">resort</a>",
      "<a href=\"item/5\">item five</a>",
      "<a href=\"/top\">to top</a>",
      "</body></html>").mkString("\n"),
    "http://site2.example/p2.html" -> Seq(
      "<html><body>",
      "<a href=\"http://site0.example/a/b/page0.html\">zero deep</a>",
      "<a href=\"p2self\">self</a>",
      "</body></html>").mkString("\n"),
    "http://site3.example/only.html" -> Seq(
      "<html><body>",
      "<a href=\"#top\">to top</a>",
      "<a href=\"javascript:alert(1)\">noop</a>",
      "<p>No outbound links here.</p>",
      "</body></html>").mkString("\n"),
    // <base href> override page: relative and root-relative links
    // resolve against the cdn base (a NEW host in the graph), absolute
    // links are unaffected; the second base tag must be ignored
    "http://site2.example/based/page.html" -> Seq(
      "<html><head><base href=\"http://cdn.example/assets/\"></head>",
      "<body>",
      "<a href=\"img/logo.png\">cdn logo</a>",
      "<a href=\"/rooted\">cdn rooted</a>",
      "<a href=\"../up\">cdn up</a>",
      "<a href=\"http://site0.example/abs\">abs unaffected</a>",
      "<base href=\"http://wrong.example/\">",
      "<a href=\"tail\">cdn tail</a>",
      "</body></html>").mkString("\n"))

  /** Staged single-segment fixture of the [[linkPageBodies]] pages. */
  lazy val warcLinksIngestDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-lnk-")
    graft.core.Fs.deleteOnExit(dir, "graft-warc-lnk-cleanup")
    val recs = linkPageBodies.zipWithIndex.map { case ((url, body), i) =>
      responseRecordUri(970 + i, url, body, "text/html; charset=utf-8")
    }
    java.nio.file.Files.write(dir.resolve("seg_0.warc"),
      recs.flatten.toArray)
    dir.toString
  }

  /** The link pages as a DuckDB VALUES list (url, html) — newlines as
    * chr(10) concatenations, single quotes doubled (unlike the robots
    * bodies, href='…' forms NEED quotes in the fixture); backslash-free
    * checked loudly (DuckDB standard literals do not escape, Scala
    * emission here must not start). */
  private[graft] def linksOracleValuesSql: String =
    linkPageBodies.map { case (url, body) =>
      require(!body.contains("\\"),
        "link fixture bodies must stay backslash-free")
      val lit = body.split("\n", -1)
        .map(l => s"'${l.replace("'", "''")}'")
        .mkString(" || chr(10) || ")
      s"('$url', $lit)"
    }.mkString(", ")

  private def responseRecordUri(i: Int, uri: String, bodyText: String,
                                ctype: String): Array[Byte] = {
    val body = bodyText.getBytes(StandardCharsets.UTF_8)
    val http = crlf(s"""HTTP/1.1 200 OK
                       |Content-Type: $ctype
                       |Content-Length: ${body.length}
                       |
                       |""".stripMargin) ++ body
    record("response", f"<urn:uuid:rob-$i%03d>",
      s"WARC-Target-URI: $uri\nWARC-Date: 2026-02-01T00:00:00Z\n", http)
  }

  /** The robots bodies as a DuckDB VALUES list (host, body) — newlines
    * become chr(10) concatenations; bodies are quote-free by
    * construction (checked loudly, so a future fixture edit cannot
    * silently corrupt the oracle literal). */
  private[graft] def robotsOracleRobotsValuesSql: String =
    robotsBodies.map { case (host, body) =>
      require(!body.contains("'"), "robots fixture bodies must stay quote-free")
      val lit = body.split("\n", -1).map(l => s"'$l'")
        .mkString(" || chr(10) || ")
      s"('$host', $lit)"
    }.mkString(", ")

  /** The page records as a DuckDB VALUES list (url, host, path). */
  private[graft] def robotsOraclePagesValuesSql: String =
    (for (host <- robotsHosts; path <- robotsPagePaths)
      yield s"('http://$host$path', '$host', '$path')").mkString(", ")

  /** Disjoint-vocabulary body for the crawl-dedup fixture: three
    * md5-hex words seeded by `i` — two bodies share essentially no
    * char shingles (each has ~90 distinct 5-shingles out of 16⁵
    * possible), so MinHash est_jaccard between DISTINCT records is ~0
    * and only planted exact copies can reach the dedup threshold.
    * (The q_scan_warc synthBody scaffold shares most of its shingles
    * across records — fine for parse checks, unusable under a dedup
    * gate.) */
  private[graft] def crawlBody(i: Int): String = {
    def h(x: Int) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(x.toString.getBytes(StandardCharsets.US_ASCII))
        .map("%02x".format(_)).mkString
    }
    s"${h(i)} ${h(i + 1000000)} ${h(i + 2000000)}"
  }

  /** History bodies for the crawl-dedup fixture (disjoint seed range). */
  private[graft] def crawlHistoryBody(j: Int): String = crawlBody(5000000 + j)

  /** Records of the crawl-dedup ingest fixture whose bodies are planted
    * EXACT copies: 3 and 7 copy history bodies 0 and 1 (must drop
    * against the pre-built index in micro-batch 0); 15 and 19 copy
    * records 0 and 4 (batch-0 SURVIVORS — they drop only if the ingest
    * loop appended batch 0 before batch 1 ran). */
  private[graft] val CrawlPlantedDups: Map[Int, String] = Map(
    3 -> crawlHistoryBody(0), 7 -> crawlHistoryBody(1),
    15 -> crawlBody(0), 19 -> crawlBody(4))

  /** Two-segment staged fixture for the streamed crawl-dedup loop:
    * seg_0 (older mtime) carries records 0-11, seg_1 records 12-23;
    * bodies are [[crawlBody]] except the [[CrawlPlantedDups]]. */
  lazy val warcCrawlDedupIngestDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-crawl-")
    graft.core.Fs.deleteOnExit(dir, "graft-warc-crawl-cleanup")
    def seg(ids: Range): Array[Byte] = ids.flatMap { i =>
      gzipMember(responseRecordWith(i,
        CrawlPlantedDups.getOrElse(i, crawlBody(i)), "200 OK",
        "text/plain"))
    }.toArray
    val s0 = dir.resolve("seg_0.warc.gz")
    val s1 = dir.resolve("seg_1.warc.gz")
    java.nio.file.Files.write(s0, seg(0 until 12))
    java.nio.file.Files.write(s1, seg(12 until 24))
    s0.toFile.setLastModified(1700000000000L)
    s1.toFile.setLastModified(1700000060000L)
    dir.toString
  }

  private def requestRecord(i: Int): Array[Byte] =
    record("request", f"<urn:uuid:req-$i%03d>",
      s"WARC-Target-URI: http://site${i % 5}.example/page/$i\n",
      crlf(s"""GET /page/$i HTTP/1.1
              |Host: site${i % 5}.example
              |
              |""".stripMargin))

  private def warcinfoRecord: Array[Byte] =
    record("warcinfo", "<urn:uuid:info-000>", "",
      crlf("software: graft-synth/1.0\n"))

  /** A record with a non-numeric Content-Length: framing is lost, the
    * parser must resync at the NEXT record's magic. */
  private def corruptRecord: Array[Byte] =
    crlf("""WARC/1.0
           |WARC-Type: response
           |WARC-Record-ID: <urn:uuid:corrupt>
           |Content-Length: banana
           |
           |HTTP/1.1 200 OK
           |
           |this never counts""".stripMargin)

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** Tooling (ScaleCheck staging — NOT the oracle fixture): write `n`
    * padded response records as multi-member `.warc.gz` segments of
    * `perSegment` records each, sized for throughput measurement.
    * Parallelism is one task per segment file, so the record count per
    * segment sets the task granularity exactly as Common Crawl's ~1 GB
    * segments do at production scale. */
  private[graft] def writeSyntheticSegments(dir: String, n: Int,
                                            perSegment: Int = 2000,
                                            pad: Int = 500): Unit = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    var i = 0
    var seg = 0
    while (i < n) {
      val hi = math.min(i + perSegment, n)
      val out = new java.io.ByteArrayOutputStream(perSegment * (pad + 400))
      (i until hi).foreach(j => out.write(gzipMember(responseRecord(j, pad))))
      java.nio.file.Files.write(d.resolve(f"seg_$seg%05d.warc.gz"),
        out.toByteArray)
      i = hi
      seg += 1
    }
  }

  /** Staged two-segment fixture dir (built once per JVM, removed on
    * exit). 36 response records total; the corrupt record and the
    * request/warcinfo records must never surface. */
  lazy val warcIngestDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-")
    graft.core.Fs.deleteOnExit(dir, "graft-warc-cleanup")
    val seg0 = warcinfoRecord ++
      (0 until 12).flatMap(i => requestRecord(i) ++ responseRecord(i)) ++
      corruptRecord ++
      (12 until 24).flatMap(i => requestRecord(i) ++ responseRecord(i))
    java.nio.file.Files.write(dir.resolve("seg_0.warc"), seg0.toArray)
    val seg1 = (24 until 36).flatMap(i =>
      gzipMember(responseRecord(i))).toArray
    java.nio.file.Files.write(dir.resolve("seg_1.warc.gz"), seg1)
    dir.toString
  }
}
