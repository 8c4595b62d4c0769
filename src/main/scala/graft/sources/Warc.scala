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

  /** Decompress a (possibly multi-member) gzip blob. `GZIPInputStream`
    * reads concatenated members until EOF — exactly the layout of
    * `.warc.gz` (one member per record, so HTTP range readers can fetch
    * single records; we read whole segments). */
  private[sources] def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 64 * 1024)
    val out = new java.io.ByteArrayOutputStream(
      math.min(bytes.length.toLong * 4, Int.MaxValue.toLong - 16).toInt)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  /** Index of the next record magic at or after `from`, or -1. */
  private def nextMagic(bytes: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = bytes.length - Magic.length
    while (i <= last) {
      var j = 0
      while (j < Magic.length && bytes(i + j) == Magic(j)) j += 1
      if (j == Magic.length) return i
      i += 1
    }
    -1
  }

  /** Index just past the first CRLFCRLF at or after `from`, or -1. */
  private def pastHeaderBlock(bytes: Array[Byte], from: Int): Int = {
    var i = from
    val last = bytes.length - 4
    while (i <= last) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i + 4
      i += 1
    }
    -1
  }

  /** Parse a `Name: value` header block (case-insensitive names). */
  private def parseHeaders(block: String): Map[String, String] =
    block.split("\r\n").iterator.flatMap { line =>
      val c = line.indexOf(':')
      if (c <= 0) None
      else Some(line.substring(0, c).trim.toLowerCase ->
        line.substring(c + 1).trim)
    }.toMap

  /** Extract the HTTP response documents of one (decompressed) WARC
    * segment. Non-response records (warcinfo, request, metadata, …) are
    * skipped silently; malformed records are dropped with a resync (see
    * the object doc). */
  private[graft] def parseResponses(bytes: Array[Byte]): Seq[WarcDoc] = {
    val out = Seq.newBuilder[WarcDoc]
    var pos = nextMagic(bytes, 0)
    while (pos >= 0) {
      val afterHeaders = pastHeaderBlock(bytes, pos)
      var resyncFrom = pos + 1
      if (afterHeaders > 0) {
        val headers = parseHeaders(new String(bytes, pos, afterHeaders - pos,
          StandardCharsets.UTF_8))
        val len = headers.get("content-length")
          .flatMap(v => scala.util.Try(v.toInt).toOption)
        len match {
          case Some(n) if n >= 0 && afterHeaders + n <= bytes.length =>
            // well-framed record: resume AFTER the payload even when the
            // record itself is skipped or its HTTP head is malformed
            resyncFrom = afterHeaders + n
            if (headers.get("warc-type").contains("response"))
              httpResponse(bytes, afterHeaders, n, headers)
                .foreach(out += _)
          case _ => // bad/missing length: framing lost, resync at magic
        }
      }
      pos = nextMagic(bytes, resyncFrom)
    }
    out.result()
  }

  /** Split one `application/http` payload into (status, content-type,
    * body); None when the HTTP head is malformed. */
  private def httpResponse(bytes: Array[Byte], start: Int, n: Int,
                           warcHeaders: Map[String, String]): Option[WarcDoc] = {
    val bodyStart = pastHeaderBlock(bytes, start)
    if (bodyStart < 0 || bodyStart > start + n) return None
    val head = new String(bytes, start, bodyStart - start,
      StandardCharsets.UTF_8)
    val lines = head.split("\r\n")
    val status = lines.headOption.map(_.split(" ")) match {
      case Some(parts) if parts.length >= 2 && parts(0).startsWith("HTTP/") =>
        scala.util.Try(parts(1).toInt).toOption
      case _ => None
    }
    status.map { st =>
      val httpHeaders = parseHeaders(lines.drop(1).mkString("\r\n"))
      val bodyLen = start + n - bodyStart
      WarcDoc(
        record_id = warcHeaders.getOrElse("warc-record-id", ""),
        url = warcHeaders.getOrElse("warc-target-uri", ""),
        warc_date = warcHeaders.getOrElse("warc-date", ""),
        http_status = st,
        content_type = httpHeaders.getOrElse("content-type", ""),
        text = new String(bytes, bodyStart, bodyLen, StandardCharsets.UTF_8),
        n_bytes = bodyLen.toLong)
    }
  }

  /** Scan a directory of `.warc` / `.warc.gz` segments into a DataFrame
    * of HTTP response documents. One task per segment file (see the
    * object doc for why that is the right split unit); everything after
    * the `binaryFile` listing is partition-local. */
  def readResponses(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val raw = if (path.endsWith(".gz")) gunzip(content) else content
        parseResponses(raw)
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

  private def responseRecord(i: Int, pad: Int = 0): Array[Byte] = {
    val body = (synthBody(i) + ("w" * pad)).getBytes(StandardCharsets.UTF_8)
    val status = if (i % 9 == 0) "404 Not Found" else "200 OK"
    val ctype = if (i % 6 == 0) "text/plain" else "text/html; charset=utf-8"
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
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      try Files.walk(dir).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      catch { case scala.util.control.NonFatal(_) => () }
    }, "graft-warc-cleanup"))
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
