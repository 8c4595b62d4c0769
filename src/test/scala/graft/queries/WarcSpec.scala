package graft.queries

import graft.SparkSpec
import graft.sources.Warc
import org.apache.spark.sql.functions._

/** WARC container cracking: frame parsing, HTTP splitting, gzip member
  * handling, skip rules, and corrupt-record resync (q_scan_warc's
  * machinery; the oracle hash-checks the values, this spec pins the
  * structural contracts the oracle can't see from the output alone). */
class WarcSpec extends SparkSpec {

  private lazy val docs =
    Warc.readResponses(spark, Warc.warcIngestDir).cache()

  test("all 36 planted response records surface; nothing else does") {
    assert(docs.count() === 36L)
    // warcinfo/request/corrupt ids never leak into the output
    val ids = docs.select("record_id").as[String](
      org.apache.spark.sql.Encoders.STRING).collect().toSet
    assert(ids.forall(_.startsWith("<urn:uuid:rec-")))
    assert(ids.size === 36)
  }

  test("corrupt record is dropped and the parser resyncs: records 12-23 " +
      "(AFTER the corrupt frame in seg_0) are all present") {
    val after = docs.filter(col("record_id") >= "<urn:uuid:rec-012>" &&
      col("record_id") <= "<urn:uuid:rec-023>")
    assert(after.count() === 12L)
  }

  test("multi-member .warc.gz segment contributes its 12 records") {
    val gz = docs.filter(col("record_id") >= "<urn:uuid:rec-024>")
    assert(gz.count() === 12L)
    // bodies decode byte-exact through the gzip path
    val r30 = gz.filter(col("record_id") === "<urn:uuid:rec-030>")
      .select("text").head().getString(0)
    assert(r30 === Warc.synthBody(30))
  }

  test("HTTP status and content-type are extracted per record") {
    assert(docs.filter(col("http_status") === 404).count() === 4L) // 0,9,18,27
    assert(docs.filter(col("content_type") === "text/plain").count() === 6L)
    assert(docs.filter(col("content_type")
      .startsWith("text/html")).count() === 30L)
  }

  test("n_bytes is the HTTP body length, not the payload length") {
    val r5 = docs.filter(col("record_id") === "<urn:uuid:rec-005>").head()
    val body = Warc.synthBody(5)
    assert(r5.getAs[String]("text") === body)
    assert(r5.getAs[Long]("n_bytes") === body.length.toLong)
  }

  test("overlong Content-Length drops the record and recovers at the " +
      "next magic") {
    def rec(path: String): String = {
      val payload = "HTTP/1.1 200 OK\r\nContent-Type: t\r\n\r\nhi"
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <$path>\r\n" +
        s"WARC-Target-URI: http://x/$path\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n$payload\r\n\r\n"
    }
    // middle record claims 99999 payload bytes (truncated / lying
    // length): it must drop, and the trailing record must still parse
    val bytes = (rec("a") +
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99999\r\n\r\n" +
      "HTTP/1.1 200 OK\r\n\r\nxx" +
      rec("b")).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val docs = Warc.parseResponses(bytes)
    assert(docs.map(_.url) === Seq("http://x/a", "http://x/b"))
    assert(docs.forall(_.text === "hi"))
  }

  test("corrupt gzip tail quarantines the remainder, keeps parsed records") {
    // stage: the 12 intact members of seg_1.warc.gz, then garbage bytes
    // that are not a valid gzip member — the segment must yield the 12
    // records and stop, not fail the job
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-badgz-")
    val good = Warc.readResponses(spark, Warc.warcIngestDir) // force fixture
    assert(good.count() === 36L)
    val members = new java.io.ByteArrayOutputStream()
    members.write(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(Warc.warcIngestDir, "seg_1.warc.gz")))
    members.write(Array.tabulate[Byte](64)(j => (j * 37).toByte)) // garbage
    java.nio.file.Files.write(dir.resolve("bad_tail.warc.gz"),
      members.toByteArray)
    val docs = Warc.readResponses(spark, dir.toString)
    assert(docs.count() === 12L, "records before the corruption must survive")
  }

  test("a .gz file that is not gzip at all quarantines whole (no crash)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-notgz-")
    java.nio.file.Files.write(dir.resolve("junk.warc.gz"),
      "this is not gzip".getBytes)
    assert(Warc.readResponses(spark, dir.toString).count() === 0L)
  }

  test("scan is a single stage: no exchange in the plan") {
    val plan = Warc.readResponses(spark, Warc.warcIngestDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("path-streaming decode equals the blob decode on both fixture " +
      "dirs (plain + gz segments): one parser, two ingestion contracts") {
    for (dir <- Seq(Warc.warcIngestDir, Warc.warcCharsetIngestDir)) {
      val listing = spark.read.format("binaryFile").load(dir)
      val viaPath = Warc.decodeSegmentPaths(spark)(listing)
        .orderBy("record_id").collect().toSeq
      val viaBlob = Warc.decodeSegments(spark)(listing)
        .orderBy("record_id").collect().toSeq
      assert(viaPath === viaBlob)
      assert(viaPath.nonEmpty)
    }
    // the path variant must not deserialize file contents in its scan:
    // the listing's content column is pruned away
    val plan = Warc.readResponses(spark, Warc.warcIngestDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<path:string>"),
      s"content column must be pruned from the binaryFile scan:\n$plan")
  }

  test("charsetOf: header parsing edges — case, quotes, parameters, " +
      "unsupported names") {
    assert(Warc.charsetOf("text/html; charset=utf-8").map(_.name())
      === Some("UTF-8"))
    assert(Warc.charsetOf("text/html; CHARSET=GBK").map(_.name())
      === Some("GBK"))
    assert(Warc.charsetOf("text/html;charset=\"windows-1252\"; foo=bar")
      .map(_.name()) === Some("windows-1252"))
    assert(Warc.charsetOf("text/html; charset=x-no-such-charset").isEmpty)
    assert(Warc.charsetOf("text/html").isEmpty)
    assert(Warc.charsetOf("").isEmpty)
  }

  test("decodeBody: declared charset wins; undeclared falls back " +
      "strict-UTF-8 then windows-1252; bad bytes replace, never throw") {
    def d(bytes: Array[Byte], ct: String) =
      Warc.decodeBody(bytes, 0, bytes.length, ct)
    val w1252 = Array[Byte]('c', 'a', 'f', 0xE9.toByte)
    assert(d(w1252, "text/html; charset=windows-1252") === "café")
    // the same bytes undeclared: not valid UTF-8 → windows-1252 heuristic
    assert(d(w1252, "text/html") === "café")
    // declared UTF-8 with a stray bad byte: replacement char, no throw
    assert(d(w1252, "text/html; charset=utf-8") === "caf�")
    // undeclared valid UTF-8 must decode as UTF-8, not latin-1 mojibake
    assert(d("中文".getBytes("UTF-8"), "text/plain") === "中文")
    assert(d(Array[Byte](0xD6.toByte, 0xD0.toByte), "x; charset=gbk") === "中")
  }

  test("charset fixture round-trips: every decode rule is exercised and " +
      "n_bytes stays the raw byte length") {
    val out = Warc.readResponses(spark, Warc.warcCharsetIngestDir)
      .orderBy("record_id").collect()
    assert(out.length === Warc.charsetCases.length)
    out.zip(Warc.charsetCases).foreach { case (row, (ct, bytes, decoded)) =>
      assert(row.getAs[String]("content_type") === ct)
      assert(row.getAs[String]("text") === decoded)
      assert(row.getAs[Long]("n_bytes") === bytes.length.toLong)
    }
    // non-ASCII records prove n_bytes ≠ char count (raw bytes, not text)
    assert(out.exists(r =>
      r.getAs[Long]("n_bytes") != r.getAs[String]("text").length.toLong))
  }

  test("write∘read is the identity on the 36-record fixture (framing, " +
      "Content-Length, gzip member boundaries all round-trip)") {
    val dir = tempDir("warc-wrt-").toString
    val src = Warc.readResponses(spark, Warc.warcIngestDir)
      .select("record_id", "url", "warc_date", "content_type", "text",
        "http_status", "n_bytes")
    val n = Warc.writeResponses(
      src.drop("http_status", "n_bytes"), dir, numSegments = 3)
    assert(n === 36L)
    // three member-per-record segments on disk, no leftover temp files
    // dot-files are Hadoop local-FS checksum sidecars (.crc) — standard;
    // the _GEN marker is the r15 publish-complete witness (PartFiles)
    val listed = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith("."))
    assert(listed.contains("_GEN"), listed.mkString(","))
    val files = listed.filterNot(_ == "_GEN").sorted
    assert(files.length === 3 && files.forall(_.endsWith(".warc.gz")),
      files.mkString(","))
    val back = Warc.readResponses(spark, dir)
      .select("record_id", "url", "warc_date", "content_type", "text",
        "n_bytes")
      .orderBy("record_id").collect()
    val want = src.select("record_id", "url", "warc_date", "content_type",
        "text", "n_bytes")
      .orderBy("record_id").collect()
    // n_bytes survives because the writer re-encodes UTF-8 and the
    // fixture bodies are ASCII; status is normalized to 200 by contract
    assert(back.toSeq === want.toSeq)
    assert(Warc.readResponses(spark, dir)
      .filter(col("http_status") === 200).count() === 36L)
  }

  test("write∘read round-trips ADVERSARIAL bodies byte-exactly: " +
      "unicode, embedded CRLF/blank lines, WARC magic inside the body, " +
      "empty text (randomized)") {
    import graft.SparkSpec.spark.implicits._
    val rnd = new scala.util.Random(13)
    val nasty = Seq("\r\n\r\n", "WARC/1.0\r\n", "Content-Length: 7\r\n",
      "中文✓", "café", "\n\n", "", "a\tb", "\"quoted\"", "&amp;")
    val docs = (0 until 40).map { i =>
      val body = Seq.fill(rnd.nextInt(6))(
        nasty(rnd.nextInt(nasty.length))).mkString(
        Seq.fill(rnd.nextInt(3))("x").mkString)
      (f"<urn:graft:fuzz-$i%03d>", s"http://f.example/$i",
        "2026-04-01T00:00:00Z", "text/plain", body)
    }.toDF("record_id", "url", "warc_date", "content_type", "text")
    val dir = tempDir("warc-fuzz-").toString
    assert(Warc.writeResponses(docs, dir, numSegments = 4) === 40L)
    val back = Warc.readResponses(spark, dir)
      .select("record_id", "text").orderBy("record_id")
      .collect().map(r => r.getString(0) -> r.getString(1))
    val want = docs.select("record_id", "text").orderBy("record_id")
      .collect().map(r => r.getString(0) -> r.getString(1))
    assert(back.toSeq === want.toSeq)
  }

  test("writeResponses REFUSES header-bound fields carrying CR/LF: a " +
      "crafted url/record_id/date/content_type must not smuggle extra " +
      "headers or fake records into a re-published corpus") {
    import graft.SparkSpec.spark.implicits._
    val evil = Seq(
      // header-splitting URL: would inject a fake WARC header line
      ("<urn:graft:evil-0>", "http://e.example/\r\nWARC-Type: response",
        "2026-04-01T00:00:00Z", "text/plain", "body"),
      ("<urn:graft:evil\n1>", "http://e.example/ok",
        "2026-04-01T00:00:00Z", "text/plain", "body"),
      ("<urn:graft:evil-2>", "http://e.example/ok",
        "2026-04-01\r00:00:00Z", "text/plain", "body"),
      ("<urn:graft:evil-3>", "http://e.example/ok",
        "2026-04-01T00:00:00Z", "text/plain\r\nX-Fake: 1", "body"))
    evil.foreach { row =>
      val docs = Seq(row)
        .toDF("record_id", "url", "warc_date", "content_type", "text")
      val dir = tempDir("warc-evil-").toString
      val e = intercept[org.apache.spark.SparkException] {
        Warc.writeResponses(docs, dir, numSegments = 1)
      }
      assert(e.getMessage.contains("must not contain CR/LF")
        || Option(e.getCause).exists(
          _.getMessage.contains("must not contain CR/LF")), e.getMessage)
    }
    // bodies with CRLF remain fine (length-framed, fuzz-pinned above)
    val ok = Seq(("<urn:graft:ok-0>", "http://e.example/ok",
      "2026-04-01T00:00:00Z", "text/plain", "a\r\n\r\nb"))
      .toDF("record_id", "url", "warc_date", "content_type", "text")
    val dir = tempDir("warc-okbody-").toString
    assert(Warc.writeResponses(ok, dir, numSegments = 1) === 1L)
  }

  test("writeResponses skips empty partitions instead of writing " +
      "empty segments") {
    val dir = tempDir("warc-wrt-e-").toString
    val one = Warc.readResponses(spark, Warc.warcIngestDir)
      .filter(col("record_id") === "<urn:uuid:rec-000>")
      .select("record_id", "url", "warc_date", "content_type", "text")
    // 8 partitions, 1 row → exactly one segment file appears
    assert(Warc.writeResponses(one, dir, numSegments = 8) === 1L)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(n => n.startsWith(".") || n == "_GEN")
    assert(files.length === 1, files.mkString(","))
  }
}
