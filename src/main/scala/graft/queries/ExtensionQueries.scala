package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Udafs
import graft.llm.Multimodal

/** The extension surface (SURVEY.md §2.b "UDF / UDAF / UDTF" + multimodal):
  * typed Aggregator UDAFs, a scalar-UDF stage shape, and the multimodal
  * binary-column pipeline (decode stubbed, plumbing real).
  */
object ExtensionQueries {

  /** Closed-form replay of the synthMp3Bytes fixture — shared verbatim
    * by the batch q_multimodal_mp3_meta and the streaming
    * q_stream_media_manifest (one walk, two execution modes, ONE
    * oracle: the q_scan_warc discipline).  The bitrate table is
    * restated as a SQL list; one wrong cell breaks both hashes. */
  private[queries] val mp3MetaOracleSql: String =
    """WITH m AS (
             |  SELECT CAST(i AS BIGINT) AS media_id,
             |    CAST(i % 3 AS INT) AS sr_idx, 3 + i % 6 AS nf
             |  FROM generate_series(0, 63) AS g(i)),
             |fr AS (
             |  SELECT media_id, nf,
             |    list_extract([44100, 48000, 32000],
             |      CAST(sr_idx + 1 AS INT)) AS sr,
             |    unnest(generate_series(0, nf - 1)) AS f
             |  FROM m WHERE media_id % 31 <> 30),
             |br AS (
             |  SELECT media_id, nf, sr,
             |    list_extract(
             |      [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             |       256, 320],
             |      CAST(CASE WHEN media_id % 4 = 0 THEN 1 + media_id % 14
             |           ELSE 1 + (media_id + f) % 14 END AS INT)) AS kbps
             |  FROM fr)
             |SELECT media_id, CAST(nf AS BIGINT) AS n_frames,
             |  CAST(max(sr) AS INT) AS sample_rate,
             |  CAST(sum(kbps) AS BIGINT) AS bitrate_kbps_sum,
             |  count(DISTINCT kbps) > 1 AS is_vbr,
             |  CAST(nf * 1152 * 1000000 // max(sr) AS BIGINT)
             |    AS duration_micros,
             |  CAST(CASE WHEN media_id % 5 <> 0 AND media_id % 6 = 1
             |       THEN 10 + 20 + media_id % 13 ELSE 0 END AS BIGINT)
             |    AS n_tag_bytes,
             |  CAST((CASE WHEN media_id % 5 = 0 THEN 7 + media_id % 11
             |        ELSE 0 END)
             |     + (CASE WHEN media_id % 7 = 3 THEN 9 ELSE 0 END)
             |    AS BIGINT) AS n_junk_bytes,
             |  false AS quarantined
             |FROM br GROUP BY media_id, nf
             |UNION ALL
             |SELECT media_id, 0, 0, 0, false, 0, 0,
             |  CAST(40 + media_id AS BIGINT), true
             |FROM m WHERE media_id % 31 = 30
             |ORDER BY media_id""".stripMargin
  import Tables.load

  val queries: Seq[QueryDef] = Seq(

    // Typed Aggregator UDAF (partial→final, map-side combine).
    QueryDef(
      "q_udaf_geomean",
      (s, dir) => {
        load(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(round(Udafs.geoMean(col("o_totalprice")), 2).as("geo_price"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
             |  round(exp(avg(ln(o_totalprice))), 2) AS geo_price,
             |  count(*) AS n
             |FROM orders WHERE o_totalprice > 0
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    QueryDef(
      "q_udaf_weighted_mean",
      (s, dir) => {
        load(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(round(Udafs.weightedMean(col("l_extendedprice"), col("l_quantity")), 4)
            .as("wavg_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Scalar UDF escape hatch (repype's arbitrary per-row process): a
    // Luhn-like digit checksum no builtin covers; oracle reproduces it in
    // SQL, proving the UDF surface is value-correct.
    QueryDef(
      "q_udf_scalar",
      (s, dir) => {
        val digitSum = udf { k: Long =>
          var (n, acc) = (k, 0L)
          while (n > 0) { acc += n % 10; n /= 10 }
          acc
        }
        load(s, dir, "orders")
          .filter(col("o_orderkey") < 2000)
          .select(col("o_orderkey"), digitSum(col("o_orderkey")).as("digit_sum"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH RECURSIVE ds(k, n, acc) AS (
             |  SELECT o_orderkey, o_orderkey, 0::BIGINT FROM orders WHERE o_orderkey < 2000
             |  UNION ALL
             |  SELECT k, n // 10, acc + n % 10 FROM ds WHERE n > 0)
             |SELECT k AS o_orderkey, max(acc) AS digit_sum FROM ds GROUP BY k
             |ORDER BY o_orderkey""".stripMargin)),

    // Multimodal: synthetic media (REAL PNG bytes + typed metadata) →
    // javax.imageio decode → per-media features, partition-local. The
    // fixture pixels follow the closed form (id·31 + rasterIndex) % 256
    // with id-derived dims, so the oracle recomputes every feature —
    // width, height, byte count, and the exact integer mean — from the
    // id alone: a wrong decode (dims, channel handling, pixel values)
    // breaks the hash match. This is a true decode gate, not plumbing.
    QueryDef(
      "q_multimodal_features",
      (s, _) => Multimodal.extractFeatures(Multimodal.syntheticMedia(s, 256))
        .orderBy(col("media_id")),
      Some("""WITH m AS (
             |  SELECT CAST(i AS BIGINT) AS media_id,
             |    CAST(4 + i % 28 AS INT) AS width,
             |    CAST(4 + (i * 7) % 28 AS INT) AS height,
             |    CAST(3 AS INT) AS channels
             |  FROM generate_series(0, 255) AS g(i)),
             |px AS (
             |  SELECT media_id, width, height, channels,
             |    sum((media_id * 31 + j) % 256) AS s, count(*) AS n
             |  FROM m, unnest(generate_series(0, width * height * channels - 1)) AS u(j)
             |  GROUP BY 1, 2, 3, 4)
             |SELECT media_id, width, height, channels,
             |  CAST(n AS BIGINT) AS n_bytes,
             |  CAST((s * 1000000) // n AS BIGINT) AS mean_micro
             |FROM px ORDER BY media_id""".stripMargin)),

    // The binaryFile INGEST path end-to-end: real PNG FILES on disk →
    // Spark's binaryFile source → filename-derived ids → javax.imageio
    // decode → features. Same closed-form pixels as q_multimodal_features,
    // so the oracle recomputes every feature from generate_series while
    // the engine must survive an actual file scan; the staged corrupt
    // img_999.png exercises quarantine on the INGEST path (absent from
    // the output, absent from the oracle).
    QueryDef(
      "q_multimodal_ingest",
      (s, _) => {
        val media = s.read.format("binaryFile")
          .load(Multimodal.pngIngestDir)
          .select(regexp_extract(col("path"), "img_(\\d+)\\.png", 1)
            .cast("long").as("media_id"), col("content"))
        Multimodal.extractFeatures(media).orderBy(col("media_id"))
      },
      Some("""WITH m AS (
             |  SELECT CAST(i AS BIGINT) AS media_id,
             |    CAST(4 + i % 28 AS INT) AS width,
             |    CAST(4 + (i * 7) % 28 AS INT) AS height,
             |    CAST(3 AS INT) AS channels
             |  FROM generate_series(0, 63) AS g(i)),
             |px AS (
             |  SELECT media_id, width, height, channels,
             |    sum((media_id * 31 + j) % 256) AS s, count(*) AS n
             |  FROM m, unnest(generate_series(0, width * height * channels - 1)) AS u(j)
             |  GROUP BY 1, 2, 3, 4)
             |SELECT media_id, width, height, channels,
             |  CAST(n AS BIGINT) AS n_bytes,
             |  CAST((s * 1000000) // n AS BIGINT) AS mean_micro
             |FROM px ORDER BY media_id""".stripMargin)),

    // Frame sampling over the same real-PNG fixture: row count AND the
    // summed pixel content of the sampled frames are recomputed by the
    // oracle from the closed form (rows y ≡ 0 mod stride), so a decoder
    // that samples the wrong rows or corrupts frame bytes fails the hash.
    QueryDef(
      "q_multimodal_frames",
      (s, _) => {
        val media = Multimodal.syntheticMedia(s, 64)
        Multimodal.sampleFrames(media, stride = 4)
          .groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_frames"),
            sum(col("frame_sum")).as("pix_sum"))
          .orderBy(col("media_id"))
      },
      Some("""WITH m AS (
             |  SELECT CAST(i AS BIGINT) AS media_id,
             |    4 + i % 28 AS width, 4 + (i * 7) % 28 AS height
             |  FROM generate_series(0, 63) AS g(i)),
             |px AS (
             |  SELECT media_id,
             |    CAST(sum(CASE WHEN (j // (width * 3)) % 4 = 0
             |             THEN (media_id * 31 + j) % 256 ELSE 0 END) AS BIGINT) AS pix_sum
             |  FROM m, unnest(generate_series(0, width * height * 3 - 1)) AS u(j)
             |  GROUP BY media_id)
             |SELECT m.media_id, CAST((m.height + 3) // 4 AS BIGINT) AS n_frames,
             |  px.pix_sum
             |FROM m JOIN px USING (media_id) ORDER BY media_id""".stripMargin)),

    // Audio modality over the same contract: synthetic REAL WAV blobs
    // (RIFF/PCM16, javax.sound encode) → container-parsing decode →
    // all-integer features. Rate, length, and every sample value follow
    // closed forms of the id, so the oracle recomputes duration, energy
    // (Σs² — the exact sufficient statistic for RMS) and peak from
    // generate_series alone: wrong endianness, a dropped header byte, or
    // off-by-one sample parsing all break the hash.
    QueryDef(
      "q_multimodal_audio",
      (s, _) => Multimodal
        .extractAudioFeatures(Multimodal.syntheticAudio(s, 64))
        .orderBy(col("media_id")),
      Some("""WITH m AS (
             |  SELECT CAST(i AS BIGINT) AS media_id,
             |    CAST(8000 + (i % 3) * 4000 AS INT) AS sample_rate,
             |    512 + (i % 7) * 128 AS n_samples
             |  FROM generate_series(0, 63) AS g(i)),
             |sv AS (
             |  SELECT media_id, sample_rate, n_samples,
             |    ((media_id * 7919 + j * 131) % 65536) - 32768 AS s
             |  FROM m, unnest(generate_series(0, n_samples - 1)) AS u(j))
             |SELECT media_id, sample_rate,
             |  CAST(n_samples AS BIGINT) AS n_samples,
             |  CAST(n_samples * 1000000 // sample_rate AS BIGINT)
             |    AS duration_micros,
             |  CAST(sum(s * s) AS BIGINT) AS energy,
             |  CAST(max(abs(s)) AS BIGINT) AS peak
             |FROM sv GROUP BY media_id, sample_rate, n_samples
             |ORDER BY media_id""".stripMargin)),

    // Video modality: real GVID demux (magic + length index) over real
    // PNG member frames — every sampled frame goes through the genuine
    // image decode. Dims, frame counts, and every pixel follow closed
    // forms of (id, frame), so the oracle rebuilds each sampled frame's
    // byte sum from generate_series; a demuxer off by one frame or one
    // offset byte breaks the hash.
    QueryDef(
      "q_multimodal_video",
      (s, _) => Multimodal
        .sampleVideoFrames(Multimodal.syntheticVideo(s, 64), stride = 2)
        .orderBy(col("media_id"), col("frame_idx")),
      Some("""WITH m AS (
             |  SELECT CAST(i AS BIGINT) AS media_id,
             |    4 + i % 28 AS width, 4 + (i * 7) % 28 AS height,
             |    4 + i % 8 AS nf
             |  FROM generate_series(0, 63) AS g(i)),
             |fr AS (
             |  SELECT media_id, width, height,
             |    unnest(generate_series(0, nf - 1)) AS frame_idx
             |  FROM m),
             |px AS (
             |  SELECT media_id, frame_idx, width, height,
             |    CAST(sum((media_id * 31 + frame_idx * 17 + j) % 256)
             |      AS BIGINT) AS pix_sum
             |  FROM fr, unnest(generate_series(0, width * height * 3 - 1)) AS u(j)
             |  WHERE frame_idx % 2 = 0
             |  GROUP BY 1, 2, 3, 4)
             |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
             |  CAST(width AS INT) AS width, CAST(height AS INT) AS height,
             |  pix_sum
             |FROM px ORDER BY media_id, frame_idx""".stripMargin)),

    // MP3 manifest WITHOUT decode: the real MPEG-1 Layer III header walk
    // (sync scan + bitrate/rate indexes + frame jumps) over synthesized
    // frame sequences — duration, frame count, VBR flag, and junk-byte
    // accounting all from headers alone; PCM decode stays documented
    // out of scope (no bundled demuxer). The fixture plants leading
    // junk (id%5=0, resync'd over), a REAL ID3v2 tag whose payload
    // carries a fake frame header (id%6=1 — the declared-size skip must
    // never parse it; album-art bytes do this in the wild), a truncated
    // tail header (id%7=3, remainder quarantined, parsed frames kept),
    // pure-garbage files (id%31=30, quarantined whole), and CBR-vs-VBR
    // patterns (id%4);
    // every feature follows a closed form of the id, so the oracle
    // recomputes all of them — a walk off by one byte, a wrong bitrate
    // table cell, or mis-counted junk breaks the hash.
    QueryDef(
      "q_multimodal_mp3_meta",
      (s, _) => Multimodal.mp3Meta(Multimodal.syntheticMp3(s, 64))
        .orderBy(col("media_id")),
      Some(mp3MetaOracleSql)),

    // MP4 manifest WITHOUT decode: the real ISO BMFF box walk (size/4cc
    // framing, mvhd timescale+duration, trak count) over synthesized
    // ftyp+moov files; sample decode stays out of scope. A malformed
    // trailing box (declared size 4 < header size, id%9=5) quarantines
    // the remainder but KEEPS the parsed features — box framing has no
    // sync word to resync on; garbage files (id%31=30) quarantine
    // whole. The oracle recomputes every feature from the id closed
    // forms.
    QueryDef(
      "q_multimodal_mp4_meta",
      (s, _) => Multimodal.mp4Meta(Multimodal.syntheticMp4(s, 64))
        .orderBy(col("media_id")),
      Some("""WITH m AS (
             |  SELECT CAST(i AS BIGINT) AS media_id,
             |    600 + (i % 5) * 100 AS timescale,
             |    1200 + i * 7 AS duration_units,
             |    1 + i % 3 AS n_tracks
             |  FROM generate_series(0, 63) AS g(i))
             |SELECT media_id, 'isom' AS brand,
             |  CAST(timescale AS BIGINT) AS timescale,
             |  CAST(duration_units AS BIGINT) AS duration_units,
             |  CAST(duration_units * 1000000 // timescale AS BIGINT)
             |    AS duration_micros,
             |  CAST(n_tracks AS BIGINT) AS n_tracks,
             |  media_id % 9 = 5 AS quarantined
             |FROM m WHERE media_id % 31 <> 30
             |UNION ALL
             |SELECT media_id, '' AS brand, 0, 0, 0, 0, true
             |FROM m WHERE media_id % 31 = 30
             |ORDER BY media_id""".stripMargin)),

    // Typed cogroup — the per-group imperative escape hatch for logic
    // spanning TWO datasets (the batch sibling of
    // flatMapGroupsWithState): customers and their orders stream through
    // one function per key as iterators, here reconciling the stored
    // balance against order history in integer cents. One shuffle per
    // side on the key, no state beyond the running sums; semantics
    // match a left-join aggregate, so the oracle is plain SQL. Use
    // declarative joins when they can express the logic — this tier is
    // for when they can't; the oracle keeps this instance honest.
    QueryDef(
      "q_cogroup_reconcile",
      (s, dir) => {
        import s.implicits._
        val cents = (c: org.apache.spark.sql.Column) => Tables.cents(c)
        val cust = load(s, dir, "customer")
          .select(col("c_custkey"), cents(col("c_acctbal")).as("acct_cents"))
          .as[(Long, Long)]
        val ords = load(s, dir, "orders")
          .select(col("o_custkey"), cents(col("o_totalprice")).as("price_cents"))
          .as[(Long, Long)]
        cust.groupByKey(_._1).cogroup(ords.groupByKey(_._1)) { (k, cs, os) =>
          val c = cs.toList
          if (c.isEmpty) Iterator.empty // orphan orders: out of scope here
          else {
            var n = 0L
            var sum = 0L
            os.foreach { o => n += 1; sum += o._2 }
            Iterator((k, c.head._2, n, sum))
          }
        }.toDF("k", "acct_cents", "n_orders", "orders_cents")
          .orderBy(col("k"))
      },
      Some("""SELECT c_custkey AS k,
             |  CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acct_cents,
             |  count(o_custkey) AS n_orders,
             |  CAST(coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |    AS BIGINT)), 0) AS BIGINT) AS orders_cents
             |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
             |GROUP BY k, acct_cents ORDER BY k""".stripMargin)),
  )
}
