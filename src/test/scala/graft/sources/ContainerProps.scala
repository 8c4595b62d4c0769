package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Fuzz/robustness properties for the container parsers (pure JVM — no
  * Spark jobs). The quarantine contract under test: arbitrary bytes,
  * truncations, and bit-flips must NEVER throw or hang — they terminate
  * with a (possibly empty) prefix of valid members. A crawler cracking
  * a million shards cannot afford one malformed file failing a task. */
object ContainerProps extends Properties("graft.sources.containers") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  /** A syntactically valid in-memory tar of (name, payload) members —
    * built independently of the production writer (GNU-style magic,
    * space-terminated octals), the external-producer shape. */
  private def tarOf(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    def hdr(name: String, size: Int): Array[Byte] = {
      val h = new Array[Byte](512)
      val nb = name.getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(nb, 0, h, 0, nb.length)
      def put(off: Int, s: String): Unit = {
        val b = s.getBytes(StandardCharsets.US_ASCII)
        System.arraycopy(b, 0, h, off, b.length)
      }
      put(100, "0000644 "); put(108, "0000000 "); put(116, "0000000 ")
      put(124, f"$size%011o "); put(136, "00000000000 ")
      put(148, "        "); h(156) = '0'; put(257, "ustar  ")
      var sum = 0L
      for (i <- 0 until 512) sum += h(i) & 0xff
      put(148, f"$sum%06o  ")
      h
    }
    members.flatMap { case (n, d) =>
      hdr(n, d.length) ++ d ++ new Array[Byte]((512 - d.length % 512) % 512)
    }.toArray ++ new Array[Byte](1024)
  }

  private val nameGen: Gen[String] = for {
    key <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(10).mkString)
    ext <- Gen.oneOf("txt", "json", "cls.png", "x")
  } yield s"$key.$ext"

  private val memberGen: Gen[(String, Array[Byte])] = for {
    n <- nameGen
    d <- Gen.choose(0, 1500).flatMap(len =>
      Gen.listOfN(len, Gen.choose(Byte.MinValue, Byte.MaxValue)))
  } yield (n, d.toArray)

  property("tar roundtrip: externally-shaped archives parse member for " +
    "member") = forAll(Gen.listOfN(4, memberGen)) { ms =>
    val got = WebDataset.parseMembers(
      new ByteArrayInputStream(tarOf(ms))).toVector
    got.map(_._1) == ms.map(_._1) &&
      got.zip(ms).forall { case ((_, a), (_, b)) => a.sameElements(b) }
  }

  property("tar fuzz: arbitrary bytes never throw — they terminate with " +
    "a member prefix") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      WebDataset.parseMembers(
        new ByteArrayInputStream(bs.toArray)).toVector
      true
    }

  property("tar truncation: any prefix cut of a valid archive yields a " +
    "prefix of its members, never an exception") =
    forAll(Gen.listOfN(3, memberGen), Gen.choose(0.0, 1.0)) { (ms, frac) =>
      val full = tarOf(ms)
      val cut = java.util.Arrays.copyOfRange(full, 0,
        (full.length * frac).toInt)
      val got = WebDataset.parseMembers(
        new ByteArrayInputStream(cut)).toVector
      val names = got.map(_._1)
      names == ms.map(_._1).take(names.length)
    }

  property("tar bit-flip: one corrupted byte never throws; members " +
    "BEFORE the flipped block still parse") =
    forAll(Gen.listOfN(3, memberGen), Gen.choose(0, Int.MaxValue),
      Gen.choose(Byte.MinValue, Byte.MaxValue)) { (ms, posSeed, b) =>
      val full = tarOf(ms)
      val pos = posSeed % full.length
      val mut = full.clone(); mut(pos) = b
      val got = WebDataset.parseMembers(
        new ByteArrayInputStream(mut)).toVector
      // members whose [header, data] span ends before the flip are
      // untouched and MUST survive (parse is strictly sequential)
      var off = 0
      var safe = 0
      for ((_, d) <- ms) {
        val end = off + 512 + d.length + (512 - d.length % 512) % 512
        if (end <= pos) safe += 1
        off = end
      }
      got.size >= safe && got.size <= ms.size
    }

  // -- Arrow IPC blobs ---------------------------------------------------------

  /** A valid in-memory Arrow IPC file of (id, v) rows, built straight on
    * the Arrow API (independent of the production writer) with `perBatch`
    * rows per record batch. */
  private def arrowOf(rows: Seq[(Long, String)], perBatch: Int): Array[Byte] = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, VarCharVector, VectorSchemaRoot}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
    val schema = new Schema(java.util.List.of(
      new Field("id", new FieldType(false, new ArrowType.Int(64, true), null),
        java.util.List.of[Field]()),
      new Field("v", new FieldType(true, ArrowType.Utf8.INSTANCE, null),
        java.util.List.of[Field]())))
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(schema, alloc)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new ArrowFileWriter(root, null,
      java.nio.channels.Channels.newChannel(bos))
    try {
      w.start()
      rows.grouped(math.max(perBatch, 1)).foreach { batch =>
        root.allocateNew()
        batch.zipWithIndex.foreach { case ((id, v), i) =>
          root.getVector(0).asInstanceOf[BigIntVector].setSafe(i, id)
          root.getVector(1).asInstanceOf[VarCharVector]
            .setSafe(i, v.getBytes(StandardCharsets.UTF_8))
        }
        root.setRowCount(batch.size)
        w.writeBatch()
      }
      w.end()
    } finally { w.close(); root.close(); alloc.close() }
    bos.toByteArray
  }

  private val arrowSchemaJson: String =
    ArrowIo.toArrowSchema(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType, nullable = true)))).toJson

  private val arrowRowsGen: Gen[Seq[(Long, String)]] =
    Gen.listOf(for {
      id <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
      v <- Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    } yield (id, v)).map(_.toSeq)

  property("arrow roundtrip: externally-built IPC files decode row for " +
    "row across batch boundaries") =
    forAll(arrowRowsGen, Gen.chooseNum(1, 7)) { (rows, perBatch) =>
      val got = ArrowIo.decodeOneBlob(arrowOf(rows, perBatch), arrowSchemaJson)
      got.map(r => (r.getLong(0), r.getString(1))) == rows.toVector
    }

  property("arrow byte soup: arbitrary bytes never throw and decode to " +
    "nothing") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      ArrowIo.decodeOneBlob(bs.toArray, arrowSchemaJson).isEmpty
    }

  property("arrow truncation: any prefix cut never throws and yields a " +
    "prefix of the rows (usually empty — the footer IS the index)") =
    forAll(arrowRowsGen, Gen.chooseNum(1, 7), Gen.choose(0.0, 1.0)) {
      (rows, perBatch, frac) =>
        val full = arrowOf(rows, perBatch)
        val cut = java.util.Arrays.copyOfRange(full, 0,
          (full.length * frac).toInt)
        val got = ArrowIo.decodeOneBlob(cut, arrowSchemaJson)
        got.map(r => (r.getLong(0), r.getString(1))) ==
          rows.toVector.take(got.size)
    }

  property("arrow bit-flip: one corrupted byte never throws and always " +
    "terminates (a flipped metadata count CAN inflate decoded rows with " +
    "padding garbage — inherent to footer-indexed columnar files, which " +
    "is why the engine's trust boundary is the whole-file checksum of " +
    "the transport, not the container)") =
    forAll(arrowRowsGen, Gen.chooseNum(1, 7), Gen.choose(0, Int.MaxValue),
      Gen.choose(Byte.MinValue, Byte.MaxValue)) { (rows, perBatch, posSeed, b) =>
      val full = arrowOf(rows, perBatch)
      val mut = full.clone()
      if (mut.nonEmpty) mut(posSeed % mut.length) = b
      ArrowIo.decodeOneBlob(mut, arrowSchemaJson)
      true
    }
}
