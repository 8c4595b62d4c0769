package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.complex.impl.UnionListWriter
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Arrow IPC files (the Feather-v2 random-access format) — the
  * zero-copy columnar interchange every dataloader/featurestore
  * boundary speaks (pyarrow `feather.read_table` / `RecordBatchFileReader`
  * reads these bytes verbatim; validated against pyarrow 17 during
  * development). Arrow CORE ships with Spark (it backs the Pandas-UDF
  * transport), so like [[AvroIo]] this needs no external module — only
  * the container discipline the engine's other sources already follow:
  *
  *  - WRITE is embarrassingly parallel: each task fills 4096-row
  *    record batches into ONE reused `VectorSchemaRoot` and streams
  *    them through `ArrowFileWriter` into a Hadoop FS stream (the file
  *    format writes its footer at close — sequential, no seeking), to
  *    an attempt-suffixed temp renamed into place. O(batch) heap.
  *  - READ is path-streaming with ONE driver-side footer open for the
  *    schema: each task re-opens its file through a seekable Hadoop
  *    channel adapter and decodes batch by batch — O(batch) heap, one
  *    task per file. Random access (the format's point) also makes a
  *    future batch-range split trivial.
  *
  * Type surface (covers every engine table, loudly refused beyond it):
  * boolean/int/long/float/double/string/binary, timestamp-micros (UTC)
  * and decimal128 logical types (the events/pricing columns), nullable
  * bitmaps, `array<float|double|long|int>` (the embeddings column). Quarantine
  * contract (the WARC rule): a corrupt or non-Arrow file quarantines
  * whole; a file whose embedded schema differs from the directory's
  * quarantines whole (positional decode against the wrong field list
  * would transpose values); a truncation mid-file keeps the batches
  * decoded before it.
  */
object ArrowIo {

  private val BatchRows = 4096

  // ------------------------------------------------------------- schema

  private def arrowType(dt: DataType): ArrowType = dt match {
    case BooleanType => ArrowType.Bool.INSTANCE
    case IntegerType => new ArrowType.Int(32, true)
    case LongType => new ArrowType.Int(64, true)
    case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case StringType => ArrowType.Utf8.INSTANCE
    case BinaryType => ArrowType.Binary.INSTANCE
    // logical types (r13 verdict: the engine's own tables must ride the
    // container quartet end-to-end): Spark TimestampType is micros
    // since epoch, tz-normalized — exactly Arrow Timestamp(MICROSECOND,
    // UTC); DecimalType maps to Arrow Decimal128 with the same
    // precision/scale (the pricing-column shape)
    case TimestampType =>
      new ArrowType.Timestamp(
        org.apache.arrow.vector.types.TimeUnit.MICROSECOND, "UTC")
    case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
    case other => throw new IllegalArgumentException(
      s"arrow write: unsupported Spark type $other")
  }

  private[graft] def toArrowSchema(st: StructType): Schema = {
    val fields = st.fields.map { f =>
      f.dataType match {
        case ArrayType(et, containsNull) =>
          et match {
            case FloatType | DoubleType | LongType | IntegerType => ()
            case other => throw new IllegalArgumentException(
              s"arrow write: unsupported list element type $other")
          }
          val child = new Field("item",
            new FieldType(containsNull, arrowType(et), null),
            java.util.List.of[Field]())
          new Field(f.name,
            new FieldType(f.nullable, ArrowType.List.INSTANCE, null),
            java.util.List.of(child))
        case dt =>
          new Field(f.name, new FieldType(f.nullable, arrowType(dt), null),
            java.util.List.of[Field]())
      }
    }
    new Schema(fields.toList.asJava)
  }

  private[graft] def toSparkSchema(s: Schema): StructType = {
    def scalarType(t: ArrowType): DataType = t match {
      case _: ArrowType.Bool => BooleanType
      case i: ArrowType.Int if i.getBitWidth == 32 && i.getIsSigned => IntegerType
      case i: ArrowType.Int if i.getBitWidth == 64 && i.getIsSigned => LongType
      case fp: ArrowType.FloatingPoint
          if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
      case fp: ArrowType.FloatingPoint
          if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Binary => BinaryType
      case ts: ArrowType.Timestamp
          if ts.getUnit == org.apache.arrow.vector.types.TimeUnit.MICROSECOND
            && ts.getTimezone != null => TimestampType
      case d: ArrowType.Decimal if d.getBitWidth == 128 =>
        DecimalType(d.getPrecision, d.getScale)
      case other => throw new IllegalArgumentException(
        s"arrow read: unsupported Arrow type $other")
    }
    StructType(s.getFields.asScala.toSeq.map { f =>
      val dt = f.getType match {
        case _: ArrowType.List =>
          val child = f.getChildren.get(0)
          ArrayType(scalarType(child.getType), child.isNullable)
        case t => scalarType(t)
      }
      StructField(f.getName, dt, f.isNullable)
    })
  }

  // ------------------------------------------------------------- values

  /** One cell into the batch's vector at `i` — scalar vectors via their
    * typed setters, lists via the per-batch `UnionListWriter`. */
  private def setValue(vec: FieldVector, lw: UnionListWriter, i: Int,
                       v: Any): Unit = vec match {
    case b: BigIntVector => b.setSafe(i, v.asInstanceOf[Long])
    case b: IntVector => b.setSafe(i, v.asInstanceOf[Int])
    case b: Float8Vector => b.setSafe(i, v.asInstanceOf[Double])
    case b: Float4Vector => b.setSafe(i, v.asInstanceOf[Float])
    case b: BitVector => b.setSafe(i, if (v.asInstanceOf[Boolean]) 1 else 0)
    case b: VarCharVector =>
      b.setSafe(i, v.asInstanceOf[String]
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case b: VarBinaryVector => b.setSafe(i, v.asInstanceOf[Array[Byte]])
    case b: TimeStampMicroTZVector =>
      b.setSafe(i, timestampToMicros(v.asInstanceOf[java.sql.Timestamp]))
    case b: DecimalVector =>
      // Spark normalizes row decimals to the column's declared scale,
      // which is what the vector's setSafe(BigDecimal) contract demands
      b.setSafe(i, v.asInstanceOf[java.math.BigDecimal])
    case l: ListVector =>
      lw.setPosition(i)
      lw.startList()
      v.asInstanceOf[scala.collection.Seq[_]].foreach {
        case null => l.getDataVector match {
          // null ELEMENTS are part of the declared surface (the schema
          // maps containsNull to child nullability, and the reader
          // decodes them) — write must be symmetric, not fail mid-batch
          case _: Float4Vector => lw.float4().writeNull()
          case _: Float8Vector => lw.float8().writeNull()
          case _: BigIntVector => lw.bigInt().writeNull()
          case _: IntVector => lw.integer().writeNull()
          case other => throw new IllegalArgumentException(
            s"arrow write: unsupported list child ${other.getClass.getName}")
        }
        case f: Float => lw.float4().writeFloat4(f)
        case d: Double => lw.float8().writeFloat8(d)
        case n: Long => lw.bigInt().writeBigInt(n)
        case n: Int => lw.integer().writeInt(n)
        case other => throw new IllegalArgumentException(
          s"arrow write: unsupported list element $other")
      }
      lw.endList()
    case other => throw new IllegalArgumentException(
      s"arrow write: unsupported vector ${other.getClass.getName}")
  }

  /** Epoch micros of a java.sql.Timestamp (exact: floor-second + the
    * sub-second nanos, correct for pre-epoch values too). */
  private def timestampToMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def microsToTimestamp(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** One decoded cell — vector-aware where `getObject`'s raw value is
    * ambiguous (a timestamp vector yields a bare Long; Spark Rows need
    * java.sql.Timestamp) or already right (DecimalVector yields the
    * BigDecimal Spark expects). */
  private def cellValue(vec: FieldVector, i: Int): Any = vec match {
    case t: TimeStampMicroTZVector => microsToTimestamp(t.get(i))
    case d: DecimalVector => d.getObject(i)
    case v => fromArrowValue(v.getObject(i))
  }

  private def fromArrowValue(v: Any): Any = v match {
    case null => null
    case t: org.apache.arrow.vector.util.Text => t.toString
    case l: java.util.List[_] => l.asScala.toSeq.map(fromArrowValue)
    case other => other // primitives + byte[] pass through
  }

  // -------------------------------------------------------------- write

  /** Write `df` as `part_NNNNN.arrow` IPC files under `dir`. Returns
    * rows written. `numFiles` 0 keeps the incoming partitioning. */
  def writeArrow(df: DataFrame, dir: String, numFiles: Int = 0): Long = {
    val spark = df.sparkSession
    val hc = org.apache.spark.graftshim.GraftSparkInternals
      .broadcastHadoopConf(spark.sparkContext)
    val st = df.schema
    val schemaJson = toArrowSchema(st).toJson
    PartFiles.clearStaging(dir, spark.sparkContext.hadoopConfiguration)
    val gen = PartFiles.stagingDir(dir)
    val parted = if (numFiles > 0) df.repartition(numFiles) else df
    val counts = parted.rdd.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val schema = Schema.fromJSON(schemaJson)
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val name = f"part_$pid%05d.arrow"
        val fin = new org.apache.hadoop.fs.Path(s"$gen/$name")
        val tmp = new org.apache.hadoop.fs.Path(
          f"$gen/.part_$pid%05d.${tc.taskAttemptId()}.tmp")
        val fs = fin.getFileSystem(hc.conf)
        val allocator = new RootAllocator()
        val root = VectorSchemaRoot.create(schema, allocator)
        val out = fs.create(tmp, true)
        val ch = java.nio.channels.Channels.newChannel(out)
        val w = new ArrowFileWriter(root, null, ch)
        var n = 0L
        try {
          w.start()
          val grouped = it.grouped(BatchRows)
          while (grouped.hasNext) {
            val batch = grouped.next()
            root.allocateNew()
            val vecs = (0 until st.length).map(root.getVector).toArray
            val listWriters = vecs.map {
              case l: ListVector => l.getWriter
              case _ => null
            }
            var i = 0
            batch.foreach { row =>
              var c = 0
              while (c < st.length) {
                val v = row.get(c)
                if (v == null) vecs(c) match {
                  // list nulls: the writer never visits the slot, so the
                  // validity bit stays unset — setRowCount back-fills the
                  // offsets over the gap
                  case _: ListVector => ()
                  case fv: BaseFixedWidthVector => fv.setNull(i)
                  case vv: BaseVariableWidthVector => vv.setNull(i)
                  case other => throw new IllegalArgumentException(
                    s"arrow write: cannot null ${other.getClass.getName}")
                }
                else setValue(vecs(c), listWriters(c), i, v)
                c += 1
              }
              i += 1
              n += 1
            }
            root.setRowCount(i)
            w.writeBatch()
          }
          w.end()
        } finally {
          try w.close() finally { // closes the channel + FS stream
            root.close(); allocator.close()
          }
        }
        fs.delete(fin, false)
        if (!fs.rename(tmp, fin))
          throw new java.io.IOException(s"rename $tmp -> $fin failed")
        Iterator.single((name, n))
      }
    }.collect() // one (name, count) per file — bounded driver state
    // success: swap the staged generation live (exact overwrite)
    PartFiles.publishGeneration(dir, "part_", ".arrow",
      counts.map(_._1).toIndexedSeq,
      spark.sparkContext.hadoopConfiguration)
    counts.map(_._2).sum
  }

  // --------------------------------------------------------------- read

  /** Seekable-channel adapter over a Hadoop input stream — the file
    * format's reader seeks to the footer first. */
  private final class HadoopSeekableChannel(
      in: org.apache.hadoop.fs.FSDataInputStream, totalSize: Long)
    extends java.nio.channels.SeekableByteChannel {
    private var open = true
    override def read(dst: java.nio.ByteBuffer): Int = {
      val buf = new Array[Byte](dst.remaining())
      val n = in.read(buf, 0, buf.length)
      if (n > 0) dst.put(buf, 0, n)
      n
    }
    override def position(): Long = in.getPos
    override def position(p: Long): java.nio.channels.SeekableByteChannel = {
      in.seek(p); this
    }
    override def size(): Long = totalSize
    override def write(src: java.nio.ByteBuffer): Int =
      throw new java.io.IOException("read-only channel")
    override def truncate(s: Long): java.nio.channels.SeekableByteChannel =
      throw new java.io.IOException("read-only channel")
    override def isOpen: Boolean = open
    override def close(): Unit = { open = false; in.close() }
  }

  /** Allocator CEILING for decoding untrusted IPC bytes of physical
    * length `len`: a structurally valid file can never need buffers
    * beyond its own bytes (we write uncompressed IPC; Arrow rounds
    * each buffer to the next power of two, hence the headroom factor),
    * so a corrupted metadata length that asks for more — the r14
    * falsified ContainerProps property asked for 1 TB from ONE flipped
    * byte — hits the limit and Arrow throws its own (catchable,
    * buffer-releasing) allocation failure instead of a fatal JVM
    * OutOfMemoryError. Quarantine then proceeds on the normal path. */
  private[sources] def allocBound(len: Long): Long =
    8L * math.max(len, 0L) + (1L << 20)

  /** Decode ceiling for IPC files whose record batches declare BODY
    * COMPRESSION (LZ4_FRAME/ZSTD — externally produced; the engine
    * writes uncompressed): decompressed buffers legitimately exceed the
    * 8× bound, so the cap widens — but stays INPUT-PROPORTIONAL
    * (256× + 8 MiB, capped at 1 GiB): a forged compression claim on a
    * KB-scale blob buys a ~8 MiB ceiling, never a gigabyte (the
    * claim-sized-allocation class allocBound exists for — this round's
    * review caught the first cut granting a flat 1 GiB to any input
    * that merely CLAIMED compression). 256× covers every practical
    * LZ4/ZSTD corpus ratio; a pathological valid file past it
    * quarantines LOUDLY at a catchable allocation failure — never a
    * fatal JVM OOM, never a silent drop. */
  private[sources] def compressedAllocBound(len: Long): Long =
    math.min(256L * math.max(len, 0L) + (8L << 20), 1L << 30)

  /** True iff the file's first record batch declares body compression.
    * Writers set the codec uniformly per file, so the first batch
    * speaks for the file. Reads only the batch's encapsulated
    * flatbuffer MESSAGE straight from the channel (KBs — never the
    * body); any parse failure reads as uncompressed, keeping the strict
    * bound (a corrupt file quarantines on the normal path anyway). */
  private def firstBatchCompressed(
      ch: java.nio.channels.SeekableByteChannel,
      blocks: java.util.List[
        org.apache.arrow.vector.ipc.message.ArrowBlock]): Boolean =
    try {
      if (blocks.isEmpty) return false
      val b = blocks.get(0)
      // a real batch MESSAGE is KBs; a flipped footer length can claim
      // GiBs — refuse the probe (reads as uncompressed, strict bound
      // stays) rather than allocate the claim
      if (b.getMetadataLength < 8 || b.getMetadataLength > (16 << 20))
        return false
      val bb = java.nio.ByteBuffer.allocate(b.getMetadataLength)
      ch.position(b.getOffset)
      // n == 0 at EOF too (ByteArrayReadableSeekableByteChannel never
      // returns -1) — any non-positive read ends the loop
      while (bb.hasRemaining && ch.read(bb) > 0) ()
      if (bb.hasRemaining) return false
      bb.flip()
      bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val first = bb.getInt
      if (first == -1) bb.getInt // modern framing: continuation + length
      // else legacy framing: `first` WAS the length, message follows
      val msgBuf = bb.slice().order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val msg = org.apache.arrow.flatbuf.Message.getRootAsMessage(msgBuf)
      if (msg.headerType() !=
          org.apache.arrow.flatbuf.MessageHeader.RecordBatch) false
      else {
        val rb = msg.header(new org.apache.arrow.flatbuf.RecordBatch())
          .asInstanceOf[org.apache.arrow.flatbuf.RecordBatch]
        rb != null && rb.compression() != null
      }
    } catch { case scala.util.control.NonFatal(_) => false }

  /** The decompression codec factory for the read paths (LZ4/ZSTD via
    * arrow-compression, on the classpath with Spark). Harmless for
    * uncompressed files. */
  private def codecFactory
      : org.apache.arrow.vector.compression.CompressionCodec.Factory =
    org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE

  private def warnAllocCeiling(where: String, e: Throwable): Unit =
    org.slf4j.LoggerFactory.getLogger(getClass).warn(
      s"arrow decode at $where hit its allocation ceiling " +
        s"(${e.getMessage}): remainder quarantined")

  /** Allocation backing for the UNTRUSTED decode paths: plain direct
    * ByteBuffers instead of Arrow's default netty arenas. When a decode
    * of corrupt bytes dies mid-flight, Arrow can strand an in-flight
    * message buffer that no close() reaches (the 256/512-byte
    * "Memory was leaked by query" accounting errors on the quarantine
    * path) — under netty that memory is parked in a shared arena
    * FOREVER, a slow bleed on an executor cracking millions of corrupt
    * shards; a direct ByteBuffer is owned by its GC Cleaner, so a
    * stranded buffer is reclaimed at the next collection. Deterministic
    * release still happens on the normal path (reflective Cleaner
    * invoke — java.base/sun.nio.ch is opened by the launcher options;
    * if the reflection is unavailable the Cleaner itself remains the
    * backstop). Trusted WRITE-path allocators keep the default netty
    * backing. */
  private object SafeDecodeAllocations
    extends org.apache.arrow.memory.AllocationManager.Factory {
    import org.apache.arrow.memory.{AllocationManager, ArrowBuf,
      BufferAllocator, OutOfMemoryException, ReferenceManager}
    import org.apache.arrow.memory.util.MemoryUtil
    private val cleanerOf: Option[(java.lang.reflect.Method,
        java.lang.reflect.Method)] =
      try {
        val db = Class.forName("sun.nio.ch.DirectBuffer")
        val cm = db.getMethod("cleaner")
        Some((cm, cm.getReturnType.getMethod("clean")))
      } catch { case scala.util.control.NonFatal(_) => None }
    private val emptyBacking = java.nio.ByteBuffer.allocateDirect(1)
    private val emptyBuf = new ArrowBuf(ReferenceManager.NO_OP, null, 0L,
      MemoryUtil.getByteBufferAddress(emptyBacking))
    override def empty(): ArrowBuf = emptyBuf
    override def create(accounting: BufferAllocator,
                        size: Long): AllocationManager = {
      if (size > Int.MaxValue)
        throw new OutOfMemoryException(
          s"decode allocation of $size bytes exceeds the 2 GiB buffer cap")
      val backing =
        try java.nio.ByteBuffer.allocateDirect(math.max(size, 1L).toInt)
        catch {
          case e: OutOfMemoryError => // direct-memory cap: catchable form
            throw new OutOfMemoryException(e.getMessage)
        }
      new AllocationManager(accounting) {
        override def getSize: Long = size
        override protected def memoryAddress(): Long =
          MemoryUtil.getByteBufferAddress(backing)
        override protected def release0(): Unit =
          cleanerOf.foreach { case (cm, cl) =>
            try {
              val c = cm.invoke(backing)
              if (c != null) cl.invoke(c)
            } catch { case scala.util.control.NonFatal(_) => () }
          }
      }
    }
  }

  /** A size-capped RootAllocator over [[SafeDecodeAllocations]] — every
    * read-path decode of untrusted bytes goes through one of these. */
  private[sources] def decodeAllocator(limit: Long): RootAllocator =
    org.apache.arrow.memory.GraftArrowMemoryShim
      .cappedAllocator(limit, SafeDecodeAllocations)

  /** Peak off-heap allocation of this thread's most recent
    * [[decodeOneBlob]] — test observability only: ContainerProps pins
    * `peak ≤ allocBound(len)` as a 200-case PROPERTY (Arrow's direct
    * buffers are invisible to the heap-side ThreadMXBean counter the
    * other container formats assert with), so the bound survives a
    * refactor that silently drops the cap. */
  private[sources] val lastDecodePeak: ThreadLocal[java.lang.Long] =
    ThreadLocal.withInitial(() => java.lang.Long.valueOf(0L))

  /** Schema of the first readable container under `dir` — one
    * driver-side footer open, the format's own self-description. */
  private def dirSchema(dir: String,
                        hc: org.apache.hadoop.conf.Configuration): Schema = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(hc)
    val candidates = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".arrow")).sortBy(_.getName)
    candidates.iterator.flatMap { f =>
      val allocator = decodeAllocator(
        allocBound(fs.getFileStatus(f).getLen))
      try {
        val ch = new HadoopSeekableChannel(fs.open(f),
          fs.getFileStatus(f).getLen)
        val r = new ArrowFileReader(ch, allocator)
        try Iterator.single(r.getVectorSchemaRoot.getSchema)
        finally r.close()
      } catch {
        case scala.util.control.NonFatal(_) => Iterator.empty
      } finally {
        try allocator.close()
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }.nextOption().getOrElse(
      throw new java.io.FileNotFoundException(
        s"no readable .arrow file in $dir"))
  }

  /** Embedded schema of the IPC files under `dir`, as Arrow schema
    * JSON — the plan-time input of [[decodeBlobs]] (a streaming
    * transform needs its output schema before any micro-batch
    * arrives). */
  def schemaJsonOf(spark: SparkSession, dir: String): String = {
    val hc = org.apache.spark.graftshim.GraftSparkInternals
      .broadcastHadoopConf(spark.sparkContext)
    dirSchema(dir, hc.conf).toJson
  }

  /** BLOB-decoding stage for STREAMED IPC files (the
    * [[AvroIo.decodeBlobs]] contract: this variant exists for the
    * binaryFile stream, where content arrives per micro-batch anyway —
    * batch scans use the path-streaming [[readArrow]]): each row's
    * `content` bytes parse as one Arrow file under the FIXED
    * `schemaJson` ([[schemaJsonOf]]); same quarantine rules as the
    * batch reader (unreadable, truncated-footer, or schema-mismatched
    * files empty). */
  def decodeBlobs(files: DataFrame, schemaJson: String): DataFrame = {
    val st = toSparkSchema(Schema.fromJSON(schemaJson))
    files.select(col("content"))
      .flatMap { (r: Row) =>
        decodeOneBlob(r.getAs[Array[Byte]](0), schemaJson).iterator
      }(org.apache.spark.sql.Encoders.row(st))
  }

  /** One blob's rows under `schemaJson` — the pure-JVM core of
    * [[decodeBlobs]] (fuzzed directly by ContainerProps, no Spark
    * session): unreadable/truncated-footer/schema-mismatched bytes
    * yield nothing, a mid-file decode failure (a footer that lied)
    * keeps the batches decoded before it — EXACTLY the batch reader's
    * truncation rule, so stream ≡ batch holds on corrupt inputs too.
    * NEVER throws on malformed input. */
  private[graft] def decodeOneBlob(bytes: Array[Byte],
                                   schemaJson: String): Vector[Row] = {
    if (bytes == null) return Vector.empty
    val width = toSparkSchema(Schema.fromJSON(schemaJson)).length
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    // open once under the strict physical-bytes bound; compressed
    // batches legitimately decode past it, so detect body compression
    // on the LIVE reader's footer (KBs) and reopen under the widened
    // ceiling ONLY then — engine-written (always uncompressed) blobs
    // never pay a second footer parse (this round's review caught the
    // first cut probing every blob twice)
    var allocator = decodeAllocator(allocBound(bytes.length.toLong))
    try {
      var reader = new ArrowFileReader(new org.apache.arrow.vector.util
        .ByteArrayReadableSeekableByteChannel(bytes), allocator,
        codecFactory)
      try {
        var root = reader.getVectorSchemaRoot
        if (root.getSchema.toJson == schemaJson &&
            firstBatchCompressed(new org.apache.arrow.vector.util
              .ByteArrayReadableSeekableByteChannel(bytes),
              reader.getRecordBlocks)) {
          try reader.close()
          catch { case scala.util.control.NonFatal(_) => () }
          try allocator.close()
          catch { case scala.util.control.NonFatal(_) => () }
          allocator = decodeAllocator(
            compressedAllocBound(bytes.length.toLong))
          reader = new ArrowFileReader(new org.apache.arrow.vector.util
            .ByteArrayReadableSeekableByteChannel(bytes), allocator,
            codecFactory)
          root = reader.getVectorSchemaRoot
        }
        if (root.getSchema.toJson == schemaJson) {
          while (reader.loadNextBatch()) {
            var i = 0
            val nRows = root.getRowCount
            while (i < nRows) {
              val vals = new Array[Any](width)
              var c = 0
              while (c < width) {
                val vec = root.getVector(c)
                vals(c) =
                  if (vec.isNull(i)) null
                  else cellValue(vec, i)
                c += 1
              }
              out += Row.fromSeq(vals.toIndexedSeq)
              i += 1
            }
          }
        }
      } finally {
        try reader.close()
        catch { case scala.util.control.NonFatal(_) => () }
      }
    } catch {
      case e: org.apache.arrow.memory.OutOfMemoryException =>
        warnAllocCeiling("blob", e) // keep decoded rows, loudly
      case scala.util.control.NonFatal(_) => () // keep decoded rows
    } finally {
      lastDecodePeak.set(
        try allocator.getPeakMemoryAllocation
        catch { case scala.util.control.NonFatal(_) => 0L })
      try allocator.close()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    out.toVector
  }

  /** Scan a directory of `.arrow` IPC files into a DataFrame. One task
    * per file; O(batch) heap; corrupt / schema-mismatched files
    * quarantine whole, truncation keeps prior batches. */
  def readArrow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hc = org.apache.spark.graftshim.GraftSparkInternals
      .broadcastHadoopConf(spark.sparkContext)
    val dirArrowSchema = dirSchema(dir, hc.conf)
    val expectedJson = dirArrowSchema.toJson
    val st = toSparkSchema(dirArrowSchema)
    val width = st.length
    val rows = spark.read.format("binaryFile").load(dir)
      .filter(col("path").endsWith(".arrow"))
      .select("path").as[String].rdd
      .flatMap { path =>
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(hc.conf)
        // a status failure here must NOT silently shrink the allocator
        // cap (a transient RPC error on a VALID file would quarantine
        // its rows via a 1 MiB ceiling): only a vanished file degrades
        // to the quarantine path; other IO errors rethrow into Spark's
        // task retry — the readAvro open-time contract
        val fileLen =
          try fs.getFileStatus(p).getLen
          catch { case _: java.io.FileNotFoundException => 0L }
        var allocator = decodeAllocator(allocBound(fileLen))
        var ch: HadoopSeekableChannel = null
        def closeQuietly(): Unit = {
          if (ch != null)
            try ch.close() catch { case _: java.io.IOException => () }
          try allocator.close()
          catch { case scala.util.control.NonFatal(_) => () }
        }
        val reader =
          try {
            ch = new HadoopSeekableChannel(fs.open(p),
              fs.getFileStatus(p).getLen)
            val r = new ArrowFileReader(ch, allocator, codecFactory)
            // footer + schema validate on first root access: ANY
            // failure is a structurally unreadable file — quarantine.
            // EVERY quarantine path closes the Hadoop stream AND the
            // allocator: a directory of corrupt files on a long-lived
            // executor must not bleed fds or direct memory
            if (r.getVectorSchemaRoot.getSchema.toJson != expectedJson) {
              try r.close() catch { case _: java.io.IOException => () }
              closeQuietly()
              null
            } else if (firstBatchCompressed(ch, r.getRecordBlocks)) {
              // compressed batches legitimately decode past the
              // physical-bytes bound: reopen under the absolute
              // compressed-decode ceiling instead of quarantining a
              // valid file mid-scan (r15 advice). Uncompressed files —
              // everything the engine writes — never take this reopen.
              try r.close() catch { case _: java.io.IOException => () }
              closeQuietly()
              allocator = decodeAllocator(compressedAllocBound(fileLen))
              ch = new HadoopSeekableChannel(fs.open(p),
                fs.getFileStatus(p).getLen)
              val rw = new ArrowFileReader(ch, allocator, codecFactory)
              rw.getVectorSchemaRoot
              rw
            } else r
          } catch {
            case scala.util.control.NonFatal(_) =>
              closeQuietly()
              null
          }
        if (reader == null) Iterator.empty
        else {
          val closeAll = () => {
            try reader.close()
            catch { case scala.util.control.NonFatal(_) => () }
            try allocator.close()
            catch { case scala.util.control.NonFatal(_) => () }
          }
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => closeAll()))
          val root = reader.getVectorSchemaRoot
          new Iterator[Row] {
            private var inBatch = 0
            private var batchRows = 0
            // loadNextBatch on a truncated file throws: treat as
            // exhaustion (quarantine the remainder, keep decoded rows)
            private def advance(): Unit =
              while (inBatch >= batchRows && {
                val more =
                  try reader.loadNextBatch()
                  catch {
                    case e: org.apache.arrow.memory.OutOfMemoryException =>
                      warnAllocCeiling(path, e); false
                    case scala.util.control.NonFatal(_) => false
                  }
                if (more) { batchRows = root.getRowCount; inBatch = 0 }
                else { batchRows = -1 } // terminal
                more
              }) ()
            advance()
            override def hasNext: Boolean = batchRows > 0 && inBatch < batchRows
            override def next(): Row = {
              val vals = new Array[Any](width)
              var c = 0
              while (c < width) {
                val vec = root.getVector(c)
                vals(c) =
                  if (vec.isNull(inBatch)) null
                  else cellValue(vec, inBatch)
                c += 1
              }
              inBatch += 1
              if (inBatch >= batchRows) advance()
              Row.fromSeq(vals.toIndexedSeq)
            }
          }
        }
      }
    spark.createDataFrame(rows, st)
  }
}
