package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.ByteBuffer
import java.util.zip.{CRC32C, GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Kafka RecordBatch v2 (magic=2) codec — the FORMAT half of the
  * reference's Kafka source (flink-connectors/flink-connector-kafka
  * .../source/KafkaSource.java + the records deserializer path in
  * .../reader/deserializer/KafkaRecordDeserializationSchema.java).
  *
  * The container has no Kafka broker and no kafka-clients jar (zero
  * egress), so the NETWORK half stays env-blocked (COVERAGE.md
  * standing statement). What IS implementable from the public
  * protocol spec (kafka.apache.org/protocol — "Record Batch" and
  * "Record" layouts) is the wire/log format itself, and that is the
  * genuinely reusable piece: Kafka LOG SEGMENTS on disk use exactly
  * this encoding, so a 100-TB shop with segment dumps in object
  * storage can scan them as DataFrames with this codec and no broker
  * round-trip at all — the fastest possible "Kafka source" for bulk
  * backfill.
  *
  * Fidelity to the spec:
  *  - batch header: baseOffset i64, batchLength i32,
  *    partitionLeaderEpoch i32, magic i8 (=2), crc u32 (CRC32C —
  *    Castagnoli, NOT zlib CRC32 — over attributes..end),
  *    attributes i16 (compression bits 0-2), lastOffsetDelta i32,
  *    baseTimestamp i64, maxTimestamp i64, producerId i64,
  *    producerEpoch i16, baseSequence i32, recordCount i32; all
  *    network byte order
  *  - records: length, timestampDelta, offsetDelta, keyLen, valueLen,
  *    headerCount and header lengths are ZIGZAG VARINTS (protobuf
  *    sint encoding); -1 length = NULL key/value
  *  - compression codecs: ALL FIVE the protocol defines — none(0),
  *    gzip(1, JDK), snappy(2, xerial framed stream), lz4(3, LZ4 Frame
  *    format), zstd(4) — the snappy/lz4/zstd streams come from the
  *    same libraries Spark itself ships for shuffle/parquet
  *    compression (snappy-java, lz4-java, zstd-jni), so no extra
  *    dependency; compression covers the records section
  *    only, the header stays plain
  *  - decode VERIFIES magic and CRC32C and fails loudly on mismatch
  *    (a silent pass-through would defeat the log-recovery use case)
  *
  * Both directions are per-row boundary expressions (CodegenFallback,
  * the JsonToStructs/ProtoFormat trade): pure map-side work, no
  * shuffle, distribution inherited from the surrounding scan.
  */
object KafkaSegmentFormat {

  val RecordSchema: StructType = StructType(Seq(
    StructField("timestamp", LongType, nullable = false),
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true)))

  val BatchInputSchema: StructType = StructType(Seq(
    StructField("base_offset", LongType, nullable = false),
    StructField("records", ArrayType(RecordSchema), nullable = false)))

  val DecodedSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true))))

  // ------------------------------------------------------------------
  // zigzag varints (Kafka records use protobuf sint encoding)

  private def writeVarLong(out: ByteArrayOutputStream, v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63)
    while ((z & ~0x7fL) != 0) {
      out.write(((z & 0x7f) | 0x80).toInt); z >>>= 7
    }
    out.write(z.toInt)
  }

  private final class Reader(val buf: Array[Byte], var pos: Int) {
    def readVarLong(): Long = {
      var shift = 0; var acc = 0L
      var b = 0
      do {
        b = buf(pos) & 0xff; pos += 1
        acc |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      (acc >>> 1) ^ -(acc & 1)
    }
    def readBytes(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; a
    }
  }

  // ------------------------------------------------------------------
  // encode

  private def encodeRecord(out: ByteArrayOutputStream, tsDelta: Long,
      offsetDelta: Int, key: Array[Byte], value: Array[Byte]): Unit = {
    val body = new ByteArrayOutputStream()
    body.write(0) // record attributes (unused by the spec today)
    writeVarLong(body, tsDelta)
    writeVarLong(body, offsetDelta.toLong)
    if (key == null) writeVarLong(body, -1L)
    else { writeVarLong(body, key.length.toLong); body.write(key) }
    if (value == null) writeVarLong(body, -1L)
    else { writeVarLong(body, value.length.toLong); body.write(value) }
    writeVarLong(body, 0L) // header count
    val b = body.toByteArray
    writeVarLong(out, b.length.toLong)
    out.write(b)
  }

  /** Compresses the records section per the protocol's attribute
    * codec ids: 0=none, 1=gzip, 2=snappy (xerial framed stream — the
    * bytes kafka-clients writes), 3=lz4 (LZ4 Frame format), 4=zstd. */
  private def compress(codec: Int, raw: Array[Byte]): Array[Byte] =
    if (codec == 0) raw
    else {
      val bos = new ByteArrayOutputStream()
      val out: java.io.OutputStream = codec match {
        case 1 => new GZIPOutputStream(bos)
        case 2 => new org.xerial.snappy.SnappyOutputStream(bos)
        case 3 => new net.jpountz.lz4.LZ4FrameOutputStream(bos)
        case 4 => new com.github.luben.zstd.ZstdOutputStream(bos)
        case c => throw new IllegalArgumentException(
          s"unknown compression codec $c (protocol defines 0..4)")
      }
      out.write(raw); out.close()
      bos.toByteArray
    }

  private def decompress(codec: Int, raw: Array[Byte]): Array[Byte] =
    if (codec == 0) raw
    else {
      val bis = new ByteArrayInputStream(raw)
      val in: java.io.InputStream = codec match {
        case 1 => new GZIPInputStream(bis)
        case 2 => new org.xerial.snappy.SnappyInputStream(bis)
        case 3 => new net.jpountz.lz4.LZ4FrameInputStream(bis)
        case 4 => new com.github.luben.zstd.ZstdInputStream(bis)
        case c => throw new IllegalArgumentException(
          s"unknown compression codec $c (protocol defines 0..4)")
      }
      val out = new ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { out.write(chunk, 0, n); n = in.read(chunk) }
      in.close()
      out.toByteArray
    }

  /** Back-compat boolean form (gzip or none). */
  def encodeBatch(baseOffset: Long,
      records: Seq[(Long, Array[Byte], Array[Byte])],
      gzip: Boolean): Array[Byte] =
    encodeBatch(baseOffset, records, if (gzip) 1 else 0)

  def encodeBatch(baseOffset: Long,
      records: Seq[(Long, Array[Byte], Array[Byte])]): Array[Byte] =
    encodeBatch(baseOffset, records, 0)

  /** records: (timestamp, key, value) triples in their offset order;
    * codec = the protocol attribute id (0 none, 1 gzip, 2 snappy,
    * 3 lz4, 4 zstd). */
  def encodeBatch(baseOffset: Long,
      records: Seq[(Long, Array[Byte], Array[Byte])],
      codec: Int): Array[Byte] = {
    require(records.nonEmpty, "a RecordBatch holds at least one record")
    val baseTs = records.map(_._1).min
    val maxTs = records.map(_._1).max
    val recOut = new ByteArrayOutputStream()
    records.zipWithIndex.foreach { case ((ts, k, v), i) =>
      encodeRecord(recOut, ts - baseTs, i, k, v)
    }
    val recBytes = compress(codec, recOut.toByteArray)
    // attributes..end (the CRC32C coverage span)
    val tail = ByteBuffer.allocate(40 + recBytes.length)
    tail.putShort(codec.toShort) // attributes
    tail.putInt(records.length - 1) // lastOffsetDelta
    tail.putLong(baseTs)
    tail.putLong(maxTs)
    tail.putLong(-1L) // producerId
    tail.putShort(-1) // producerEpoch
    tail.putInt(-1) // baseSequence
    tail.putInt(records.length)
    tail.put(recBytes)
    val tailBytes = tail.array()
    val crc = new CRC32C()
    crc.update(tailBytes)
    val head = ByteBuffer.allocate(21 + tailBytes.length)
    head.putLong(baseOffset)
    head.putInt(9 + tailBytes.length) // batchLength: after its own field
    head.putInt(0) // partitionLeaderEpoch
    head.put(2.toByte) // magic
    head.putInt(crc.getValue.toInt) // u32 crc32c
    head.put(tailBytes)
    head.array()
  }

  // ------------------------------------------------------------------
  // decode

  /** Decodes ONE RecordBatch starting at `start`, bounded by its own
    * batchLength field (batch spans bytes start until start + 12 +
    * batchLength — the two fields before batchLength's value plus the
    * length itself), so concatenated log-segment dumps decode batch by
    * batch with per-batch CRC spans. Returns the records plus the
    * position one past this batch. */
  def decodeBatchAt(bytes: Array[Byte], start: Int)
      : (Seq[(Long, Long, Array[Byte], Array[Byte])], Int) = {
    require(bytes.length - start >= 61,
      s"truncated RecordBatch header: ${bytes.length - start} bytes at $start")
    val bb = ByteBuffer.wrap(bytes, start, bytes.length - start)
    val baseOffset = bb.getLong
    val batchLength = bb.getInt
    val batchEnd = start + 12 + batchLength
    require(batchEnd <= bytes.length,
      s"truncated RecordBatch: declared end $batchEnd > ${bytes.length}")
    bb.getInt // partitionLeaderEpoch
    val magic = bb.get
    require(magic == 2, s"unsupported RecordBatch magic $magic (want 2)")
    val storedCrc = bb.getInt
    // CRC32C covers attributes..end OF THIS BATCH only (spec: the span
    // after the crc field, bounded by batchLength)
    val tail = java.util.Arrays.copyOfRange(bytes, start + 21, batchEnd)
    val crc = new CRC32C()
    crc.update(tail)
    require(crc.getValue.toInt == storedCrc,
      f"RecordBatch CRC32C mismatch: stored 0x$storedCrc%08x " +
        f"computed 0x${crc.getValue.toInt}%08x")
    val attributes = bb.getShort
    bb.getInt // lastOffsetDelta
    val baseTs = bb.getLong
    bb.getLong // maxTimestamp
    bb.getLong; bb.getShort; bb.getInt // producer id/epoch/sequence
    val recordCount = bb.getInt
    val raw = java.util.Arrays.copyOfRange(bytes, start + 61, batchEnd)
    val recBytes = decompress(attributes & 0x7, raw)
    val r = new Reader(recBytes, 0)
    val recs = (0 until recordCount).map { _ =>
      val len = r.readVarLong().toInt
      val end = r.pos + len
      r.pos += 1 // record attributes
      val tsDelta = r.readVarLong()
      val offsetDelta = r.readVarLong()
      val keyLen = r.readVarLong().toInt
      val key = if (keyLen < 0) null else r.readBytes(keyLen)
      val valLen = r.readVarLong().toInt
      val value = if (valLen < 0) null else r.readBytes(valLen)
      r.pos = end // skip headers
      (baseOffset + offsetDelta, baseTs + tsDelta, key, value)
    }
    (recs, batchEnd)
  }

  /** Single-batch convenience (rejects trailing garbage). */
  def decodeBatch(bytes: Array[Byte])
      : Seq[(Long, Long, Array[Byte], Array[Byte])] = {
    val (recs, end) = decodeBatchAt(bytes, 0)
    require(end == bytes.length,
      s"trailing bytes after RecordBatch: $end != ${bytes.length} " +
        "(a multi-batch segment dump? use decodeSegment)")
    recs
  }

  /** Segment decode: a log-segment dump is RecordBatches back to back;
    * iterate them, each bounded and CRC-checked by its own
    * batchLength — the bulk-backfill shape the scaladoc describes. */
  def decodeSegment(bytes: Array[Byte])
      : Seq[(Long, Long, Array[Byte], Array[Byte])] = {
    val out = Seq.newBuilder[(Long, Long, Array[Byte], Array[Byte])]
    var pos = 0
    while (pos < bytes.length) {
      val (recs, next) = decodeBatchAt(bytes, pos)
      out ++= recs
      pos = next
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // Catalyst boundary expressions

  /** struct(base_offset, records) -> RecordBatch bytes. `codec` is the
    * protocol attribute id (0 none .. 4 zstd). */
  case class KafkaBatchEncode(child: Expression, codec: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "kafka_batch_encode"
    override protected def nullSafeEval(input: Any): Any = {
      val row = input.asInstanceOf[InternalRow]
      val baseOffset = row.getLong(0)
      val arr = row.getArray(1)
      val recs = (0 until arr.numElements()).map { i =>
        val rec = arr.getStruct(i, 3)
        (rec.getLong(0),
          if (rec.isNullAt(1)) null else rec.getBinary(1),
          if (rec.isNullAt(2)) null else rec.getBinary(2))
      }
      encodeBatch(baseOffset, recs, codec)
    }
    override protected def withNewChildInternal(c: Expression)
        : KafkaBatchEncode = copy(child = c)
  }

  /** RecordBatch/segment bytes -> array<struct(offset, timestamp, key,
    * value)>. Accepts one batch or a whole concatenated segment dump. */
  case class KafkaBatchDecode(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DecodedSchema
    override def prettyName: String = "kafka_batch_decode"
    override protected def nullSafeEval(input: Any): Any = {
      val rows = decodeSegment(input.asInstanceOf[Array[Byte]])
        .map { case (off, ts, k, v) =>
          new GenericInternalRow(Array[Any](off, ts, k, v))
        }
      new GenericArrayData(rows.toArray[Any])
    }
    override protected def withNewChildInternal(c: Expression)
        : KafkaBatchDecode = copy(child = c)
  }

  /** Column API: struct(base_offset: long, records: array<struct<
    * timestamp, key, value>>) -> batch bytes. */
  def kafkaEncode(c: Column, gzip: Boolean = false): Column =
    kafkaEncode(c, if (gzip) 1 else 0)

  /** Column API with an explicit protocol codec id (0 none, 1 gzip,
    * 2 snappy, 3 lz4, 4 zstd). */
  def kafkaEncode(c: Column, codec: Int): Column =
    GraftSqlBridge.columnOf(
      KafkaBatchEncode(GraftSqlBridge.expressionOf(c), codec))

  /** Column API: batch bytes -> records array. */
  def kafkaDecode(c: Column): Column =
    GraftSqlBridge.columnOf(
      KafkaBatchDecode(GraftSqlBridge.expressionOf(c)))
}
