package graft

import graft.sources.KafkaSegmentFormat._
import org.scalatest.funsuite.AnyFunSuite

/** KafkaSegmentFormat wire-level properties that the oracle roundtrip
  * (q_kafka_segments) cannot see: exact header layout against the
  * public spec, CRC tamper detection, null key/value, and plain-vs-
  * gzip equivalence. Layout reference: kafka.apache.org/protocol
  * "Record Batch" (magic=2) — the same bytes Kafka writes to log
  * segments on disk.
  */
class KafkaSegmentSpec extends AnyFunSuite {

  private def b(s: String) = s.getBytes("UTF-8")

  test("batch header lays out per the spec: magic=2, big-endian " +
      "fields, batchLength covers epoch..end") {
    val bytes = encodeBatch(7L, Seq((1000L, b("k1"), b("v1")),
      (1003L, null, b("v2"))))
    val bb = java.nio.ByteBuffer.wrap(bytes)
    assert(bb.getLong == 7L) // baseOffset
    val batchLength = bb.getInt
    assert(batchLength == bytes.length - 12,
      "batchLength counts every byte after its own field")
    assert(bb.getInt == 0) // partitionLeaderEpoch
    assert(bb.get == 2.toByte) // magic
    bb.getInt // crc (checked by decode below)
    assert(bb.getShort == 0) // attributes: no compression
    assert(bb.getInt == 1) // lastOffsetDelta (2 records)
    assert(bb.getLong == 1000L) // baseTimestamp = min ts
    assert(bb.getLong == 1003L) // maxTimestamp
    assert(bb.getLong == -1L) // producerId
    assert(bb.getShort == -1) // producerEpoch
    assert(bb.getInt == -1) // baseSequence
    assert(bb.getInt == 2) // recordCount
  }

  test("roundtrip preserves offsets, timestamps, null key and null " +
      "value — plain and gzip alike") {
    val recs = Seq(
      (5000L, b("key-a"), b("value-a")),
      (5010L, null.asInstanceOf[Array[Byte]], b("value-b")),
      (5005L, b("key-c"), null.asInstanceOf[Array[Byte]]))
    for (gz <- Seq(false, true)) {
      val out = decodeBatch(encodeBatch(100L, recs, gzip = gz))
      assert(out.map(_._1) == Seq(100L, 101L, 102L), s"offsets gz=$gz")
      assert(out.map(_._2) == Seq(5000L, 5010L, 5005L), s"ts gz=$gz")
      assert(out(1)._3 == null && out(2)._4 == null, s"nulls gz=$gz")
      assert(new String(out(0)._3, "UTF-8") == "key-a")
      assert(new String(out(1)._4, "UTF-8") == "value-b")
    }
  }

  test("gzip attribute bit is set and the records section really is " +
      "compressed") {
    val big = ("x" * 2000).getBytes("UTF-8")
    val plain = encodeBatch(0L, Seq((1L, b("k"), big)))
    val gz = encodeBatch(0L, Seq((1L, b("k"), big)), gzip = true)
    assert((java.nio.ByteBuffer.wrap(plain).getShort(21) & 0x7) == 0)
    assert((java.nio.ByteBuffer.wrap(gz).getShort(21) & 0x7) == 1)
    assert(gz.length < plain.length / 2,
      "a 2000-byte run must compress well below half")
    assert(decodeBatch(gz).head._4.length == 2000)
  }

  test("snappy/lz4/zstd batches roundtrip AND carry the real wire " +
      "containers (xerial framing, LZ4 Frame magic, zstd magic)") {
    // r13: the codec libraries were on Spark's own classpath all along
    // (snappy-java / lz4-java / zstd-jni, shipped for shuffle/parquet
    // compression) — closing the residual VERDICT r12 recorded as
    // env-blocked. The magic-byte assertions pin that the compressed
    // records section is the PUBLIC wire format of each codec (what a
    // broker-written segment contains), not an arbitrary container.
    val big = ("kafka codec " * 200).getBytes("UTF-8")
    val recs = Seq((1L, b("k"), big),
      (2L, null.asInstanceOf[Array[Byte]], b("v2")))
    for ((codec, name) <- Seq(2 -> "snappy", 3 -> "lz4", 4 -> "zstd")) {
      val bytes = encodeBatch(0L, recs, codec)
      assert((java.nio.ByteBuffer.wrap(bytes).getShort(21) & 0x7) == codec,
        s"$name attribute bits")
      // the compressed records section begins at byte 61
      val c0 = bytes.slice(61, 61 + 8)
      codec match {
        case 2 => // xerial snappy stream header: 0x82 "SNAPPY" 0x00
          assert(c0(0) == 0x82.toByte &&
            new String(c0.slice(1, 7), "UTF-8") == "SNAPPY", "snappy magic")
        case 3 => // LZ4 Frame magic 0x184D2204 (little-endian)
          assert(java.nio.ByteBuffer.wrap(c0)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt == 0x184D2204,
            "lz4 frame magic")
        case 4 => // zstd frame magic 0xFD2FB528 (little-endian)
          assert(java.nio.ByteBuffer.wrap(c0)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt == 0xFD2FB528,
            "zstd frame magic")
      }
      val out = decodeBatch(bytes)
      assert(out.map(_._1) == Seq(0L, 1L), s"$name offsets")
      assert(out.head._4.length == big.length &&
        new String(out.head._4, "UTF-8").startsWith("kafka codec"),
        s"$name payload")
      assert(out(1)._3 == null, s"$name null key")
      assert(bytes.length < 61 + big.length,
        s"$name did not actually compress")
    }
    // a mixed-codec segment dump decodes batch by batch
    val seg = encodeBatch(0L, recs, 2) ++ encodeBatch(2L, recs, 3) ++
      encodeBatch(4L, recs, 4) ++ encodeBatch(6L, recs, 1)
    assert(decodeSegment(seg).map(_._1) ==
      Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("a flipped payload byte fails CRC32C validation loudly") {
    val bytes = encodeBatch(0L, Seq((1L, b("k"), b("hello"))))
    bytes(bytes.length - 3) = (bytes(bytes.length - 3) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](decodeBatch(bytes))
    assert(e.getMessage.contains("CRC32C mismatch"))
  }

  test("a codec id OUTSIDE the protocol's 0..4 range is named in the " +
      "error (all five defined codecs decode since r13)") {
    val bytes = encodeBatch(0L, Seq((1L, b("k"), b("v"))))
    // set attributes codec bits to 5 (undefined) and re-seal the CRC
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putShort(21, 5.toShort)
    val tail = java.util.Arrays.copyOfRange(bytes, 21, bytes.length)
    val crc = new java.util.zip.CRC32C(); crc.update(tail)
    bb.putInt(17, crc.getValue.toInt)
    val e = intercept[IllegalArgumentException](decodeBatch(bytes))
    assert(e.getMessage.contains("5"))
  }

  test("a concatenated log-segment dump decodes batch by batch, each " +
      "bounded and CRC-checked by its own batchLength") {
    // real segment files are RecordBatches back to back; decode must
    // bound each batch at 12 + batchLength (a whole-array CRC span
    // would spuriously fail on anything after the first batch)
    val b1 = encodeBatch(0L, Seq((1L, b("k0"), b("v0")),
      (2L, b("k1"), b("v1"))))
    val b2 = encodeBatch(2L, Seq((9L, null, b("v2"))), gzip = true)
    val b3 = encodeBatch(3L, Seq((5L, b("k3"), null)))
    val seg = b1 ++ b2 ++ b3
    val out = decodeSegment(seg)
    assert(out.map(_._1) == Seq(0L, 1L, 2L, 3L), "offsets across batches")
    assert(out.map(_._2) == Seq(1L, 2L, 9L, 5L))
    assert(new String(out(2)._4, "UTF-8") == "v2" && out(2)._3 == null)
    // single-batch decode rejects the multi-batch blob loudly
    val e = intercept[IllegalArgumentException](decodeBatch(seg))
    assert(e.getMessage.contains("decodeSegment"))
    // a flipped byte in the MIDDLE batch names a CRC failure (its own
    // span), while the first batch still decodes
    val tampered = seg.clone()
    tampered(b1.length + b2.length - 2) =
      (tampered(b1.length + b2.length - 2) ^ 0x01).toByte
    assert(decodeBatchAt(tampered, 0)._1.size == 2)
    val e2 = intercept[IllegalArgumentException](decodeSegment(tampered))
    assert(e2.getMessage.contains("CRC32C mismatch"))
    // truncated tail fails loudly, not silently
    val e3 = intercept[IllegalArgumentException](
      decodeSegment(seg.dropRight(1)))
    assert(e3.getMessage.toLowerCase.contains("truncated"))
  }

  test("streaming segment ingestion: batches replayed through the file " +
      "source across a restart equal the batch decode") {
    // the broker-less backfill story end-to-end: RecordBatch blobs
    // arrive as files, the stream decodes + explodes them, exactly-once
    // offsets carry across a restart — the role KafkaSource's reader
    // plays, served by the file source plus this codec
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val inDir =
      java.nio.file.Files.createTempDirectory("graft_kseg_in").toString
    val ckpt =
      java.nio.file.Files.createTempDirectory("graft_kseg_ck").toString
    val outDir =
      java.nio.file.Files.createTempDirectory("graft_kseg_out").toString
    def segment(baseOffset: Long, n: Int) = encodeBatch(baseOffset,
      (0 until n).map(i => (baseOffset * 10 + i,
        b(s"k${baseOffset + i}"), b(s"v${baseOffset + i}"))),
      gzip = baseOffset % 2 == 0)
    def feed(offsets: Seq[Long]): Unit =
      offsets.map(o => Tuple1(segment(o, 5))).toDF("bin")
        .coalesce(1).write.mode("append").parquet(inDir)
    feed(Seq(0L, 100L))
    val schema = spark.read.parquet(inDir).schema
    def hop(): Unit = {
      val q = spark.readStream.schema(schema).parquet(inDir)
        .select(explode(graft.sources.KafkaSegmentFormat
          .kafkaDecode($"bin")).as("r"))
        .select($"r.offset", $"r.timestamp",
          decode($"r.key", "UTF-8").as("k"),
          decode($"r.value", "UTF-8").as("v"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    hop()
    feed(Seq(200L, 301L)) // arrives while the query is down
    hop() // restart: only the new files replay (offsets in checkpoint)
    val streamed = spark.read.parquet(outDir)
      .as[(Long, Long, String, String)].collect().sorted.toSeq
    val expected = Seq(0L, 100L, 200L, 301L).flatMap(o =>
      decodeBatch(segment(o, 5))).map { case (off, ts, k, v) =>
        (off, ts, new String(k, "UTF-8"), new String(v, "UTF-8"))
      }.sorted
    assert(streamed == expected,
      s"streamed ${streamed.size} rows != expected ${expected.size}")
  }
}
