package graft

import graft.sources.ProtoFormat
import graft.sources.ProtoFormat._
import graft.sources.ProtoFormat.PType._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Protobuf wire-format codec (sources/ProtoFormat.scala; reference
  * flink-formats/flink-protobuf). Golden byte patterns come straight
  * from the public encoding spec
  * (developers.google.com/protocol-buffers/docs/encoding).
  */
class ProtoFormatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def hex(b: Array[Byte]): String =
    java.util.HexFormat.of().formatHex(b)

  private val scalarSchema = PSchema(Seq(
    PField(1, "a", PInt64),
    PField(2, "s", PString),
    PField(3, "z", PSInt64),
    PField(4, "d", PDouble),
    PField(5, "f", PFloat),
    PField(6, "b", PBool),
    PField(7, "raw", PBytes)))

  test("golden bytes: the spec's own examples") {
    val sp = spark
    import sp.implicits._
    // spec example 1: message with int field 1 = 150 -> 08 96 01
    val one = PSchema(Seq(PField(1, "a", PInt64)))
    val r1 = Seq(Tuple1(150L)).toDF("a")
      .select(protoEncode(struct($"a"), one).as("bin"))
      .head.getAs[Array[Byte]]("bin")
    assert(hex(r1) == "089601")
    // spec example 2: string field 2 = "testing" -> 12 07 "testing"
    val two = PSchema(Seq(PField(2, "b", PString)))
    val r2 = Seq(Tuple1("testing")).toDF("b")
      .select(protoEncode(struct($"b"), two).as("bin"))
      .head.getAs[Array[Byte]]("bin")
    assert(hex(r2) == "120774657374696e67")
    // zigzag: sint 1 -> 2, -1 -> 1, -2 -> 3 (spec table)
    val zz = PSchema(Seq(PField(1, "z", PSInt64)))
    def zenc(v: Long) = hex(Seq(Tuple1(v)).toDF("z")
      .select(protoEncode(struct($"z"), zz).as("bin"))
      .head.getAs[Array[Byte]]("bin"))
    assert(zenc(1L) == "0802")
    assert(zenc(-1L) == "0801")
    assert(zenc(-2L) == "0803")
  }

  test("scalar roundtrip incl. negatives, empty string, unicode, nulls") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "hello", -42L, 1.5, 2.5f, true, Array[Byte](1, 2, 3)),
      (Long.MaxValue, "", Long.MinValue, -0.0, Float.NaN, false,
        Array.empty[Byte]),
      (-7L, "héllo ∆", 0L, Double.PositiveInfinity, -1e-30f, true,
        Array[Byte](0))).toDF("a", "s", "z", "d", "f", "b", "raw")
    val back = df
      .select(protoEncode(
        struct($"a", $"s", $"z", $"d", $"f", $"b", $"raw"),
        scalarSchema).as("bin"))
      .select(protoDecode($"bin", scalarSchema).as("m"))
      .select($"m.*")
    val rows = back.collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "hello" &&
      rows(0).getLong(2) == -42L && rows(0).getBoolean(5))
    assert(rows(1).getLong(0) == Long.MaxValue &&
      rows(1).getString(1) == "" && rows(1).getLong(2) == Long.MinValue)
    assert(java.lang.Float.isNaN(rows(1).getFloat(4)))
    assert(rows(2).getString(1) == "héllo ∆" &&
      rows(2).getDouble(3).isPosInfinity)
    // null column -> omitted on the wire -> NULL after decode
    val withNull = Seq(Tuple1(Option.empty[String])).toDF("s")
      .select(protoEncode(struct(lit(9L).as("a"), $"s"),
        PSchema(Seq(PField(1, "a", PInt64), PField(2, "s", PString))))
        .as("bin"))
      .select(protoDecode($"bin",
        PSchema(Seq(PField(1, "a", PInt64), PField(2, "s", PString))))
        .as("m"))
      .select($"m.*").head
    assert(withNull.getLong(0) == 9L && withNull.isNullAt(1))
  }

  test("repeated: packed numerics, per-element strings, nested messages") {
    val sp = spark
    import sp.implicits._
    val nested = PSchema(Seq(
      PField(1, "k", PString), PField(2, "v", PInt64)))
    val schema = PSchema(Seq(
      PField(1, "ids", PInt64, repeated = true),
      PField(2, "tags", PString, repeated = true),
      PField(3, "kvs", PMsg(nested), repeated = true)))
    val df = sp.sql(
      """SELECT array(1L, 2L, 300L) AS ids, array('x', 'y') AS tags,
           array(named_struct('k', 'a', 'v', 1L),
                 named_struct('k', 'b', 'v', 2L)) AS kvs""")
    val enc = df.select(
      protoEncode(struct($"ids", $"tags", $"kvs"), schema).as("bin"))
    val binHex = hex(enc.head.getAs[Array[Byte]]("bin"))
    // packed ids: tag 0a, len 4, varints 01 02 ac 02
    assert(binHex.startsWith("0a0401 02ac02".replace(" ", "")))
    val back = enc.select(protoDecode($"bin", schema).as("m")).select($"m.*")
    val r = back.head
    assert(r.getSeq[Long](0) == Seq(1L, 2L, 300L))
    assert(r.getSeq[String](1) == Seq("x", "y"))
    val kvs = r.getSeq[org.apache.spark.sql.Row](2)
    assert(kvs.map(x => (x.getString(0), x.getLong(1))) ==
      Seq(("a", 1L), ("b", 2L)))
  }

  test("decode accepts UNPACKED repeated numerics (proto2 interop)") {
    val schema = PSchema(Seq(PField(1, "ids", PInt64, repeated = true)))
    // hand-built unpacked wire: (tag 08, 1)(08, 2)(08, 300)
    val wire = Array[Byte](0x08, 0x01, 0x08, 0x02, 0x08, 0xac.toByte, 0x02)
    val row = ProtoFormat.decodeRow(wire, schema)
    assert(row.getArray(0).toLongArray.toSeq == Seq(1L, 2L, 300L))
  }

  test("unknown fields are skipped by wire type; duplicates last-win") {
    val full = PSchema(Seq(
      PField(1, "a", PInt64), PField(2, "s", PString),
      PField(3, "d", PDouble), PField(4, "f", PFloat)))
    val sp = spark
    import sp.implicits._
    val bin = Seq((5L, "keep", 1.25, 9.5f)).toDF("a", "s", "d", "f")
      .select(protoEncode(struct($"a", $"s", $"d", $"f"), full).as("bin"))
      .head.getAs[Array[Byte]]("bin")
    // decode with a subset schema: fields 1/3/4 become unknown varint /
    // fixed64 / fixed32 and must be skipped cleanly
    val subset = PSchema(Seq(PField(2, "s", PString)))
    val r = ProtoFormat.decodeRow(bin, subset)
    assert(r.getUTF8String(0).toString == "keep")
    // duplicated non-repeated field: last value wins
    val dup = Array[Byte](0x08, 0x01, 0x08, 0x7f)
    val rd = ProtoFormat.decodeRow(dup, PSchema(Seq(PField(1, "a", PInt64))))
    assert(rd.getLong(0) == 127L)
  }

  test("streaming decode: proto payloads through a windowed aggregation " +
      "(the Kafka value-deserializer shape)") {
    val sp = spark
    import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // message: 1 user sint64, 2 amount_cents int64 — encoded in BATCH,
    // decoded inside the STREAM, exactly how a Kafka `value` would be
    val msg = PSchema(Seq(
      PField(1, "user", PSInt64), PField(2, "amount_cents", PInt64)))
    val payloads = Seq((1L, 250L), (1L, 750L), (2L, 100L), (-3L, 40L))
      .toDF("user", "amount_cents")
      .select(protoEncode(struct($"user", $"amount_cents"), msg).as("value"))
      .collect().map(_.getAs[Array[Byte]]("value"))
    val in = MemoryStream[Array[Byte]]
    val decoded = in.toDF().select(protoDecode($"value", msg).as("m"))
      .groupBy($"m.user".as("user"))
      .agg(sum($"m.amount_cents").as("cents"))
    val q = decoded.writeStream.format("memory").queryName("proto_stream")
      .outputMode("complete").start()
    in.addData(payloads.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val got = sp.table("proto_stream").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1000L), (2L, 100L), (-3L, 40L)))
  }

  test("differential roundtrip: 10 random schemas (random field " +
      "numbers/types/repeated flags, one nested message) x 15 random " +
      "rows — decode(encode(row)) == row") {
    val sp = spark
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def genType(rnd: scala.util.Random, allowMsg: Boolean): PType =
      rnd.nextInt(if (allowMsg) 9 else 8) match {
        case 0 => PInt64
        case 1 => PInt32
        case 2 => PSInt64
        case 3 => PBool
        case 4 => PDouble
        case 5 => PFloat
        case 6 => PString
        case 7 => PBytes
        case _ => PMsg(genSchema(rnd, allowMsg = false))
      }
    def genSchema(rnd: scala.util.Random, allowMsg: Boolean): PSchema = {
      val n = 2 + rnd.nextInt(4)
      // non-contiguous shuffled field numbers incl. multi-byte tags
      val nos = rnd.shuffle((1 to 40).toVector).take(n)
      PSchema(nos.zipWithIndex.map { case (no, i) =>
        PField(no, s"f${no}", genType(rnd, allowMsg),
          repeated = rnd.nextInt(100) < 30)
      })
    }
    def genValue(rnd: scala.util.Random, t: PType): Any = t match {
      case PInt64 => rnd.nextLong()
      case PInt32 => rnd.nextInt()
      case PSInt64 => rnd.nextLong()
      case PBool => rnd.nextBoolean()
      case PDouble => rnd.nextLong().toDouble / 7.0 // no NaN
      case PFloat => rnd.nextInt().toFloat / 3.0f
      case PString =>
        val alphabet = "aZ9 é✓ß" // ascii + accented + multibyte
        (0 until rnd.nextInt(12)).map(_ =>
          alphabet(rnd.nextInt(alphabet.length))).mkString
      case PBytes =>
        val b = new Array[Byte](rnd.nextInt(10)); rnd.nextBytes(b); b
      case PMsg(s) => Row(s.fields.map(f => genField(rnd, f)): _*)
    }
    // repeated fields carry >= 1 element: an EMPTY repeated list
    // encodes to nothing on the wire and decodes as null (the codec's
    // documented absence-is-null presence rule, covered by the
    // dedicated null/absence tests) — the pure roundtrip property
    // needs present fields
    def genField(rnd: scala.util.Random, f: PField): Any =
      if (f.repeated)
        (0 to rnd.nextInt(3)).map(_ => genValue(rnd, f.tpe))
      else genValue(rnd, f.tpe)
    // Array[Byte]/Row/Seq/Array need canonical forms for equality.
    // NB: match scala.collection.Seq, not the default immutable.Seq
    // alias — Spark collects ArrayType as mutable.ArraySeq
    def canon(v: Any): Any = v match {
      case b: Array[Byte] => java.util.HexFormat.of().formatHex(b)
      case r: Row => r.toSeq.map(canon).toVector
      case s: scala.collection.Seq[_] => s.map(canon).toVector
      case a: Array[_] => a.toVector.map(canon)
      case other => other
    }
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val schema = genSchema(rnd, allowMsg = true)
      val rows = (1 to 15).map(_ =>
        Row(schema.fields.map(f => genField(rnd, f)): _*))
      val df = sp.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), sparkType(schema))
      val cols = schema.fields.map(f => org.apache.spark.sql.functions
        .col(f.name))
      val back = df
        .select(protoDecode(protoEncode(struct(cols: _*), schema),
          schema).as("m"))
        .select(org.apache.spark.sql.functions.col("m.*"))
        .collect().toSeq.map(r => canon(r))
      val orig = rows.map(r => canon(r))
      assert(back.sortBy(_.toString) == orig.sortBy(_.toString),
        s"seed=$seed schema=$schema\n" +
        s"diff=${back.sortBy(_.toString).zip(orig.sortBy(_.toString))
          .find(p => p._1 != p._2)}")
    }
  }

  test("groups (wire type 3) are rejected, not silently misread") {
    val wire = Array[Byte](0x0b) // field 1, wire type 3
    val e = intercept[IllegalArgumentException] {
      ProtoFormat.decodeRow(wire, PSchema(Seq(PField(2, "s", PString))))
    }
    assert(e.getMessage.contains("wire type 3"))
  }
}
