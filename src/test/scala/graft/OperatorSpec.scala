package graft

import graft.operators.{AsOfJoin, Dedup, TopN, WindowOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class OperatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("AsOfJoin picks latest version at-or-before probe time, null before first") {
    val probes = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3")
    ).toDF("k", "t", "probe")
    val versions = Seq(
      (1L, ts("2024-01-01 09:30:00"), "v1"),
      (1L, ts("2024-01-01 11:00:00"), "v2"),
      (2L, ts("2024-01-01 09:30:00"), "v3")
    ).toDF("k", "vt", "ver")
    val got = AsOfJoin(probes, versions, "k", "t", "vt", Seq("ver"))
      .select($"probe", $"ver").as[(String, String)].collect().toSet
    assert(got == Set(("p1", "v1"), ("p2", "v2"), ("p3", null)))
  }

  test("AsOfJoin: version at exactly probe time is visible") {
    val p = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "t", "probe")
    val v = Seq((1L, ts("2024-01-01 10:00:00"), "v")).toDF("k", "vt", "ver")
    val got = AsOfJoin(p, v, "k", "t", "vt", Seq("ver"))
      .select($"ver").as[String].head()
    assert(got == "v")
  }

  test("AsOfJoin: newer version's NULL payload is not backfilled from older versions") {
    val p = Seq((1L, ts("2024-01-01 12:00:00"), "p")).toDF("k", "t", "probe")
    val v = Seq(
      (1L, ts("2024-01-01 09:00:00"), Option("v1"), Option("n1")),
      (1L, ts("2024-01-01 11:00:00"), Option("v2"), None: Option[String])
    ).toDF("k", "vt", "ver", "note")
    // version rows are atomic: the probe must see (v2, NULL), never a mix
    // like (v2, n1) where note leaked from the older version
    val got = AsOfJoin(p, v, "k", "t", "vt", Seq("ver", "note"))
      .select($"ver", $"note").as[(String, String)].head()
    assert(got == (("v2", null)))
  }

  test("TopN rank types") {
    val df = Seq((1, 30.0), (1, 30.0), (1, 20.0), (1, 10.0), (2, 5.0))
      .toDF("k", "v").withColumn("id", monotonically_increasing_id())
    val rn = TopN(df, Seq($"k"), Seq($"v".desc, $"id".asc), 2)
    assert(rn.filter($"k" === 1).count() == 2)
    val rk = TopN(df, Seq($"k"), Seq($"v".desc), 2, TopN.Rank)
    // two rows tie at rank 1, third has rank 3 -> exactly the 2 tied rows
    assert(rk.filter($"k" === 1).count() == 2)
    val dr = TopN(df, Seq($"k"), Seq($"v".desc), 2, TopN.DenseRank)
    // dense_rank: 30,30 -> 1; 20 -> 2 => three rows
    assert(dr.filter($"k" === 1).count() == 3)
  }

  test("TopN.variable: per-key N from a column") {
    val df = Seq((1, 30.0, 1), (1, 20.0, 1), (2, 9.0, 2), (2, 8.0, 2), (2, 7.0, 2))
      .toDF("k", "v", "quota")
    val got = TopN.variable(df, Seq($"k"), Seq($"v".desc), $"quota")
      .select($"k", $"v").as[(Int, Double)].collect().toSet
    assert(got == Set((1, 30.0), (2, 9.0), (2, 8.0)))
  }

  test("Dedup keepFirst/keepLast") {
    val df = Seq((1, 1L, "a"), (1, 2L, "b"), (2, 5L, "c"))
      .toDF("k", "seq", "v")
    assert(Dedup.keepFirst(df, Seq($"k"), Seq($"seq"))
      .select($"v").as[String].collect().toSet == Set("a", "c"))
    assert(Dedup.keepLast(df, Seq($"k"), Seq($"seq"))
      .select($"v").as[String].collect().toSet == Set("b", "c"))
  }

  test("cumulate assigns a row to every unfinished slice of its hour") {
    val df = Seq((ts("2024-01-01 10:20:00"), 1.0)).toDF("t", "v")
    val got = WindowOps.cumulate(df, $"t", 900L, 3600L)
      .select($"window_end".cast("string")).as[String].collect().toSet
    // ts=10:20 -> slices ending 10:30, 10:45, 11:00 (not 10:15, already closed)
    assert(got == Set("2024-01-01 10:30:00", "2024-01-01 10:45:00",
      "2024-01-01 11:00:00"))
  }

  test("AvroFormat round-trips nulls, binary, and every primitive type") {
    import graft.sources.AvroFormat
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_rt").toString
    val src = Seq(
      (1, Option(2L), Option(1.5), Option("x"), Option(true),
        Option(Array[Byte](1, 2, 3))),
      (2, Option.empty[Long], Option.empty[Double], Option.empty[String],
        Option.empty[Boolean], Option.empty[Array[Byte]]))
      .toDF("i", "l", "d", "s", "b", "bin")
    AvroFormat.write(src, dir)
    val back = AvroFormat.read(spark, dir, src.schema)
    val got = back.select($"i", $"l", $"d", $"s", $"b",
        base64($"bin").as("bin64"))
      .as[(Int, Option[Long], Option[Double], Option[String],
        Option[Boolean], Option[String])].collect().toSet
    assert(got == Set(
      (1, Some(2L), Some(1.5), Some("x"), Some(true), Some("AQID")),
      (2, None, None, None, None, None)))
  }

  test("AvroFormat round-trips nested records, arrays, maps, decimal, " +
      "timestamp and date (incl. null composites)") {
    import graft.sources.AvroFormat
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_nest").toString
    val src = Seq((1L, "s1", 5), (2L, "s2", 7)).toDF("id", "name", "qty")
      .select($"id",
        when($"id" === 1L,
          struct($"name", $"qty", struct($"name".as("inner_n")).as("deep")))
          .as("meta"), // null struct for id=2
        when($"id" === 1L, array($"qty", $"qty" + 1)).as("arr"),
        map($"name", $"qty".cast("double")).as("m"),
        ($"qty" * lit(1.5)).cast("decimal(10,2)").as("dec"),
        lit(java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456")).as("ts"),
        lit(java.sql.Date.valueOf("2024-03-04")).as("dt"))
    AvroFormat.write(src, dir)
    val back = AvroFormat.read(spark, dir, src.schema)
    assert(back.schema == src.schema)
    assert(back.collect().toSet == src.collect().toSet)
    // micros precision survived (no ms truncation through the bridge)
    assert(back.select(date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].collect().toSet == Set("2024-01-02 03:04:05.123456"))
  }

  test("AvroFormat schema resolution on a NESTED record: added-default " +
      "nested field filled, dropped nested field skipped") {
    import graft.sources.AvroFormat
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_nev").toString
    val src = Seq((1, "x", 10), (2, "y", 20)).toDF("k", "a", "b")
      .select($"k", struct($"a", $"b").as("meta"))
    AvroFormat.write(src, dir)
    // reader: inside the nested record, drop `a`, keep `b`, add `c`
    // with a default — record names must match the writer's
    // path-derived names (row / row_meta) for Avro resolution
    val readerJson =
      """{"type": "record", "name": "row", "fields": [
           {"name": "k", "type": "int"},
           {"name": "meta", "type": ["null",
             {"type": "record", "name": "row_meta", "fields": [
               {"name": "b", "type": ["null", "int"]},
               {"name": "c", "type": "long", "default": 9}]}]}]}"""
    val readerSpark = new StructType()
      .add("k", IntegerType, nullable = false)
      .add("meta", new StructType()
        .add("b", IntegerType).add("c", LongType, nullable = false))
    val back = AvroFormat.readEvolved(spark, dir, readerSpark, readerJson)
    assert(back.select($"k", $"meta.b", $"meta.c")
      .as[(Int, Int, Long)].collect().toSet ==
      Set((1, 10, 9L), (2, 20, 9L)))
  }

  test("AvroFormat schema resolution: added-default field filled, " +
      "dropped field skipped, match by name not position") {
    import graft.sources.AvroFormat
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_ev").toString
    val src = Seq((1, "a", 10L), (2, "b", 20L)).toDF("k", "name", "extra")
    AvroFormat.write(src, dir)
    // reader schema: drops `extra`, REORDERS the survivors, and adds
    // `score` with a default — classic consumer-side evolution
    val readerJson =
      """{"type": "record", "name": "row", "fields": [
           {"name": "name", "type": ["null", "string"]},
           {"name": "k", "type": "int"},
           {"name": "score", "type": "long", "default": 7}]}"""
    val readerSpark = new StructType()
      .add("name", StringType).add("k", IntegerType, nullable = false)
      .add("score", LongType, nullable = false)
    val back = AvroFormat.readEvolved(spark, dir, readerSpark, readerJson)
    assert(back.as[(String, Int, Long)].collect().toSet ==
      Set(("a", 1, 7L), ("b", 2, 7L)))
  }

  test("AvroFormat roundtrips ENUM, FIXED and multi-branch UNION through " +
      "writeWithSchema/readAny (the remaining AvroSchemaConverter mappings)") {
    import graft.sources.AvroFormat
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_efu").toString
    val src = Seq(
      (1L, "RED", Array[Byte](0, 0, 0, 1), Option(10L), Option.empty[String]),
      (2L, "BLUE", Array[Byte](0, 0, 0, 2), Option.empty[Long], Option("hi")))
      .toDF("id", "color", "fx", "member0", "member1")
      .select($"id", $"color", $"fx",
        struct($"member0", $"member1").as("u"))
    val schemaJson =
      """{"type": "record", "name": "row", "fields": [
           {"name": "id", "type": "long"},
           {"name": "color", "type":
             {"type": "enum", "name": "c", "symbols": ["RED", "BLUE"]}},
           {"name": "fx", "type": {"type": "fixed", "name": "f4", "size": 4}},
           {"name": "u", "type": ["null", "long", "string"]}]}"""
    AvroFormat.writeWithSchema(src, dir, schemaJson)
    val back = AvroFormat.readAny(spark, dir)
    // readAny derives the Spark schema FROM the writer schema
    assert(back.schema("color").dataType == StringType)
    assert(back.schema("fx").dataType == BinaryType)
    assert(back.schema("u").dataType == new StructType()
      .add("member0", LongType).add("member1", StringType))
    val got = back.select($"id", $"color", hex($"fx").as("fxh"),
        $"u.member0", $"u.member1")
      .as[(Long, String, String, Option[Long], Option[String])]
      .collect().toSet
    assert(got == Set(
      (1L, "RED", "00000001", Some(10L), None),
      (2L, "BLUE", "00000002", None, Some("hi"))))
  }

  test("AvroFormat union with a RECORD branch resolves by field-name set") {
    import graft.sources.AvroFormat
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_urec").toString
    val src = Seq(
      (1L, Option(5L), Option.empty[(String, Int)]),
      (2L, Option.empty[Long], Option(("x", 9))))
      .toDF("id", "member0", "m1")
      .select($"id", struct($"member0",
        when($"m1".isNotNull,
          struct($"m1._1".as("tag"), $"m1._2".as("n"))).as("member1")).as("u"))
    val schemaJson =
      """{"type": "record", "name": "row", "fields": [
           {"name": "id", "type": "long"},
           {"name": "u", "type": ["null", "long",
             {"type": "record", "name": "inner", "fields": [
               {"name": "tag", "type": ["null", "string"]},
               {"name": "n", "type": "int"}]}]}]}"""
    AvroFormat.writeWithSchema(src, dir, schemaJson)
    val back = AvroFormat.readAny(spark, dir)
    val got = back.select($"id", $"u.member0",
        $"u.member1.tag", $"u.member1.n")
      .as[(Long, Option[Long], Option[String], Option[Int])].collect().toSet
    assert(got == Set((1L, Some(5L), None, None), (2L, None, Some("x"), Some(9))))
  }

  test("AvroFormat rejects a union whose branches are indistinguishable " +
      "under the runtime-type mapping (two records, same field names)") {
    import graft.sources.AvroFormat
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_amb").toString
    val src = Seq((1L, Option(Tuple1(7)), Option.empty[Tuple1[Int]]))
      .toDF("id", "m0", "m1")
      .select($"id", struct(
        when($"m0".isNotNull, struct($"m0._1".as("v"))).as("member0"),
        when($"m1".isNotNull, struct($"m1._1".as("v"))).as("member1"))
        .as("u"))
    // Two differently-NAMED records with the SAME field-name set both
    // arrive as a GenericRecord with fields {v} once the writer has
    // erased the union — decode must fail loudly, not silently pick
    // the first branch.
    val schemaJson =
      """{"type": "record", "name": "row", "fields": [
           {"name": "id", "type": "long"},
           {"name": "u", "type": ["null",
             {"type": "record", "name": "a", "fields": [
               {"name": "v", "type": "int"}]},
             {"type": "record", "name": "b", "fields": [
               {"name": "v", "type": "int"}]}]}]}"""
    AvroFormat.writeWithSchema(src, dir, schemaJson)
    val e = intercept[Throwable] {
      AvroFormat.readAny(spark, dir).collect()
    }
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(messages.contains("ambiguous union"),
      s"expected an 'ambiguous union' failure, got: $messages")
  }

  test("AvroFormat readAny rejects a directory with mixed writer schemas") {
    import graft.sources.AvroFormat
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_mix").toString
    val s1 = """{"type": "record", "name": "row", "fields": [
                 {"name": "id", "type": "long"}]}"""
    val s2 = """{"type": "record", "name": "row", "fields": [
                 {"name": "id", "type": "long"},
                 {"name": "x", "type": "string"}]}"""
    AvroFormat.writeWithSchema(
      Seq(Tuple1(1L)).toDF("id"), dir + "/a", s1)
    AvroFormat.writeWithSchema(
      Seq((2L, "y")).toDF("id", "x"), dir + "/b", s2)
    // flatten both directories' container files into one
    val flat = java.nio.file.Files.createTempDirectory("graft_avro_flat")
    var i = 0
    for (sub <- Seq("a", "b");
         f <- new java.io.File(s"$dir/$sub").listFiles()
           if f.getName.endsWith(".avro")) {
      java.nio.file.Files.copy(f.toPath, flat.resolve(s"part$i.avro"))
      i += 1
    }
    val e = intercept[IllegalArgumentException] {
      AvroFormat.readAny(spark, flat.toString)
    }
    assert(e.getMessage.contains("one writer schema per directory"))
  }

  test("AvroFormat reader-schema evolution over an ENUM: added symbol " +
      "resolves, values read as strings") {
    import graft.sources.AvroFormat
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_enev").toString
    val src = Seq((1L, "O"), (2L, "F")).toDF("id", "st")
    val writerJson =
      """{"type": "record", "name": "row", "fields": [
           {"name": "id", "type": "long"},
           {"name": "st", "type":
             {"type": "enum", "name": "status", "symbols": ["O", "F"]}}]}"""
    AvroFormat.writeWithSchema(src, dir, writerJson)
    // reader adds a symbol (forward-compatible enum evolution)
    val readerJson =
      """{"type": "record", "name": "row", "fields": [
           {"name": "id", "type": "long"},
           {"name": "st", "type":
             {"type": "enum", "name": "status", "symbols": ["O", "F", "P"]}}]}"""
    val readerSpark = new StructType()
      .add("id", LongType, nullable = false)
      .add("st", StringType, nullable = false)
    val back = AvroFormat.readEvolved(spark, dir, readerSpark, readerJson)
    assert(back.as[(Long, String)].collect().toSet ==
      Set((1L, "O"), (2L, "F")))
  }

  test("AvroFormat narrows Avro int back to Short/Byte columns on read") {
    import graft.sources.AvroFormat
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_sb").toString
    // Short/Byte widen to Avro int on write; read must narrow them back
    // or createDataFrame rejects Integer values under Short/ByteType
    val src = Seq((1.toShort, 2.toByte, Option(3.toShort)),
        (4.toShort, 5.toByte, Option.empty[Short]))
      .toDF("s", "b", "so")
    AvroFormat.write(src, dir)
    val back = AvroFormat.read(spark, dir, src.schema)
    assert(back.schema == src.schema)
    assert(back.as[(Short, Byte, Option[Short])].collect().toSet ==
      Set((1.toShort, 2.toByte, Some(3.toShort)),
        (4.toShort, 5.toByte, None)))
  }
}
