package graft

import graft.sources.DebeziumJson
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the debezium envelope decode (op -> changelog kind expansion,
  * reference DebeziumJsonDeserializationSchema.java semantics) and the
  * keep-last materialization, including out-of-order arrival and the
  * -U/+U same-timestamp tiebreak. */
class DebeziumJsonSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val payload = new StructType()
    .add("id", LongType).add("v", StringType)

  private def lines(ls: String*) = ls.toDF("value")

  test("op c/r/u/d expand to +I / +I / (-U,+U) / -D") {
    val decoded = DebeziumJson.decode(lines(
      """{"after":{"id":1,"v":"a"},"op":"c","ts_ms":1}""",
      """{"after":{"id":2,"v":"b"},"op":"r","ts_ms":1}""",
      """{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"a2"},"op":"u","ts_ms":2}""",
      """{"before":{"id":2,"v":"b"},"op":"d","ts_ms":3}""",
      """{"before":{"id":9,"v":"x"},"op":"??","ts_ms":4}"""), payload)
    val kinds = decoded.select($"kind", $"id", $"v")
      .as[(String, Long, String)].collect().toSet
    assert(kinds == Set(
      ("+I", 1L, "a"), ("+I", 2L, "b"),
      ("-U", 1L, "a"), ("+U", 1L, "a2"),
      ("-D", 2L, "b")), kinds.toString) // unknown op dropped
  }

  test("decode rides a streaming source unchanged " +
      "(the Kafka value-deserializer shape)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[String]
    val q = DebeziumJson.decode(in.toDF(), payload)
      .writeStream.format("memory").queryName("dbz_stream")
      .outputMode("append").start()
    in.addData(
      """{"after":{"id":1,"v":"a"},"op":"c","ts_ms":1}""",
      """{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"b"},"op":"u","ts_ms":2}""")
    q.processAllAvailable(); q.stop()
    val got = spark.table("dbz_stream").select($"kind", $"id", $"v")
      .as[(String, Long, String)].collect().toSet
    assert(got == Set(("+I", 1L, "a"), ("-U", 1L, "a"), ("+U", 1L, "b")),
      got.toString)
  }

  test("materialize: same-ts_ms delete vs update resolves to deleted " +
      "(conservative -D > +U > +I phase order)") {
    val decoded = DebeziumJson.decode(lines(
      """{"after":{"id":1,"v":"a"},"op":"c","ts_ms":1}""",
      // ms-granularity collision: update and delete share ts_ms=2
      """{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"a2"},"op":"u","ts_ms":2}""",
      """{"before":{"id":1,"v":"a2"},"op":"d","ts_ms":2}"""), payload)
    assert(DebeziumJson.materialize(decoded, Seq("id")).count() == 0)
  }

  test("materialize: last change wins, deleted keys disappear, " +
      "arrival order irrelevant") {
    val decoded = DebeziumJson.decode(lines(
      // deliberately shuffled arrival order
      """{"before":{"id":2,"v":"b"},"op":"d","ts_ms":3}""",
      """{"after":{"id":1,"v":"a"},"op":"c","ts_ms":1}""",
      """{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"a2"},"op":"u","ts_ms":2}""",
      """{"after":{"id":2,"v":"b"},"op":"c","ts_ms":1}""",
      """{"after":{"id":3,"v":"c"},"op":"c","ts_ms":1}"""), payload)
    val fin = DebeziumJson.materialize(decoded, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(fin == Set((1L, "a2"), (3L, "c")), fin.toString)
  }
}
