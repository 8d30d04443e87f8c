package graft

import graft.sources.{CanalJson, DebeziumJson}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins canal envelope decode: batched data arrays, the UPDATE
  * partial-`old` merge (changed fields from old[i], the rest from
  * data[i] — CanalJsonDeserializationSchema semantics), and
  * interchangeability with the debezium materialization. */
class CanalJsonSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val payload = new StructType()
    .add("id", LongType).add("v", StringType).add("n", LongType)

  private def lines(ls: String*) = ls.toDF("value")

  test("batched INSERT explodes per element; UPDATE merges partial old") {
    val decoded = CanalJson.decode(lines(
      """{"data":[{"id":1,"v":"a","n":10},{"id":2,"v":"b","n":20}],"type":"INSERT","ts":1}""",
      // old carries ONLY the changed field v — id/n must come from data
      """{"data":[{"id":1,"v":"a2","n":10}],"old":[{"v":"a"}],"type":"UPDATE","ts":2}""",
      """{"data":[{"id":2,"v":"b","n":20}],"type":"DELETE","ts":3}""",
      """{"data":[{"id":9,"v":"x","n":0}],"type":"NOPE","ts":4}"""), payload)
    val got = decoded.select($"kind", $"id", $"v", $"n")
      .as[(String, Long, String, Long)].collect().toSet
    assert(got == Set(
      ("+I", 1L, "a", 10L), ("+I", 2L, "b", 20L),
      ("-U", 1L, "a", 10L), // merged before-image: v from old, id/n from data
      ("+U", 1L, "a2", 10L),
      ("-D", 2L, "b", 20L)), got.toString)
  }

  test("UPDATE with an explicitly-null changed before-value keeps the " +
      "null in the -U image (presence probe, not coalesce — " +
      "CanalJsonDeserializationSchema findValue semantics)") {
    val decoded = CanalJson.decode(lines(
      """{"data":[{"id":1,"v":"set","n":10}],"type":"INSERT","ts":1}""",
      // v changed null -> "set2": old carries v PRESENT with value null.
      // A coalesce merge would wrongly emit the NEW value in the -U row.
      """{"data":[{"id":1,"v":"set2","n":10}],"old":[{"v":null}],"type":"UPDATE","ts":2}"""),
      payload)
    val got = decoded.select($"kind", $"id", $"v", $"n")
      .as[(String, Long, Option[String], Long)].collect().toSet
    assert(got == Set(
      ("+I", 1L, Some("set"), 10L),
      ("-U", 1L, None, 10L), // explicit null preserved
      ("+U", 1L, Some("set2"), 10L)), got.toString)
  }

  test("maxwell UPDATE with an explicitly-null changed before-value " +
      "keeps the null in the -U image (same presence-probe semantics)") {
    import graft.sources.MaxwellJson
    val decoded = MaxwellJson.decode(lines(
      """{"data":{"id":1,"v":"set","n":10},"type":"insert","ts":1}""",
      """{"data":{"id":1,"v":"set2","n":10},"old":{"v":null},"type":"update","ts":2}"""),
      payload)
    val got = decoded.select($"kind", $"id", $"v", $"n")
      .as[(String, Long, Option[String], Long)].collect().toSet
    assert(got == Set(
      ("+I", 1L, Some("set"), 10L),
      ("-U", 1L, None, 10L),
      ("+U", 1L, Some("set2"), 10L)), got.toString)
  }

  test("canal changelog materializes to the same final state as debezium") {
    val canal = CanalJson.decode(lines(
      """{"data":[{"id":1,"v":"a","n":1},{"id":2,"v":"b","n":2}],"type":"INSERT","ts":1}""",
      """{"data":[{"id":1,"v":"a2","n":1}],"old":[{"v":"a"}],"type":"UPDATE","ts":2}""",
      """{"data":[{"id":2,"v":"b","n":2}],"type":"DELETE","ts":3}"""), payload)
    val dbz = DebeziumJson.decode(lines(
      """{"after":{"id":1,"v":"a","n":1},"op":"c","ts_ms":1}""",
      """{"after":{"id":2,"v":"b","n":2},"op":"c","ts_ms":1}""",
      """{"before":{"id":1,"v":"a","n":1},"after":{"id":1,"v":"a2","n":1},"op":"u","ts_ms":2}""",
      """{"before":{"id":2,"v":"b","n":2},"op":"d","ts_ms":3}"""), payload)
    val a = DebeziumJson.materialize(canal, Seq("id"))
      .as[(Long, String, Long)].collect().toSet
    val b = DebeziumJson.materialize(dbz, Seq("id"))
      .as[(Long, String, Long)].collect().toSet
    assert(a == b && a == Set((1L, "a2", 1L)), s"$a vs $b")
  }
}
