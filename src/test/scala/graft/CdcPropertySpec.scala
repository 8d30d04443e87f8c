package graft

import graft.sources.{CanalJson, DebeziumJson, MaxwellJson}
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the CDC decode+materialize path: ANY generated
  * insert/update/delete history, replayed through the debezium, canal
  * AND maxwell envelopes, must equal a plain in-memory map fold of the
  * same history — the definitional semantics of changelog
  * materialization.
  * Histories are key-consistent (an update/delete only follows an
  * existing key) with strictly increasing ts, like a real CDC log. */
class CdcPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val payload = new StructType()
    .add("id", LongType).add("v", StringType)

  sealed private trait Op { def id: Long }
  private case class Ins(id: Long, v: String) extends Op
  private case class Upd(id: Long, from: String, to: String) extends Op
  private case class Del(id: Long, v: String) extends Op

  /** Key-consistent histories over a small key space. */
  private val histories: Gen[List[Op]] =
    Gen.choose(0, 24).flatMap { n =>
      def step(i: Int, live: Map[Long, String], acc: List[Op]): Gen[List[Op]] =
        if (i >= n) Gen.const(acc.reverse)
        else {
          // defs: Gen.oneOf throws at CONSTRUCTION on an empty seq,
          // so the live-keyed generators must not be built eagerly
          def inserts = for {
            id <- Gen.choose(0L, 7L).suchThat(!live.contains(_))
            v <- Gen.identifier.map(_.take(4))
          } yield Ins(id, v)
          def updates = for {
            id <- Gen.oneOf(live.keys.toSeq)
            v <- Gen.identifier.map(_.take(4))
          } yield Upd(id, live(id), v)
          def deletes = Gen.oneOf(live.keys.toSeq).map(id => Del(id, live(id)))
          val pick =
            if (live.isEmpty) inserts
            else if (live.size >= 8) Gen.oneOf(updates, deletes)
            else Gen.frequency(3 -> inserts, 3 -> updates, 2 -> deletes)
          pick.flatMap {
            case op @ Ins(id, v) => step(i + 1, live + (id -> v), op :: acc)
            case op @ Upd(id, _, v) => step(i + 1, live + (id -> v), op :: acc)
            case op @ Del(id, _) => step(i + 1, live - id, op :: acc)
          }
        }
      step(0, Map.empty, Nil)
    }

  /** Definitional semantics: fold the history through a map. */
  private def replay(h: List[Op]): Set[(Long, String)] =
    h.foldLeft(Map.empty[Long, String]) {
      case (m, Ins(id, v)) => m + (id -> v)
      case (m, Upd(id, _, v)) => m + (id -> v)
      case (m, Del(id, _)) => m - id
    }.toSet

  private def q(s: String) = "\"" + s + "\""
  private def pay(id: Long, v: String) = s"""{"id":$id,"v":${q(v)}}"""

  private def dbzLine(op: Op, ts: Int): String = op match {
    case Ins(id, v) => s"""{"after":${pay(id, v)},"op":"c","ts_ms":$ts}"""
    case Upd(id, f, t) =>
      s"""{"before":${pay(id, f)},"after":${pay(id, t)},"op":"u","ts_ms":$ts}"""
    case Del(id, v) => s"""{"before":${pay(id, v)},"op":"d","ts_ms":$ts}"""
  }

  private def canalLine(op: Op, ts: Int): String = op match {
    case Ins(id, v) =>
      s"""{"data":[${pay(id, v)}],"type":"INSERT","ts":$ts}"""
    case Upd(id, f, t) => // canal: old carries ONLY the changed field
      s"""{"data":[${pay(id, t)}],"old":[{"v":${q(f)}}],"type":"UPDATE","ts":$ts}"""
    case Del(id, v) =>
      s"""{"data":[${pay(id, v)}],"type":"DELETE","ts":$ts}"""
  }

  private def maxwellLine(op: Op, ts: Int): String = op match {
    case Ins(id, v) =>
      s"""{"data":${pay(id, v)},"type":"insert","ts":$ts}"""
    case Upd(id, f, t) => // maxwell: old carries ONLY the changed field
      s"""{"data":${pay(id, t)},"old":{"v":${q(f)}},"type":"update","ts":$ts}"""
    case Del(id, v) =>
      s"""{"data":${pay(id, v)},"type":"delete","ts":$ts}"""
  }

  private def materializedSet(lines: Seq[String],
      decode: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
    DebeziumJson.materialize(decode(lines.toDF("value")), Seq("id"))
      .as[(Long, String)].collect().toSet

  test("debezium, canal and maxwell materialization equal the map-fold " +
      "replay for arbitrary key-consistent histories") {
    // deterministic seeds, no scalatestplus bridge in the deps
    (1 to 30).foreach { i =>
      val h = histories.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(Nil)
      if (h.nonEmpty) {
        val expected = replay(h)
        val ts = h.indices
        val viaDbz = materializedSet(
          h.zip(ts).map { case (op, t) => dbzLine(op, t) },
          DebeziumJson.decode(_, payload))
        val viaCanal = materializedSet(
          h.zip(ts).map { case (op, t) => canalLine(op, t) },
          CanalJson.decode(_, payload))
        val viaMaxwell = materializedSet(
          h.zip(ts).map { case (op, t) => maxwellLine(op, t) },
          MaxwellJson.decode(_, payload))
        assert(viaDbz == expected, s"seed $i debezium: $viaDbz vs $expected\n$h")
        assert(viaCanal == expected, s"seed $i canal: $viaCanal vs $expected\n$h")
        assert(viaMaxwell == expected,
          s"seed $i maxwell: $viaMaxwell vs $expected\n$h")
      }
    }
  }
}
