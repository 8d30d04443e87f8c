package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Event for the alignment property draws (top-level: Spark's product
  * encoder rejects spec-inner classes). */
case class AR(src: String, ts: Timestamp, id: Long)

/** Differential property test for watermark ALIGNMENT
  * (StreamOps.alignedRelease — reference FLIP-182 /
  * WatermarksWithWatermarkAlignment.java): no row more than
  * `maxDriftMs` ahead of the min-policy event-time watermark may pass
  * downstream; runaway-source rows park in per-source state under an
  * event-time timer and drain as the watermark catches up. Topology
  * as documented: one MemoryStream per source, each with its own
  * `withWatermark`, unioned — Spark's default multipleWatermarkPolicy
  * = min makes the group watermark the SLOWEST source's.
  *
  * Once `processAllAvailable` quiesces (the data batch plus the timer
  * batches Spark runs as the watermark advances), the released set is
  * a pure fold of the chunk sequence:
  *
  *   wmBranch_s(i) = max ts of s in chunks 0..i  -  delay   (0 if none)
  *   wm_i          = min over sources of wmBranch_s(i)
  *   released_i    = { r ∈ chunks 0..i : r.ts ≤ wm_i + maxDrift }
  *
  * checked after EVERY chunk — which pins BOTH halves at once: a row
  * in `got` but not `want` broke alignment SAFETY (released while
  * ts > wm + drift), a row in `want` but not `got` broke timer-drain
  * LIVENESS (the event-time timer chain failed to re-release it).
  * Per-source clocks are monotone, so no input is ever late to the
  * stateful operator and exactly-once = set equality. Draws give one
  * source a runaway clock (20-120 s steps vs 0-8 s), so deep
  * multi-chunk parking occurs, and chunks that skip a source pin the
  * wm-pinned-at-0 corner (nothing may release while a source has
  * never spoken).
  */
class AlignedReleasePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val T0 = Timestamp.valueOf("2024-05-01 00:00:00").getTime
  private val DelayMs = 5000L
  private val DriftMs = 30000L
  private val Sources = Vector("s0", "s1", "s2")

  private def genHistory(rnd: scala.util.Random): Vector[AR] = {
    // s0 runs away by tens of seconds per event — and goes SILENT for
    // the second half of the history, so its parked rows can only
    // drain via the event-time timer as s1/s2 advance the watermark
    // (the liveness leg; a data-driven handler invocation would mask
    // a broken timer)
    val clock = scala.collection.mutable.Map(Sources.map(_ -> 0L): _*)
    val n = 30 + rnd.nextInt(16)
    Vector.tabulate(n) { i =>
      val src =
        if (i < n / 2) Sources(rnd.nextInt(Sources.size))
        else Sources(1 + rnd.nextInt(Sources.size - 1))
      clock(src) +=
        (if (src == "s0") 20000L + rnd.nextLong(40000L)
         // slow sources speed up once s0 goes silent, so the min
         // watermark actually reaches the parked rows' release points
         else if (i < n / 2) 1000L + rnd.nextLong(7000L)
         else 10000L + rnd.nextLong(20000L))
      AR(src, new Timestamp(T0 + clock(src)), i.toLong)
    }
  }

  /** The min-policy watermark + drift-envelope fold. */
  private def wanted(chunks: Seq[Vector[AR]]): Set[Long] = {
    val seen = chunks.flatten
    val wm = Sources.map { s =>
      val ts = seen.filter(_.src == s).map(_.ts.getTime)
      if (ts.isEmpty) 0L else ts.max - DelayMs
    }.min
    seen.filter(_.ts.getTime <= wm + DriftMs).map(_.id).toSet
  }

  test("differential: released set equals the min-watermark drift-" +
      "envelope fold after EVERY micro-batch — alignment safety AND " +
      "timer-drain liveness across random runaway-source histories") {
    var parkedObs = 0
    var timerReleases = 0
    (1 to 6).foreach { seed =>
      val h = genHistory(new scala.util.Random(seed))
      val chunks = (0 until 4).map(i =>
        h.slice(i * h.size / 4, (i + 1) * h.size / 4))
      val ins = Sources.map(_ -> MemoryStream[AR]).toMap
      val unioned = Sources.map(s =>
          ins(s).toDF().withWatermark("ts", s"${DelayMs / 1000} seconds"))
        .reduce(_ unionByName _).as[AR]
      val aligned =
        StreamOps.alignedRelease(unioned, DriftMs)(_.src, _.ts.getTime)
      val got = scala.collection.concurrent.TrieMap.empty[Long, Long]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_arprop_ck").toString
      val q = aligned.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.Dataset[AR], _: Long) => {
          b.collect().foreach(r => got(r.id) = r.ts.getTime)
          ()
        }).start()
      var prevWant = Set.empty[Long]
      chunks.zipWithIndex.foreach { case (c, i) =>
        c.groupBy(_.src).foreach { case (s, rows) => ins(s).addData(rows) }
        q.processAllAvailable()
        val want = wanted(chunks.take(i + 1))
        assert(got.keySet.toSet == want,
          s"seed=$seed chunk=$i\ngot=${got.keySet.toSet}\nwant=$want")
        val seenIds = chunks.take(i + 1).flatten.map(_.id).toSet
        parkedObs += (seenIds -- want).size
        // rows released this chunk that arrived in an earlier chunk
        // AND whose source got no data this chunk: only an event-time
        // timer can have invoked their group's handler
        val srcOf = h.map(r => r.id -> r.src).toMap
        timerReleases += (want -- prevWant).count(id =>
          !c.exists(_.id == id) && !c.exists(_.src == srcOf(id)))
        prevWant = want
      }
      q.stop()
    }
    assert(parkedObs >= 15,
      s"only $parkedObs parked row-observations — runaway clock too tame")
    assert(timerReleases >= 5,
      s"only $timerReleases timer-driven releases — the liveness leg " +
        "was not exercised")
  }
}
