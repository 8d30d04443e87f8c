package graft

import graft.streaming.LateData
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.unix_millis
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Event for the late-data property draws (top-level: Spark's product
  * encoder rejects spec-inner classes). `ts` nullable on purpose —
  * null event time has no position relative to any watermark. */
case class LD(id: Long, ts: Timestamp, k: String, v: Double)

/** Differential property tests for the late-data operators
  * (streaming/LateData.scala — reference WindowedStream.java:108
  * `sideOutputLateData` / `allowedLateness`): both are deterministic
  * folds over micro-batch boundaries —
  *
  *   wm_i      = max(ts over batches 0..i-1) - delay
  *   late_i    = { r ∈ batch_i : r.ts null ∨ r.ts < wm_i }
  *   horizon_i = wm_i - lateness
  *   accept_i  = { r ∈ batch_i : r.ts ≠ null ∧ r.ts ≥ horizon_i }
  *
  * so the oracle replays the SAME fold in plain Scala and the engine's
  * parquet outputs must match it after EVERY micro-batch: every input
  * row in exactly one of main/late (sideOutputLate), and the refined
  * snapshot equal to groupBy(window, key) cnt/sum over ∪ accept_i
  * (refiningWindowAgg — a late row inside the horizon RE-FIRES its
  * window, one beyond it is dropped, Flink's allowedLateness).
  *
  * The example specs pinned single scripted scenarios; these draws
  * randomize event-time disorder (30% of rows rewind up to 2× the
  * delay+lateness, 5% null ts), so the late/accept cut lands on both
  * sides of every boundary across seeds.
  */
class LateDataPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val T0 = Timestamp.valueOf("2024-03-01 00:00:00").getTime
  private val DelayMs = 60000L      // 1 min watermark delay
  private val LatenessMs = 120000L  // 2 min allowed lateness

  /** Random history: event time mostly advances, but 30% of rows
    * rewind by up to 2×(delay+lateness) and 5% have null ts. */
  private def genHistory(rnd: scala.util.Random): Vector[LD] = {
    val n = 36 + rnd.nextInt(13)
    var clock = 0L
    Vector.tabulate(n) { i =>
      clock += rnd.nextInt(45000)
      val ts =
        if (rnd.nextInt(100) < 5) null
        else if (rnd.nextInt(100) < 30) {
          val back = rnd.nextLong(2 * (DelayMs + LatenessMs))
          new Timestamp(T0 + math.max(0L, clock - back))
        } else new Timestamp(T0 + clock)
      LD(i.toLong, ts, s"k${rnd.nextInt(3)}", (1 + rnd.nextInt(9)).toDouble)
    }
  }

  private def chunksOf(h: Vector[LD], n: Int): Seq[Vector[LD]] =
    (0 until n).map(i => h.slice(i * h.size / n, (i + 1) * h.size / n))

  /** The fold: per chunk, (late ids, accepted rows, new maxSeen). */
  private case class Fold(maxSeen: Long = Long.MinValue,
      late: Set[Long] = Set.empty, accepted: Vector[LD] = Vector.empty)

  private def fold(chunks: Seq[Vector[LD]]): Fold =
    chunks.foldLeft(Fold()) { (st, c) =>
      val wm =
        if (st.maxSeen == Long.MinValue) Long.MinValue
        else st.maxSeen - DelayMs
      val horizon =
        if (wm == Long.MinValue) Long.MinValue else wm - LatenessMs
      val late = c.filter(r => r.ts == null || r.ts.getTime < wm)
      val acc = c.filter(r => r.ts != null && r.ts.getTime >= horizon)
      val mx = c.filter(_.ts != null).map(_.ts.getTime)
        .foldLeft(st.maxSeen)(math.max)
      Fold(mx, st.late ++ late.map(_.id), st.accepted ++ acc)
    }

  private def readIds(path: String): Set[Long] = {
    val d = new java.io.File(path)
    if (!d.exists()) Set.empty
    else spark.read.parquet(path).select($"id").as[Long].collect().toSet
  }

  test("differential: sideOutputLate routes every row to exactly the " +
      "sink the watermark fold predicts, after EVERY micro-batch") {
    var lateTotal = 0
    (1 to 6).foreach { seed =>
      val h = genHistory(new scala.util.Random(seed))
      val chunks = chunksOf(h, 4)
      val base = Files.createTempDirectory("graft_ldprop").toString
      val in = MemoryStream[LD]
      val q = LateData.sideOutputLate(in.toDF(), "ts", DelayMs,
        s"$base/main", s"$base/late").queryName(s"ldprop$seed").start()
      chunks.zipWithIndex.foreach { case (c, i) =>
        in.addData(c)
        q.processAllAvailable()
        val f = fold(chunks.take(i + 1))
        val all = chunks.take(i + 1).flatten.map(_.id).toSet
        val gotLate = readIds(s"$base/late")
        val gotMain = readIds(s"$base/main")
        assert(gotLate == f.late, s"seed=$seed chunk=$i late mismatch: " +
          s"got=$gotLate want=${f.late}")
        assert(gotMain == all -- f.late,
          s"seed=$seed chunk=$i main mismatch")
      }
      q.stop()
      lateTotal += fold(chunks).late.size
    }
    assert(lateTotal >= 12, s"only $lateTotal late rows across draws — " +
      "the generator stopped producing behind-watermark arrivals")
  }

  test("differential: refiningWindowAgg snapshot equals the additive " +
      "agg over the fold's accepted rows, after EVERY micro-batch " +
      "(in-horizon late rows re-fire, beyond-horizon rows drop)") {
    var refired = 0
    var dropped = 0
    (11 to 15).foreach { seed =>
      val h = genHistory(new scala.util.Random(seed))
      val chunks = chunksOf(h, 4)
      val base = Files.createTempDirectory("graft_ldprop_ref").toString
      val in = MemoryStream[LD]
      val q = LateData.refiningWindowAgg(in.toDF(), "ts", "1 minute",
        DelayMs, LatenessMs, keys = Seq("k"), sumCols = Seq("v"),
        s"$base/result", buckets = 8)
        .queryName(s"ldpropref$seed").start()
      chunks.zipWithIndex.foreach { case (c, i) =>
        in.addData(c)
        q.processAllAvailable()
        val f = fold(chunks.take(i + 1))
        val want = f.accepted
          .groupBy(r => (r.ts.getTime / 60000 * 60000, r.k))
          .map { case (g, rows) =>
            g -> ((rows.size.toLong, rows.map(_.v).sum)) }
        val got =
          if (f.accepted.isEmpty) Map.empty
          else LateData.readRefined(spark, s"$base/result")
            .select(unix_millis($"window_start"), $"k", $"cnt", $"sum_v")
            .as[(Long, String, Long, Double)].collect()
            .map { case (w, k, c0, s0) => (w, k) -> ((c0, s0)) }.toMap
        assert(got == want, s"seed=$seed chunk=$i\ngot=$got\nwant=$want")
      }
      q.stop()
      // coverage: late-but-in-horizon rows (re-fires) and
      // beyond-horizon drops both occurred
      val f = fold(chunks)
      refired += f.accepted.map(_.id).toSet.intersect(f.late).size
      dropped += (h.filter(_.ts != null).map(_.id).toSet --
        f.accepted.map(_.id).toSet).size
    }
    assert(refired >= 5, s"only $refired in-horizon late rows (re-fires)")
    assert(dropped >= 3, s"only $dropped beyond-horizon drops")
  }
}
