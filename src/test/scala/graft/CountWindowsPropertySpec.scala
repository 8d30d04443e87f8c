package graft

import graft.streaming.CountWindows
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Event for the count-window property draws (top-level: Spark's
  * product encoder rejects spec-inner classes). */
case class CW(k: String, id: Long, v: Double)

/** Differential property tests for the count-based window operators
  * (streaming/CountWindows.scala — reference
  * CountTumblingWindowAssigner + ElementTriggers.CountElement,
  * AppendOnlyFirstNFunction, DeltaTrigger∘PurgingTrigger∘CountEvictor),
  * completing the randomized-adversary sweep over the hand-written
  * state machines. Arrival order is the operators' contract, so the
  * harness feeds ROUNDS of at most one event per key per micro-batch
  * (deterministic order), with random round membership — windows and
  * quotas routinely straddle micro-batch boundaries, which is the
  * state being tested. Oracles are direct per-key simulations over
  * the arrival sequence.
  */
class CountWindowsPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val keys = Vector("k0", "k1", "k2")

  /** Rounds of at most one event per key, 75% presence. */
  private def genRounds(rnd: scala.util.Random,
      nRounds: Int): Vector[Vector[CW]] = {
    var nextId = 0L
    (1 to nRounds).map { _ =>
      keys.flatMap { k =>
        if (rnd.nextInt(100) < 75) {
          nextId += 1
          Some(CW(k, nextId, (1 + rnd.nextInt(9)).toDouble))
        } else None
      }
    }.toVector
  }

  private def drive[O](rounds: Vector[Vector[CW]],
      wire: org.apache.spark.sql.Dataset[CW] =>
        org.apache.spark.sql.Dataset[O],
      collect: org.apache.spark.sql.Dataset[O] => Seq[(String, Long, Seq[Long])])
      : Seq[(String, Long, Seq[Long])] = {
    val in = MemoryStream[CW]
    val got =
      new scala.collection.mutable.ArrayBuffer[(String, Long, Seq[Long])]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_cwprop_ck").toString
    val q = wire(in.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: org.apache.spark.sql.Dataset[O], _: Long) =>
        got.synchronized { got ++= collect(b); () })
      .start()
    rounds.foreach { r =>
      if (r.nonEmpty) { in.addData(r); q.processAllAvailable() }
    }
    q.stop()
    got.toSeq
  }

  test("tumbling(size) differential: exactly the complete arrival-order " +
      "chunks emit, numbered consecutively; the partial tail never does") {
    Seq(1 -> 2, 2 -> 3, 3 -> 4).foreach { case (seed, size) =>
      val rounds = genRounds(new scala.util.Random(seed), 9)
      val got = drive[CountWindows.CountWindow[String, CW]](rounds,
        ds => CountWindows.tumbling(ds, size)(_.k),
        b => b.collect().toSeq
          .map(w => (w.key, w.window_no, w.rows.map(_.id))))
      val want = rounds.flatten.groupBy(_.k).toSeq.flatMap {
        case (k, evs) =>
          evs.grouped(size).zipWithIndex.collect {
            case (chunk, i) if chunk.size == size =>
              (k, i.toLong, chunk.map(_.id): Seq[Long])
          }
      }
      assert(got.sortBy(w => (w._1, w._2)) == want.sortBy(w => (w._1, w._2)),
        s"seed=$seed size=$size\ngot=$got\nwant=$want")
      // windows must straddle micro-batch boundaries in the draw space
      assert(want.nonEmpty)
    }
  }

  test("firstN differential: exactly the first n of each key's arrival " +
      "sequence pass, across micro-batches") {
    Seq(4 -> 2, 5 -> 4, 6 -> 7).foreach { case (seed, n) =>
      val rounds = genRounds(new scala.util.Random(seed), 8)
      val got = drive[CW](rounds,
        ds => CountWindows.firstN(ds, n)(_.k),
        b => b.collect().toSeq.map(e => (e.k, e.id, Seq.empty[Long])))
      val want = rounds.flatten.groupBy(_.k).toSeq.flatMap {
        case (k, evs) => evs.take(n).map(e => (k, e.id, Seq.empty[Long]))
      }
      assert(got.sortBy(e => (e._1, e._2)) == want.sortBy(e => (e._1, e._2)),
        s"seed=$seed n=$n\ngot=$got\nwant=$want")
    }
  }

  test("deltaTriggered differential: fire/purge/reference-point and the " +
      "CountEvictor bound match the direct simulation") {
    Seq((7, 3.0, None), (8, 2.0, Some(2)), (9, 4.0, Some(3)))
      .foreach { case (seed, threshold, maxBuffer) =>
        val rounds = genRounds(new scala.util.Random(seed), 10)
        val got = drive[CountWindows.CountWindow[String, CW]](rounds,
          ds => CountWindows.deltaTriggered(ds, threshold, maxBuffer)(
            _.k, _.v),
          b => b.collect().toSeq
            .map(w => (w.key, w.window_no, w.rows.map(_.id))))
        // direct simulation of DeltaTrigger∘PurgingTrigger∘CountEvictor
        val want = rounds.flatten.groupBy(_.k).toSeq.flatMap {
          case (k, evs) =>
            var ref = Double.NaN
            var buf = Vector.empty[CW]
            var winNo = 0L
            val out = Vector.newBuilder[(String, Long, Seq[Long])]
            evs.foreach { t =>
              if (ref.isNaN) { ref = t.v; buf = Vector(t) }
              else if (math.abs(t.v - ref) > threshold) {
                val win = buf :+ t
                out += ((k, winNo,
                  maxBuffer.fold(win)(m => win.takeRight(m)).map(_.id)))
                winNo += 1; ref = t.v; buf = Vector.empty
              } else {
                val grown = buf :+ t
                buf = maxBuffer.fold(grown)(m => grown.takeRight(m))
              }
            }
            out.result()
        }
        assert(
          got.sortBy(w => (w._1, w._2)) == want.sortBy(w => (w._1, w._2)),
          s"seed=$seed threshold=$threshold max=$maxBuffer\n" +
            s"got=$got\nwant=$want")
        assert(want.nonEmpty, s"seed=$seed drew no fired windows")
      }
  }
}
