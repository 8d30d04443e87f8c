package graft

import graft.streaming.EventTimeSort
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Event for the temporal-sort property draws (top-level: Spark's
  * product encoder rejects spec-inner classes). */
case class ES(k: String, id: Long, ts: java.sql.Timestamp, seq: Long)

/** Differential property test for the event-time (temporal) sort
  * (streaming/EventTimeSort.scala — reference RowTimeSortOperator):
  * for random per-key event histories arriving SHUFFLED within each
  * micro-batch and chunked across micro-batches, the emitted stream
  * must be, per key, EXACTLY the (ts, seq)-sorted sequence of all
  * inputs — every row once, none lost at chunk boundaries, and the
  * cross-batch emission order must itself be sorted (a row released
  * in a later batch may never sort before one already emitted —
  * that's the watermark contract the operator exists to provide).
  */
class EventTimeSortPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("differential: 6 random shuffled-arrival histories emit the " +
      "per-key (ts, seq)-sorted sequence exactly once") {
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val keys = Vector("k0", "k1", "k2")
      val evs = (1 to 20 + rnd.nextInt(10)).map { i =>
        ES(keys(rnd.nextInt(keys.length)), i.toLong,
          new java.sql.Timestamp(3600000L + rnd.nextInt(25) * 1000L),
          i.toLong)
      }
      val in = MemoryStream[ES]
      val got = new scala.collection.mutable.ArrayBuffer[(String, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_etsort_ck").toString
      val q = EventTimeSort(
        in.toDS().withWatermark("ts", "0 seconds"))(
        _.k, _.ts.getTime, _.seq)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.Dataset[ES], _: Long) =>
          got.synchronized {
            // foreachBatch runs serially, so append order IS the
            // cross-batch emission order; within a batch collect()
            // preserves the operator's iterator order per key
            got ++= b.collect().map(e => (e.k, e.id))
            ()
          })
        .start()
      // chronological chunks cut at distinct-timestamp boundaries
      // (Spark drops ts <= watermark input), SHUFFLED inside each
      // chunk so arrival order never matches event-time order
      val tsGroups = evs.groupBy(_.ts.getTime).toSeq.sortBy(_._1)
      (0 until 3).foreach { i =>
        val chunk = rnd.shuffle(tsGroups.slice(i * tsGroups.size / 3,
          (i + 1) * tsGroups.size / 3).flatMap(_._2))
        if (chunk.nonEmpty) { in.addData(chunk); q.processAllAvailable() }
      }
      in.addData(ES("zz", -1L,
        new java.sql.Timestamp(3600000L + 90000L), 9999L))
      q.processAllAvailable()
      q.processAllAvailable()
      q.stop()
      val real = got.filter(_._2 != -1L)
      val byKey = real.zipWithIndex.groupBy(_._1._1)
      val sortKey = evs.map(e => e.id -> ((e.ts.getTime, e.seq))).toMap
      evs.groupBy(_.k).foreach { case (k, rows) =>
        val want = rows.sortBy(e => (e.ts.getTime, e.seq)).map(_.id)
        val gotIds = byKey.getOrElse(k, Vector()).map(_._1._2)
        assert(gotIds == want,
          s"seed=$seed key=$k\ngot=$gotIds\nwant=$want")
        // emission order must be sorted ACROSS batches too
        val emitted = byKey.getOrElse(k, Vector()).map(_._1._2)
        assert(emitted.map(sortKey) == emitted.map(sortKey).sorted,
          s"seed=$seed key=$k cross-batch emission out of order")
      }
    }
  }
}
