package graft

import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Streaming semantics tests (SURVEY §5: batch-vs-stream self-oracle —
  * a replayed bounded stream must equal the batch result). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private var qn = 0
  def nextName(): String = { qn += 1; s"stream_out_$qn" }

  def runAll(q: StreamingQuery): Unit = { q.processAllAvailable() }

  test("tumbleAgg (append mode) equals batch window agg after watermark") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val agg = StreamOps.tumbleAgg(in.toDF(), "ts", "10 seconds", "1 minute",
      Seq($"user_id"), Seq(count(lit(1)).as("n"), sum($"value").as("sv")))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val batch1 = Seq(
      Ev(1, ts("2024-01-01 00:00:10"), 1, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:20"), 1, "a", 2.0),
      Ev(3, ts("2024-01-01 00:01:10"), 2, "b", 3.0))
    in.addData(batch1: _*)
    runAll(q)
    // sentinel far in the future pushes the watermark past all windows
    in.addData(Ev(99, ts("2024-01-01 01:00:00"), 9, "z", 0.0))
    runAll(q)
    q.stop()
    val got = spark.table(name)
      .select($"window_start".cast("string"), $"user_id", $"n", $"sv")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got.contains(("2024-01-01 00:00:00", 1L, 2L, 3.0)))
    assert(got.contains(("2024-01-01 00:01:00", 2L, 1L, 3.0)))
  }

  test("dedupKeepFirst drops later duplicates of a key") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val dd = StreamOps.dedupKeepFirst(in.toDF(), "ts", "1 minute",
      Seq("event_id"))
    val q = dd.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData(
      Ev(1, ts("2024-01-01 00:00:01"), 1, "a", 1.0),
      Ev(1, ts("2024-01-01 00:00:02"), 1, "a", 99.0),
      Ev(2, ts("2024-01-01 00:00:03"), 1, "b", 2.0))
    runAll(q)
    q.stop()
    val got = spark.table(name).select($"event_id", $"value")
      .as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 1.0), (2L, 2.0)))
  }

  test("keepLast emits the newest row per key across triggers") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val kl = StreamOps.keepLast(in.toDS())(_.user_id, _.event_id)
    val q = kl.toDF().writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    in.addData(
      Ev(1, ts("2024-01-01 00:00:01"), 7, "a", 1.0),
      Ev(3, ts("2024-01-01 00:00:03"), 7, "a", 3.0))
    runAll(q)
    in.addData(Ev(2, ts("2024-01-01 00:00:02"), 7, "a", 2.0)) // stale
    runAll(q)
    in.addData(Ev(5, ts("2024-01-01 00:00:05"), 7, "a", 5.0)) // fresh
    runAll(q)
    q.stop()
    val emitted = spark.table(name).select($"event_id").as[Long].collect().toSeq
    assert(emitted == Seq(3L, 5L)) // stale row 2 never emitted
  }

  test("state TTL evicts an idle key (StateTtlConfig analog)") {
    // ProcessingTimeTimeout makes shouldRunAnotherBatch always-true, so
    // processAllAvailable() would livelock on a 0ms trigger. Drive the
    // query in AvailableNow hops sharing one checkpoint instead: each
    // hop processes pending data + expired timers, then terminates.
    val in = MemoryStream[Ev]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ttl_ckpt")
      .toString
    // 1ms idle TTL: any later trigger finds the key expired
    val kl = StreamOps.keepLast(in.toDS())(_.user_id, _.event_id,
      ttlMs = Some(1L))
    // memory sink can't recover from a checkpoint; foreachBatch can
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    def hop(): Seq[Long] = {
      val before = seen.size
      val q = kl.toDF().writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized {
            seen ++= df.select($"event_id").as[Long].collect()
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("update").start()
      q.awaitTermination(30000)
      q.stop()
      seen.drop(before).toSeq
    }
    in.addData(Ev(5, ts("2024-01-01 00:00:05"), 7, "a", 5.0))
    val e1 = hop()
    Thread.sleep(150) // key 7 sits idle past its TTL
    // an unrelated key's batch fires the expired timer -> state dropped
    in.addData(Ev(100, ts("2024-01-01 00:00:06"), 8, "b", 1.0))
    val e2 = hop()
    // without eviction this stale row (seq 1 < 5) would be suppressed;
    // after eviction the key restarts fresh and it must be emitted
    in.addData(Ev(1, ts("2024-01-01 00:00:01"), 7, "a", 1.0))
    val e3 = hop()
    assert(e1 == Seq(5L))
    assert(e2 == Seq(100L))
    assert(e3 == Seq(1L), "idle key was not evicted: stale row suppressed")
  }

  test("streaming session window merges gap-close events, splits on gap") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val agg = in.toDF().withWatermark("ts", "10 seconds")
      .groupBy($"user_id", session_window($"ts", "30 seconds"))
      .agg(count(lit(1)).as("n"), sum($"value").as("sv"))
      .select($"user_id", $"session_window.start".cast("string").as("ws"),
        $"n", $"sv")
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData(
      Ev(1, ts("2024-01-01 00:00:00"), 7, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:10"), 7, "a", 2.0), // gap < 30s: same session
      Ev(3, ts("2024-01-01 00:01:30"), 7, "a", 4.0)) // gap > 30s: new session
    runAll(q)
    in.addData(Ev(99, ts("2024-01-01 01:00:00"), 9, "z", 0.0)) // flush
    runAll(q)
    q.stop()
    val got = spark.table(name).select($"user_id", $"ws", $"n", $"sv")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got.contains((7L, "2024-01-01 00:00:00", 2L, 3.0)))
    assert(got.contains((7L, "2024-01-01 00:01:30", 1L, 4.0)))
  }

  test("connect: keyed two-stream co-process shares state across sides") {
    val a = MemoryStream[Ev]
    val b = MemoryStream[Ev]
    val name = nextName()
    val out = StreamOps.connect(a.toDS(), b.toDS())(_.user_id, _.user_id) {
      (k: Long, rows: Iterator[Either[Ev, Ev]],
          st: org.apache.spark.sql.streaming.GroupState[(Long, Long)]) =>
        var (lc, rc) = st.getOption.getOrElse((0L, 0L))
        rows.foreach { case Left(_) => lc += 1; case Right(_) => rc += 1 }
        st.update((lc, rc))
        Iterator.single((k, lc, rc))
    }
    val q = out.toDF("key", "lc", "rc").writeStream.format("memory")
      .queryName(name).outputMode("update").start()
    a.addData(
      Ev(1, ts("2024-01-01 00:00:01"), 7, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:02"), 7, "a", 2.0))
    runAll(q)
    b.addData(Ev(3, ts("2024-01-01 00:00:03"), 7, "b", 3.0))
    runAll(q)
    q.stop()
    val got = spark.table(name).as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((7L, 2L, 0L), (7L, 2L, 1L)))
  }

  test("windowCoGroup: both sides' buffers arrive together when the window fires") {
    val a = MemoryStream[Ev]
    val b = MemoryStream[Ev]
    val name = nextName()
    val out = StreamOps.windowCoGroup(
      a.toDS(), b.toDS(), windowMs = 10000L)(
      _.user_id, _.user_id, _.ts.getTime, _.ts.getTime) {
      (k: Long, winStart: Long, ls: Seq[Ev], rs: Seq[Ev]) =>
        Iterator.single((k, winStart,
          ls.map(_.event_id).sorted.mkString(","),
          rs.map(_.event_id).sorted.mkString(",")))
    }
    val q = out.toDF("key", "win_start", "l_ids", "r_ids")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    // window [epoch-aligned 00:00:00, 00:00:10): two left rows, one right
    a.addData(
      Ev(1, ts("2024-01-01 00:00:01"), 7, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:05"), 7, "a", 2.0))
    b.addData(Ev(10, ts("2024-01-01 00:00:03"), 7, "b", 3.0))
    runAll(q)
    // advance the (min-of-sources) watermark past the window end
    a.addData(Ev(3, ts("2024-01-01 00:00:30"), 7, "a", 4.0))
    b.addData(Ev(11, ts("2024-01-01 00:00:30"), 7, "b", 5.0))
    runAll(q)
    q.stop()
    val got = spark.table(name)
      .as[(Long, Long, String, String)].collect().toSet
    val winStart = ts("2024-01-01 00:00:00").getTime
    assert(got.contains((7L, winStart, "1,2", "10")),
      s"expected the closed window's cogrouped buffers, got $got")
  }

  test("streaming limit passes the first n rows across triggers") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val q = StreamOps.limit(in.toDS(), 4).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData(
      Ev(1, ts("2024-01-01 00:00:01"), 1, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:02"), 2, "a", 1.0),
      Ev(3, ts("2024-01-01 00:00:03"), 3, "a", 1.0))
    runAll(q)
    in.addData(
      Ev(4, ts("2024-01-01 00:00:04"), 4, "a", 1.0),
      Ev(5, ts("2024-01-01 00:00:05"), 5, "a", 1.0),
      Ev(6, ts("2024-01-01 00:00:06"), 6, "a", 1.0))
    runAll(q)
    q.stop()
    val got = spark.table(name).select($"event_id").as[Long].collect().toSeq
    assert(got.size == 4)
    assert(got.take(3) == Seq(1L, 2L, 3L)) // first trigger passes whole
  }

  test("rowTimeRangeBoundedPreceding equals the batch RANGE frame") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val withWm = in.toDS().withWatermark("ts", "2 seconds")
    val agg = StreamingOverAgg.rowTimeRangeBoundedPreceding(withWm, 10000L)(
      _.user_id, _.ts.getTime, _.event_id, _.value)
    val q = agg.map(w => (w.payload.event_id, w.running_sum, w.running_count))
      .toDF("event_id", "s", "n")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val evs = Seq(
      Ev(1, ts("2024-01-01 00:00:00"), 7, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:05"), 7, "a", 2.0),
      Ev(3, ts("2024-01-01 00:00:12"), 7, "a", 4.0),
      Ev(4, ts("2024-01-01 00:00:13"), 7, "a", 8.0),
      Ev(5, ts("2024-01-01 00:00:13"), 7, "a", 16.0), // rowtime peer of 4
      Ev(6, ts("2024-01-01 00:00:30"), 7, "a", 32.0))
    in.addData(evs: _*)
    runAll(q)
    // sentinel advances the watermark past every key-7 row
    in.addData(Ev(99, ts("2024-01-01 01:00:00"), 9, "z", 0.0))
    runAll(q)
    q.stop()
    val got = spark.table(name).as[(Long, Double, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // batch oracle: RANGE BETWEEN 10s PRECEDING AND CURRENT ROW
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id")
      .orderBy(unix_timestamp($"ts")).rangeBetween(-10, 0)
    val expect = spark.createDataset(evs)
      .withColumn("s", sum($"value").over(w))
      .withColumn("n", count(lit(1)).over(w).cast("int"))
      .select($"event_id", $"s", $"n").as[(Long, Double, Int)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expect)
  }

  test("rowTimeRangeFrame with FOLLOWING equals the batch frame") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val withWm = in.toDS().withWatermark("ts", "2 seconds")
    // RANGE BETWEEN 10s PRECEDING AND 5s FOLLOWING
    val agg = StreamingOverAgg.rowTimeRangeFrame(withWm, 10000L, 5000L)(
      _.user_id, _.ts.getTime, _.event_id, _.value)
    val q = agg.map(w => (w.payload.event_id, w.running_sum, w.running_count))
      .toDF("event_id", "s", "n")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val evs = Seq(
      Ev(1, ts("2024-01-01 00:00:00"), 7, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:04"), 7, "a", 2.0), // in 1's following
      Ev(3, ts("2024-01-01 00:00:12"), 7, "a", 4.0),
      Ev(4, ts("2024-01-01 00:00:16"), 7, "a", 8.0), // in 3's following
      Ev(5, ts("2024-01-01 00:00:40"), 7, "a", 16.0))
    in.addData(evs: _*)
    runAll(q)
    in.addData(Ev(99, ts("2024-01-01 01:00:00"), 9, "z", 0.0))
    runAll(q)
    q.stop()
    val got = spark.table(name).as[(Long, Double, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id")
      .orderBy(unix_timestamp($"ts")).rangeBetween(-10, 5)
    val expect = spark.createDataset(evs)
      .withColumn("s", sum($"value").over(w))
      .withColumn("n", count(lit(1)).over(w).cast("int"))
      .select($"event_id", $"s", $"n").as[(Long, Double, Int)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expect)
  }

  test("StreamingTopN changelog replays to the batch top-N") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val topn = StreamingTopN(in.toDS(), 2)(_.user_id, _.value, _.event_id)
    val q = topn.map(c => (c.row_kind, c.key, c.rank_no, c.payload.event_id))
      .toDF("kind", "key", "rank_no", "event_id")
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    in.addData(
      Ev(1, ts("2024-01-01 00:00:01"), 1, "a", 10.0),
      Ev(2, ts("2024-01-01 00:00:02"), 1, "a", 20.0))
    runAll(q)
    in.addData(Ev(3, ts("2024-01-01 00:00:03"), 1, "a", 15.0)) // evicts 10
    runAll(q)
    q.stop()
    // replay changelog -> final board
    val changes = spark.table(name)
      .select($"kind", $"rank_no", $"event_id")
      .as[(String, Int, Long)].collect()
    val board = scala.collection.mutable.Map[Int, Long]()
    val live = scala.collection.mutable.Set[Long]()
    changes.foreach {
      case ("-D", _, id) => live -= id
      case (_, r, id) => board(r) = id; live += id
    }
    val finalBoard = board.filter { case (_, id) => live(id) }
    assert(finalBoard == Map(1 -> 2L, 2 -> 3L))
  }

  test("streaming window top-N emitted at watermark equals the batch " +
      "window top-N (q_window_topn's streaming form)") {
    // Window rank rides the append-mode invariant: ALL rows of a
    // window are emitted in the SAME micro-batch (the one whose
    // watermark crosses window_end), so ranking per-batch per-window
    // is exact — the Spark-first StreamExecWindowRank: window state
    // lives in the agg, the rank itself is stateless.
    val in = MemoryStream[Ev]
    val agg = StreamOps.tumbleAgg(in.toDF(), "ts", "30 seconds", "1 minute",
      Seq($"user_id"), Seq(count(lit(1)).as("n"), sum($"value").as("sv")))
    val buf = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    val q = agg.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"window_start")
          .orderBy($"n".desc, $"sv".desc, $"user_id".asc)
        val top = b.withColumn("rank_no", row_number().over(w))
          .filter($"rank_no" <= 2)
          .select($"window_start".cast("string"), $"user_id", $"n")
          .as[(String, Long, Long)].collect()
        buf.synchronized { buf ++= top }
        ()
      }.start()
    val events = Seq(
      Ev(1, ts("2024-01-01 00:00:05"), 1, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:15"), 1, "a", 2.0),
      Ev(3, ts("2024-01-01 00:00:25"), 2, "b", 9.0),
      Ev(4, ts("2024-01-01 00:00:35"), 3, "c", 4.0),
      Ev(5, ts("2024-01-01 00:01:10"), 2, "b", 5.0),
      Ev(6, ts("2024-01-01 00:01:20"), 2, "b", 6.0),
      Ev(7, ts("2024-01-01 00:01:30"), 3, "c", 7.0))
    in.addData(events: _*)
    runAll(q)
    in.addData(Ev(99, ts("2024-01-01 01:00:00"), 9, "z", 0.0)) // close all
    runAll(q)
    q.stop()
    // batch form: same events, same windowed rank
    val batch = events.toDF()
      .withColumn("window_start", window($"ts", "1 minute")("start"))
      .groupBy($"window_start", $"user_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("sv"))
    val bw = org.apache.spark.sql.expressions.Window
      .partitionBy($"window_start")
      .orderBy($"n".desc, $"sv".desc, $"user_id".asc)
    val expected = batch.withColumn("rank_no", row_number().over(bw))
      .filter($"rank_no" <= 2)
      .select($"window_start".cast("string"), $"user_id", $"n")
      .as[(String, Long, Long)].collect().toSet
    assert(buf.toSet == expected,
      s"stream ${buf.toSet} vs batch $expected")
  }

  test("streaming window dedup equals the batch first-per-(user, window) " +
      "(q_window_dedup's streaming form)") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val dd = StreamOps.dedupKeepFirst(
      in.toDF().withColumn("window_start", window($"ts", "1 minute")("start")),
      "ts", "30 seconds", Seq("user_id", "window_start"))
    val q = dd.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val events = Seq(
      Ev(1, ts("2024-01-01 00:00:05"), 1, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:15"), 1, "a", 2.0), // dup of (1, w0)
      Ev(3, ts("2024-01-01 00:00:25"), 2, "b", 3.0),
      Ev(4, ts("2024-01-01 00:01:10"), 1, "a", 4.0), // new window, kept
      Ev(5, ts("2024-01-01 00:01:20"), 1, "a", 5.0)) // dup of (1, w1)
    in.addData(events: _*)
    runAll(q)
    q.stop()
    val got = spark.table(name).select($"event_id").as[Long].collect().toSet
    val expected = graft.operators.Dedup.keepFirst(
        events.toDF().withColumn("window_start",
          window($"ts", "1 minute")("start")),
        Seq($"user_id", $"window_start"), Seq($"ts", $"event_id"))
      .select($"event_id").as[Long].collect().toSet
    assert(got == expected, s"stream $got vs batch $expected")
  }

  test("EventTimeSort emits rows in event-time order once watermark passes") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val sorted = EventTimeSort(
      in.toDS().withWatermark("ts", "0 seconds"))(
      _.user_id, _.ts.getTime, _.event_id)
    val q = sorted.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData(
      Ev(2, ts("2024-01-01 00:00:10"), 1, "b", 2.0),
      Ev(1, ts("2024-01-01 00:00:05"), 1, "a", 1.0)) // out of order
    runAll(q)
    in.addData(Ev(3, ts("2024-01-01 00:00:30"), 1, "c", 3.0))
    runAll(q)
    in.addData(Ev(4, ts("2024-01-01 00:01:30"), 1, "d", 4.0))
    runAll(q)
    q.stop()
    val got = spark.table(name).select($"event_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L)) // sorted despite arrival order 2,1,3
  }

  test("StreamingOverAgg: ROWS 2 PRECEDING..CURRENT running sums") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val agg = StreamingOverAgg.rowsBoundedPreceding(in.toDS(), 3)(
      _.user_id, _.value)
    val q = agg.map(w => (w.payload.event_id, w.running_sum, w.running_count))
      .toDF("event_id", "rs", "rc")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData(
      Ev(1, ts("2024-01-01 00:00:01"), 1, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:02"), 1, "a", 2.0))
    runAll(q)
    in.addData(
      Ev(3, ts("2024-01-01 00:00:03"), 1, "a", 3.0), // window 1,2,3
      Ev(4, ts("2024-01-01 00:00:04"), 1, "a", 4.0)) // window 2,3,4
    runAll(q)
    q.stop()
    val got = spark.table(name).as[(Long, Double, Int)].collect().toSet
    assert(got == Set((1L, 1.0, 1), (2L, 3.0, 2), (3L, 6.0, 3), (4L, 9.0, 3)))
  }

  test("late-data gap (documented): rows older than the watermark are dropped") {
    // Flink offers allowedLateness + side outputs; Spark drops
    // sub-watermark rows. This test pins the documented semantic gap
    // (SURVEY §2.5 / COVERAGE.md).
    val in = MemoryStream[Ev]
    val name = nextName()
    val agg = StreamOps.tumbleAgg(in.toDF(), "ts", "0 seconds", "1 minute",
      Seq($"user_id"), Seq(count(lit(1)).as("n")))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData(Ev(1, ts("2024-01-01 00:10:00"), 1, "a", 1.0))
    runAll(q)
    // watermark is now 00:10; this row's window [00:00,00:01) is closed
    in.addData(Ev(2, ts("2024-01-01 00:00:30"), 1, "late", 1.0))
    runAll(q)
    in.addData(Ev(3, ts("2024-01-01 01:00:00"), 9, "flush", 0.0))
    runAll(q)
    q.stop()
    val got = spark.table(name)
      .select($"window_start".cast("string"), $"n")
      .as[(String, Long)].collect().toSet
    assert(got.contains(("2024-01-01 00:10:00", 1L)))
    assert(!got.exists(_._1 == "2024-01-01 00:00:00"), got) // late row dropped
  }

  test("streaming session window merges within gap, splits across it") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val agg = in.toDF().withWatermark("ts", "10 seconds")
      .groupBy(session_window($"ts", "1 minute"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"session_window.start".cast("string").as("s"),
        $"session_window.end".cast("string").as("e"), $"user_id", $"n")
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData(
      Ev(1, ts("2024-01-01 00:00:00"), 1, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:30"), 1, "a", 1.0), // same session
      Ev(3, ts("2024-01-01 00:05:00"), 1, "a", 1.0)) // new session
    runAll(q)
    in.addData(Ev(9, ts("2024-01-01 01:00:00"), 2, "z", 0.0)) // close all
    runAll(q)
    q.stop()
    val got = spark.table(name).as[(String, String, Long, Long)].collect().toSet
    assert(got.contains(("2024-01-01 00:00:00", "2024-01-01 00:01:30", 1L, 2L)))
    assert(got.contains(("2024-01-01 00:05:00", "2024-01-01 00:06:00", 1L, 1L)))
  }

  test("streaming CUMULATE (update mode) converges to the batch result") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val agg = graft.operators.WindowOps
      .cumulate(in.toDF(), $"ts", 900L, 3600L)
      .groupBy($"window_start", $"window_end")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    val evs = Seq(
      Ev(1, ts("2024-01-01 10:05:00"), 1, "a", 1.0),
      Ev(2, ts("2024-01-01 10:20:00"), 1, "a", 1.0),
      Ev(3, ts("2024-01-01 10:40:00"), 2, "b", 1.0))
    in.addData(evs.take(2): _*)
    runAll(q)
    in.addData(evs.drop(2): _*)
    runAll(q)
    q.stop()
    // latest update per window == batch cumulate over the full input
    val streamed = spark.table(name)
      .groupBy($"window_end").agg(max($"n").as("n")) // last update wins (n only grows)
      .select($"window_end".cast("string"), $"n")
      .as[(String, Long)].collect().toMap
    val batch = graft.operators.WindowOps
      .cumulate(evs.toDF(), $"ts", 900L, 3600L)
      .groupBy($"window_end").agg(count(lit(1)).as("n"))
      .select($"window_end".cast("string"), $"n")
      .as[(String, Long)].collect().toMap
    assert(streamed == batch)
  }

  test("CountWindows: every N rows per key emit one window") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val cw = CountWindows.tumbling(in.toDS(), 2)(_.user_id)
      .map(w => (w.key, w.window_no, w.rows.map(_.event_id).mkString(",")))
      .toDF("key", "window_no", "ids")
    val q = cw.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData(
      Ev(1, ts("2024-01-01 00:00:01"), 1, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:02"), 1, "a", 2.0),
      Ev(3, ts("2024-01-01 00:00:03"), 1, "a", 3.0)) // 3 stays buffered
    runAll(q)
    in.addData(Ev(4, ts("2024-01-01 00:00:04"), 1, "a", 4.0)) // completes w1
    runAll(q)
    q.stop()
    val got = spark.table(name).as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 0L, "1,2"), (1L, 1L, "3,4")))
  }

  test("CountWindows.deltaTriggered fires when the measure jumps past the threshold") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val dw = CountWindows.deltaTriggered(in.toDS(), threshold = 5.0)(
        _.user_id, _.value)
      .map(w => (w.key, w.window_no, w.rows.map(_.event_id).mkString(",")))
      .toDF("key", "window_no", "ids")
    val q = dw.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData(
      Ev(1, ts("2024-01-01 00:00:01"), 1, "a", 10.0), // reference, no fire
      Ev(2, ts("2024-01-01 00:00:02"), 1, "a", 12.0), // |12-10|=2: buffer
      Ev(3, ts("2024-01-01 00:00:03"), 1, "a", 16.0)) // |16-10|=6: fire w0
    runAll(q)
    in.addData(
      Ev(4, ts("2024-01-01 00:00:04"), 1, "a", 18.0), // |18-16|=2: buffer
      Ev(5, ts("2024-01-01 00:00:05"), 1, "a", 30.0)) // |30-16|=14: fire w1
    runAll(q)
    q.stop()
    val got = spark.table(name).as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 0L, "1,2,3"), (1L, 1L, "4,5")))
  }

  test("deltaTriggered with CountEvictor keeps only the last N buffered rows") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val dw = CountWindows.deltaTriggered(in.toDS(), threshold = 5.0,
        maxBuffer = Some(2))(_.user_id, _.value)
      .map(w => (w.key, w.window_no, w.rows.map(_.event_id).mkString(",")))
      .toDF("key", "window_no", "ids")
    val q = dw.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData(
      Ev(1, ts("2024-01-01 00:00:01"), 1, "a", 10.0), // reference
      Ev(2, ts("2024-01-01 00:00:02"), 1, "a", 11.0), // buffer [1,2]
      Ev(3, ts("2024-01-01 00:00:03"), 1, "a", 12.0), // evict 1 -> [2,3]
      Ev(4, ts("2024-01-01 00:00:04"), 1, "a", 20.0)) // fire: last 2 = [3,4]
    runAll(q)
    q.stop()
    val got = spark.table(name).as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 0L, "3,4")))
  }

  test("CountWindows.firstN passes only the first N rows per key") {
    val in = MemoryStream[Ev]
    val name = nextName()
    val fn = CountWindows.firstN(in.toDS(), 2)(_.user_id)
    val q = fn.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData(
      Ev(1, ts("2024-01-01 00:00:01"), 1, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:02"), 1, "a", 2.0))
    runAll(q)
    in.addData(Ev(3, ts("2024-01-01 00:00:03"), 1, "a", 3.0)) // over quota
    runAll(q)
    in.addData(Ev(4, ts("2024-01-01 00:00:04"), 2, "b", 4.0)) // fresh key
    runAll(q)
    q.stop()
    val got = spark.table(name).select($"event_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L))
  }

  test("ChangelogAgg: retractions adjust the aggregate; emptied group deletes") {
    val in = MemoryStream[(String, Long, Double)] // (kind, key, value)
    val name = nextName()
    val agg = ChangelogAgg.sumCount(in.toDS())(_._2, _._1, _._3)
      .map(u => (u.row_kind, u.key, u.sum, u.count))
      .toDF("kind", "key", "sum", "count")
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    in.addData(("+I", 1L, 10.0), ("+I", 1L, 5.0))
    runAll(q)
    in.addData(("-D", 1L, 10.0)) // retract the 10
    runAll(q)
    in.addData(("-D", 1L, 5.0)) // group empties -> -D
    runAll(q)
    q.stop()
    val got = spark.table(name).as[(String, Long, Double, Long)].collect().toSeq
    assert(got == Seq(("+U", 1L, 15.0, 2L), ("+U", 1L, 5.0, 1L),
      ("-D", 1L, 0.0, 0L)))
  }

  test("streaming temporal as-of join: version current at probe EVENT time") {
    val pIn = MemoryStream[Ev] // probes: orders
    val vIn = MemoryStream[Ev] // versions: rates keyed by user_id
    val joined = StreamingTemporalJoin.asOf(pIn.toDS(), vIn.toDS())(
      _.user_id, _.ts.getTime, _.event_id, _.user_id, _.ts.getTime)
      .map { case (p, v) => (p.event_id, v.map(_.value).getOrElse(-1.0)) }
      .toDF("probe_id", "rate")
    val q = joined.writeStream.format("memory").queryName("stj")
      .outputMode("append").start()
    // versions: rate 100 @00:00, 200 @01:00; probes out of version order
    vIn.addData(
      Ev(90, ts("2024-01-01 00:00:00"), 7, "v", 100.0),
      Ev(91, ts("2024-01-01 01:00:00"), 7, "v", 200.0))
    pIn.addData(
      Ev(1, ts("2024-01-01 00:30:00"), 7, "p", 0.0), // sees 100
      Ev(2, ts("2024-01-01 01:30:00"), 7, "p", 0.0)) // sees 200
    q.processAllAvailable()
    // advance BOTH watermarks past the probes
    vIn.addData(Ev(99, ts("2024-01-01 05:00:00"), 8, "v", 0.0))
    pIn.addData(Ev(98, ts("2024-01-01 05:00:00"), 9, "p", 0.0))
    q.processAllAvailable()
    // flush once more so the last probe's timer fires
    vIn.addData(Ev(97, ts("2024-01-01 08:00:00"), 8, "v", 0.0))
    pIn.addData(Ev(96, ts("2024-01-01 08:00:00"), 9, "p", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("stj").as[(Long, Double)].collect().toMap
    assert(got(1L) == 100.0, got)
    assert(got(2L) == 200.0, got)
  }

  test("temporal join: probe arriving BEFORE its version still joins it") {
    val pIn = MemoryStream[Ev]
    val vIn = MemoryStream[Ev]
    val joined = StreamingTemporalJoin.asOf(pIn.toDS(), vIn.toDS())(
      _.user_id, _.ts.getTime, _.event_id, _.user_id, _.ts.getTime)
      .map { case (p, v) => (p.event_id, v.map(_.value).getOrElse(-1.0)) }
      .toDF("probe_id", "rate")
    val name = nextName()
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    // probe ARRIVES first; its version (earlier event time) arrives later
    pIn.addData(Ev(1, ts("2024-01-01 02:00:00"), 7, "p", 0.0))
    q.processAllAvailable()
    vIn.addData(Ev(90, ts("2024-01-01 01:00:00"), 7, "v", 123.0))
    q.processAllAvailable()
    // watermark can only reach the probe once BOTH sources advance
    pIn.addData(Ev(98, ts("2024-01-01 06:00:00"), 9, "p", 0.0))
    vIn.addData(Ev(99, ts("2024-01-01 06:00:00"), 8, "v", 0.0))
    q.processAllAvailable()
    pIn.addData(Ev(96, ts("2024-01-01 09:00:00"), 9, "p", 0.0))
    vIn.addData(Ev(97, ts("2024-01-01 09:00:00"), 8, "v", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).as[(Long, Double)].collect().toMap
    assert(got(1L) == 123.0, got) // the late-arriving version was waited for
  }

  test("stream-stream interval join matches the batch interval join") {
    val in1 = MemoryStream[Ev]
    val in2 = MemoryStream[Ev]
    val name = nextName()
    val l = in1.toDF().withWatermark("ts", "10 seconds")
      .select($"user_id", $"ts".as("p_ts"), $"event_id".as("purchase_id"))
    val r = in2.toDF().withWatermark("ts", "10 seconds")
      .select($"user_id", $"ts".as("c_ts"), $"event_id".as("click_id"))
    val joined = StreamOps.intervalJoin(l, r, "user_id", "p_ts", "c_ts",
        before = "30 MINUTES", after = "0 SECONDS")
      .select($"purchase_id", $"click_id")
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in2.addData(
      Ev(10, ts("2024-01-01 00:40:00"), 1, "click", 0.0),
      Ev(11, ts("2024-01-01 00:05:00"), 1, "click", 0.0))
    in1.addData(Ev(1, ts("2024-01-01 01:00:00"), 1, "purchase", 0.0))
    runAll(q)
    q.stop()
    val got = spark.table(name).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L))) // click at 00:05 is outside the 30-min window
  }

  test("procTimeSorted delivers each micro-batch sorted on the secondary keys") {
    val in = MemoryStream[Ev]
    val got = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    val q = StreamOps.procTimeSorted(in.toDF(), Seq($"value".asc, $"event_id".asc)) {
      b => got.synchronized {
        got += b.select($"event_id").as[Long].collect().toSeq; ()
      }
    }.start()
    in.addData( // arrival order 3,1,2 within one proctime tick
      Ev(3, ts("2024-01-01 00:00:03"), 1, "a", 30.0),
      Ev(1, ts("2024-01-01 00:00:01"), 1, "a", 10.0),
      Ev(2, ts("2024-01-01 00:00:02"), 1, "a", 20.0))
    q.processAllAvailable()
    in.addData(Ev(5, ts("2024-01-01 00:00:05"), 1, "a", 50.0),
      Ev(4, ts("2024-01-01 00:00:04"), 1, "a", 40.0))
    q.processAllAvailable()
    q.stop()
    // each tick's buffer emitted sorted; ticks keep arrival order
    assert(got.filter(_.nonEmpty).toSeq == Seq(Seq(1L, 2L, 3L), Seq(4L, 5L)))
  }

  test("file source: offset state is exactly-once across restarts (Kafka-offset analog)") {
    // The reference's connector tests pin offset checkpointing +
    // exactly-once delivery (KafkaSource.java:87). No broker exists in
    // this container, but Spark's FILE source exercises the identical
    // contract — source offsets (seen-files log) live in the
    // checkpoint, the sink commit log dedups replays — so this test
    // closes the semantics claim on the same readStream path a Kafka
    // config would use.
    val inDir = java.nio.file.Files.createTempDirectory("graft_fsrc_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fsrc_ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_fsrc_out").toString
    def feed(rows: (Long, String)*): Unit =
      rows.toSeq.toDF("id", "v").coalesce(1)
        .write.mode("append").parquet(inDir)
    def hop(): Unit = {
      val src = spark.readStream
        .schema("id LONG, v STRING").parquet(inDir)
      val q = src.writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(30000); q.stop()
    }
    feed((1L, "a"), (2L, "b"))
    hop() // run 1 processes the first two files
    feed((3L, "c")) // arrives while the query is "down"
    hop() // restart from the SAME checkpoint: only the new file
    hop() // replay with nothing new: must add nothing
    val out = spark.read.parquet(outDir).select($"id").as[Long].collect().toSeq
    assert(out.sorted == Seq(1L, 2L, 3L),
      s"each row exactly once across restarts, got $out")
  }

  test("streaming CDC ingestion: file-source debezium envelopes -> decode " +
      "-> upsert snapshot, exactly-once across two restarts") {
    // The full CDC apply pipeline end-to-end on the durable path the
    // reference runs in production: envelope files (the Kafka-topic
    // stand-in, same readStream contract) -> DebeziumJson.decode ->
    // Sinks.upsert with tombstones. The checkpoint carries BOTH the
    // source offsets and the sink's idempotence across restarts: each
    // restart must apply exactly the unseen envelopes, and a replay
    // hop with nothing new must change nothing.
    import org.apache.spark.sql.types._
    val payload = new StructType()
      .add("id", LongType).add("v", StringType)
    val inDir = java.nio.file.Files.createTempDirectory("graft_cdcsrc_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdcsrc_ck").toString
    val snapDir = java.nio.file.Files.createTempDirectory("graft_cdcsrc_s").toString + "/t"
    var fileNo = 0
    def feed(lines: String*): Unit = {
      fileNo += 1
      java.nio.file.Files.write(
        java.nio.file.Paths.get(inDir, s"env_$fileNo.json"),
        lines.mkString("\n").getBytes("UTF-8"))
      ()
    }
    def hop(): Unit = {
      val changelog = graft.sources.DebeziumJson
        .decode(spark.readStream.text(inDir), payload)
        .filter($"kind" =!= "-U")
        .withColumn("__del", $"kind" === "-D").drop("kind")
      val q = Sinks.upsert(changelog, Seq("id"), "ts_ms", snapDir,
          tombstoneCol = Some("__del"))
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(30000); q.stop()
    }
    def snap() = Sinks.readSnapshot(spark, snapDir)
      .select($"id", $"v").as[(Long, String)].collect().toSet

    feed(
      """{"after":{"id":1,"v":"a"},"op":"c","ts_ms":1}""",
      """{"after":{"id":2,"v":"b"},"op":"c","ts_ms":1}""")
    hop() // run 1: initial inserts
    assert(snap() == Set((1L, "a"), (2L, "b")))
    feed( // arrives while the query is "down"
      """{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"a2"},"op":"u","ts_ms":2}""",
      """{"before":{"id":2,"v":"b"},"op":"d","ts_ms":2}""",
      """{"after":{"id":3,"v":"c"},"op":"c","ts_ms":2}""")
    hop() // restart 1: applies exactly the unseen envelope file
    assert(snap() == Set((1L, "a2"), (3L, "c")),
      s"update+delete+insert applied once: ${snap()}")
    hop() // restart 2: nothing new — must be a no-op
    assert(snap() == Set((1L, "a2"), (3L, "c")),
      s"idle restart must not change the snapshot: ${snap()}")
  }

  test("streaming CDC ingestion: canal and maxwell envelopes run the " +
      "SAME decode -> upsert pipeline exactly-once across a restart") {
    // The two non-debezium envelopes through the identical durable
    // path (decode is the only format-specific stage — the checkpoint
    // offsets and the upsert idempotence are shared plumbing, and this
    // pins that each decode is restart-safe, not just batch-correct).
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.DataFrame
    val payload = new StructType()
      .add("id", LongType).add("v", StringType)
    case class Env(name: String,
        decode: DataFrame => DataFrame,
        insert1: Seq[String], updateDelete: Seq[String])
    val cases = Seq(
      Env("canal",
        raw => graft.sources.CanalJson.decode(raw, payload),
        Seq("""{"data":[{"id":1,"v":"a"},{"id":2,"v":"b"}],"type":"INSERT","ts":1}"""),
        Seq("""{"data":[{"id":1,"v":"a2"}],"old":[{"v":"a"}],"type":"UPDATE","ts":2}""",
          """{"data":[{"id":2,"v":"b"}],"type":"DELETE","ts":2}""",
          """{"data":[{"id":3,"v":"c"}],"type":"INSERT","ts":2}""")),
      Env("maxwell",
        raw => graft.sources.MaxwellJson.decode(raw, payload),
        Seq("""{"data":{"id":1,"v":"a"},"type":"insert","ts":1}""",
          """{"data":{"id":2,"v":"b"},"type":"insert","ts":1}"""),
        Seq("""{"data":{"id":1,"v":"a2"},"old":{"v":"a"},"type":"update","ts":2}""",
          """{"data":{"id":2,"v":"b"},"type":"delete","ts":2}""",
          """{"data":{"id":3,"v":"c"},"type":"insert","ts":2}""")))
    cases.foreach { env =>
      val inDir = java.nio.file.Files
        .createTempDirectory(s"graft_${env.name}_in").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_${env.name}_ck").toString
      val snapDir = java.nio.file.Files
        .createTempDirectory(s"graft_${env.name}_s").toString + "/t"
      var fileNo = 0
      def feed(ls: Seq[String]): Unit = {
        fileNo += 1
        java.nio.file.Files.write(
          java.nio.file.Paths.get(inDir, s"env_$fileNo.json"),
          ls.mkString("\n").getBytes("UTF-8"))
        ()
      }
      def hop(): Unit = {
        val changelog = env.decode(spark.readStream.text(inDir))
          .filter($"kind" =!= "-U")
          .withColumn("__del", $"kind" === "-D").drop("kind")
        val q = Sinks.upsert(changelog, Seq("id"), "ts_ms", snapDir,
            tombstoneCol = Some("__del"))
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(30000); q.stop()
      }
      def snap() = Sinks.readSnapshot(spark, snapDir)
        .select($"id", $"v").as[(Long, String)].collect().toSet
      feed(env.insert1)
      hop()
      assert(snap() == Set((1L, "a"), (2L, "b")), s"${env.name}: ${snap()}")
      feed(env.updateDelete)
      hop() // restart: applies exactly the unseen file
      assert(snap() == Set((1L, "a2"), (3L, "c")),
        s"${env.name} update+delete+insert applied once: ${snap()}")
    }
  }

  test("withIdleKeepalive: event-time windows close while every real source is idle") {
    // Two-source union, one source NEVER produces and the other goes
    // quiet after two events. Without keepalives the watermark freezes
    // at (base+1s - 1s) and the window stays open forever — the exact
    // stall WatermarksWithIdleness exists to break.
    val active = MemoryStream[Ev]
    val silent = MemoryStream[Ev]
    val name = nextName()
    val unioned = active.toDF().unionByName(silent.toDF())
    val agg = StreamOps.dropKeepalives(
        StreamOps.withIdleKeepalive(unioned, "ts", rowsPerSecond = 10)
          .withWatermark("ts", "1 second"))
      .groupBy(window($"ts", "5 seconds"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val base = System.currentTimeMillis() - 60000L // a minute in the past
    active.addData(Ev(1, new Timestamp(base), 1, "a", 1.0),
      Ev(2, new Timestamp(base + 1000), 1, "a", 2.0))
    // no processAllAvailable: the rate keepalive feeds batches on its
    // own; poll the sink until the window emits (or a 60s deadline)
    val deadline = System.currentTimeMillis() + 60000
    while (spark.table(name).isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
    q.stop()
    val rows = spark.table(name).select($"n").as[Long].collect()
    assert(rows.nonEmpty,
      "window never closed: keepalives did not advance the watermark")
    assert(rows.sum == 2, "keepalive rows must not be counted")
  }

  test("alignedRelease: a source running ahead is parked until the " +
      "min-policy watermark catches up within the drift bound") {
    val slow = MemoryStream[Ev]
    val fast = MemoryStream[Ev]
    val name = nextName()
    // separate watermarks per source; default multipleWatermarkPolicy
    // = min, so the union's watermark is the SLOW source's
    val unioned = slow.toDF().withWatermark("ts", "0 seconds")
      .unionByName(fast.toDF().withWatermark("ts", "0 seconds"))
      .as[Ev]
    val aligned = StreamOps.alignedRelease(unioned, maxDriftMs = 60000L)(
      _.event_type, _.ts.getTime)
    val q = aligned.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def ids() = spark.table(name).select($"event_id").as[Long]
      .collect().toSet

    // fast source is an hour ahead of slow
    slow.addData(Ev(1, ts("2024-01-01 00:00:10"), 1, "slow", 1.0))
    fast.addData(Ev(2, ts("2024-01-01 01:00:00"), 2, "fast", 2.0))
    q.processAllAvailable()
    slow.addData(Ev(3, ts("2024-01-01 00:00:20"), 1, "slow", 1.0))
    q.processAllAvailable()
    assert(ids() == Set(1L, 3L),
      s"fast row must stay parked while drift > 60s, got ${ids()}")

    // slow source catches up to within the drift bound -> the parked
    // fast row's event-time timer fires and releases it
    slow.addData(Ev(4, ts("2024-01-01 00:59:30"), 1, "slow", 1.0))
    q.processAllAvailable()
    slow.addData(Ev(5, ts("2024-01-01 00:59:40"), 1, "slow", 1.0))
    q.processAllAvailable()
    q.stop()
    assert(ids().contains(2L),
      s"fast row must be released once drift <= 60s, got ${ids()}")
    assert(ids() == Set(1L, 2L, 3L, 4L, 5L), s"exactly-once: ${ids()}")
  }
}
