package graft

import graft.streaming.{Lookup, Sinks}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("upsert sink keeps latest row per key across micro-batches") {
    val dir = Files.createTempDirectory("graft_upsert").toString + "/t"
    val in = MemoryStream[Ev]
    val q = Sinks.upsert(in.toDF(), Seq("user_id"), "event_id", dir)
      .queryName("upsert1").start()
    in.addData(
      Ev(1, ts("2024-01-01 00:00:01"), 7, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:02"), 8, "b", 2.0))
    q.processAllAvailable()
    in.addData(Ev(3, ts("2024-01-01 00:00:03"), 7, "c", 3.0)) // upserts key 7
    q.processAllAvailable()
    q.stop()
    val snap = spark.read.parquet(dir)
      .select($"user_id", $"event_id", $"event_type")
      .as[(Long, Long, String)].collect().toSet
    assert(snap == Set((7L, 3L, "c"), (8L, 2L, "b")))
  }

  test("upsert sink rewrites only the buckets touched by a micro-batch") {
    val dir = Files.createTempDirectory("graft_upsert_b").toString + "/t"
    val in = MemoryStream[Ev]
    val q = Sinks.upsert(in.toDF(), Seq("user_id"), "event_id", dir, buckets = 16)
      .queryName("upsert_b").start()
    in.addData(
      Ev(1, ts("2024-01-01 00:00:01"), 7, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:02"), 8, "b", 2.0))
    q.processAllAvailable()
    val Seq(b7, b8) = Seq(7L, 8L).map { k =>
      spark.range(1)
        .select(pmod(xxhash64(lit(k)), lit(16L)).cast("int")).as[Int].head()
    }
    assume(b7 != b8) // keys 7 and 8 land in different buckets
    def files(b: Int): Set[String] = {
      val d = new java.io.File(s"$dir/__bucket=$b")
      if (!d.exists()) Set.empty
      else d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    val before7 = files(b7); val before8 = files(b8)
    assert(before7.nonEmpty && before8.nonEmpty)
    in.addData(Ev(3, ts("2024-01-01 00:00:03"), 7, "c", 3.0)) // touches only b7
    q.processAllAvailable()
    q.stop()
    assert(files(b8) == before8, "untouched bucket must not be rewritten")
    assert(files(b7) != before7, "touched bucket must be rewritten")
    val snap = Sinks.readSnapshot(spark, dir)
      .select($"user_id", $"event_id", $"event_type")
      .as[(Long, Long, String)].collect().toSet
    assert(snap == Set((7L, 3L, "c"), (8L, 2L, "b")))
  }

  test("side outputs route a batch into main + error channels") {
    val base = Files.createTempDirectory("graft_side").toString
    val in = MemoryStream[Ev]
    val q = Sinks.sideOutputs(in.toDF(), Seq(
      ("main", col("event_type") =!= "error", s"$base/main"),
      ("errors", col("event_type") === "error", s"$base/errors")))
      .queryName("side1").start()
    in.addData(
      Ev(1, ts("2024-01-01 00:00:01"), 1, "view", 1.0),
      Ev(2, ts("2024-01-01 00:00:02"), 1, "error", 0.0),
      Ev(3, ts("2024-01-01 00:00:03"), 2, "click", 2.0))
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(s"$base/main").count() == 2)
    assert(spark.read.parquet(s"$base/errors")
      .select($"event_id").as[Long].head() == 2L)
  }

  test("async lookup enriches rows through a (fake) external service") {
    val got = Sinks.asyncLookup(Seq(1, 2, 3).toDS(), maxInFlight = 2) { i =>
      Thread.sleep(5); (i, s"name_$i") // stands in for an RPC
    }.collect().toSet
    assert(got == Set((1, "name_1"), (2, "name_2"), (3, "name_3")))
  }

  test("late rows are captured to the side output, not dropped") {
    val base = Files.createTempDirectory("graft_late").toString
    val in = MemoryStream[Ev]
    val q = graft.streaming.LateData.sideOutputLate(in.toDF(), "ts",
      delayMs = 5000, s"$base/main", s"$base/late")
      .queryName("late1").start()
    in.addData(Ev(1, ts("2024-01-01 00:00:10"), 7, "a", 1.0))
    q.processAllAvailable() // watermark becomes 00:00:10 - 5s = 00:00:05
    in.addData(
      Ev(2, ts("2024-01-01 00:00:01"), 7, "a", 2.0), // behind watermark
      Ev(3, ts("2024-01-01 00:00:12"), 7, "a", 3.0)) // on time
    q.processAllAvailable()
    q.stop()
    val main = spark.read.parquet(s"$base/main")
      .select($"event_id").as[Long].collect().toSet
    val late = spark.read.parquet(s"$base/late")
      .select($"event_id").as[Long].collect().toSet
    assert(main == Set(1L, 3L))
    assert(late == Set(2L))
  }

  test("late-data capture routes null-ts rows to the late sink") {
    val base = Files.createTempDirectory("graft_late_null").toString
    val in = MemoryStream[Ev]
    val q = graft.streaming.LateData.sideOutputLate(in.toDF(), "ts",
      delayMs = 5000, s"$base/main", s"$base/late")
      .queryName("late_null").start()
    // a null ts has no position vs any watermark: it must land in the
    // late sink, not vanish from both
    in.addData(Ev(1, ts("2024-01-01 00:00:10"), 7, "a", 1.0),
      Ev(2, null, 7, "a", 2.0))
    q.processAllAvailable()
    q.stop()
    val main = spark.read.parquet(s"$base/main")
      .select($"event_id").as[Long].collect().toSet
    val late = spark.read.parquet(s"$base/late")
      .select($"event_id").as[Long].collect().toSet
    assert(main == Set(1L))
    assert(late == Set(2L))
  }

  test("allowedLateness refinement: a late row updates the already-emitted window") {
    val base = Files.createTempDirectory("graft_refine").toString
    val in = MemoryStream[Ev]
    val q = graft.streaming.LateData.refiningWindowAgg(in.toDF(), "ts",
      "1 minute", delayMs = 5000, latenessMs = 600000,
      keys = Seq("user_id"), sumCols = Seq("value"), s"$base/result")
      .queryName("refine1").start()
    in.addData(Ev(1, ts("2024-01-01 00:00:10"), 7, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:20"), 7, "a", 2.0))
    q.processAllAvailable() // window 00:00 emitted with cnt=2 sum=3
    in.addData(Ev(3, ts("2024-01-01 00:05:00"), 8, "b", 5.0))
    q.processAllAvailable() // watermark -> 00:04:55: window 00:00 is closed
    // late row BEHIND the watermark but inside the 10-min lateness
    // horizon: must RE-FIRE window 00:00 with the corrected aggregate
    in.addData(Ev(4, ts("2024-01-01 00:00:30"), 7, "a", 10.0))
    q.processAllAvailable()
    in.addData(Ev(5, ts("2024-01-01 00:30:00"), 9, "c", 0.0))
    q.processAllAvailable() // watermark -> 00:29:55, horizon -> 00:19:55
    // beyond the lateness horizon: dropped, exactly like Flink
    in.addData(Ev(6, ts("2024-01-01 00:00:40"), 7, "a", 100.0))
    q.processAllAvailable()
    q.stop()
    val res = graft.streaming.LateData.readRefined(spark, s"$base/result")
      .filter($"user_id" === 7)
      .select($"window_start".cast("string"), $"cnt", $"sum_value")
      .as[(String, Long, Double)].collect().toSeq
    assert(res == Seq(("2024-01-01 00:00:00", 3L, 13.0)),
      s"late row must merge (1+2+10), beyond-lateness row must not: $res")
  }

  test("lookup retry does not retry an interrupt and restores the flag") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val f = Lookup.withRetry(Lookup.RetryPolicy(maxAttempts = 3, delayMs = 0)) {
      (_: Int) => calls.incrementAndGet(); throw new InterruptedException("cancel")
    }
    intercept[InterruptedException] { f(1) }
    assert(calls.get() == 1, "task cancellation must not be retried")
    assert(Thread.interrupted(), "interrupt status must be restored")
  }

  test("broadcast rules: pre-snapshot batches already carry the rule columns") {
    import graft.streaming.BroadcastRules
    import org.apache.spark.sql.types._
    // rulesPath never materialized: every batch joins the empty frame
    val rulesPath = Files.createTempDirectory("graft_rules_pre").toString + "/nope"
    val rulesSchema = StructType(Seq(StructField("user_id", LongType),
      StructField("tier", StringType), StructField("seq", LongType)))
    val data = MemoryStream[Ev]
    val seen = scala.collection.mutable.ArrayBuffer[(Seq[String], Seq[Option[String]])]()
    val q = BroadcastRules.enrich(data.toDF(), rulesPath, Seq("user_id"),
        rulesSchema) { (df, _) =>
      seen.synchronized {
        seen += ((df.schema.fieldNames.toSeq,
          df.select($"tier").as[Option[String]].collect().toSeq))
      }
    }.queryName("rules_pre").start()
    data.addData(Ev(1, ts("2024-01-01 00:00:01"), 7, "a", 1.0))
    q.processAllAvailable()
    q.stop()
    val batches = seen.filter(_._2.nonEmpty)
    assert(batches.nonEmpty)
    // schema is stable from batch 0 (rule columns present, all-null)
    assert(batches.forall(_._1.contains("tier")))
    assert(batches.forall(_._2.forall(_.isEmpty)))
  }

  test("lookup retry recovers from transient failures") {
    LookupProbe.attempts.clear()
    val f = Lookup.withRetry(Lookup.RetryPolicy(maxAttempts = 3, delayMs = 1))(
      LookupProbe.flaky)
    val got = Sinks.asyncLookup(Seq(1, 2, 3).toDS(), maxInFlight = 2)(f)
      .collect().toSet
    assert(got == Set((1, "v1"), (2, "v2"), (3, "v3")))
  }

  test("lookup retry gives up after maxAttempts") {
    LookupProbe.attempts.clear()
    // flaky needs 3 attempts; 2 are allowed -> the task must fail
    val f = Lookup.withRetry(Lookup.RetryPolicy(maxAttempts = 2, delayMs = 0))(
      LookupProbe.flaky)
    intercept[Exception] {
      Sinks.asyncLookup(Seq(9).toDS(), maxInFlight = 1)(f).collect()
    }
  }

  test("executor-shared lookup cache serves repeats without re-fetching") {
    Lookup.invalidate("dim_test")
    LookupProbe.calls.set(0)
    val f = Lookup.cached("dim_test", maxRows = 100)(LookupProbe.counting)
    val rows = (1 to 50).map(_ % 5) // 5 distinct keys, 50 rows
    // single partition + 1 in flight: deterministic miss-per-key count
    val got = Sinks.asyncLookup(rows.toDS().repartition(1), maxInFlight = 1)(f)
      .collect()
    assert(got.length == 50)
    assert(LookupProbe.calls.get() == 5, "each distinct key fetched once")
    assert(Lookup.missCount("dim_test") == 5)
    assert(Lookup.hitCount("dim_test") == 45)
  }

  test("broadcast rules: control-stream updates reach later data batches") {
    import graft.streaming.BroadcastRules
    val rulesPath = Files.createTempDirectory("graft_rules").toString + "/r"
    val ctrl = MemoryStream[(Long, String, Long)]
    val ctrlQ = BroadcastRules.materialize(
      ctrl.toDS().toDF("user_id", "tier", "seq"),
      Seq("user_id"), "seq", rulesPath)
      .queryName("rules_m").start()
    ctrl.addData((7L, "gold", 1L))
    ctrlQ.processAllAvailable()

    val data = MemoryStream[Ev]
    val got = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val rulesSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tier", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType)))
    val dataQ = BroadcastRules.enrich(data.toDF(), rulesPath, Seq("user_id"),
        rulesSchema) {
      (df, _) =>
        got.synchronized {
          got ++= df.select($"event_id", $"tier").as[(Long, String)].collect()
        }
        ()
    }.queryName("rules_e").start()
    data.addData(Ev(1, ts("2024-01-01 00:00:01"), 7, "a", 1.0))
    dataQ.processAllAvailable()
    ctrl.addData((7L, "silver", 2L)) // rule update mid-stream
    ctrlQ.processAllAvailable()
    data.addData(Ev(2, ts("2024-01-01 00:00:02"), 7, "a", 2.0))
    dataQ.processAllAvailable()
    ctrlQ.stop(); dataQ.stop()
    assert(got.toSet == Set((1L, "gold"), (2L, "silver")))
  }

  test("stream-static (broadcast-state) join enriches a stream from a table") {
    val in = MemoryStream[Ev]
    val dim = Seq((7L, "gold"), (8L, "silver")).toDF("user_id", "tier")
    val joined = in.toDF().join(broadcast(dim), Seq("user_id"), "left")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    in.addData(
      Ev(1, ts("2024-01-01 00:00:01"), 7, "a", 1.0),
      Ev(2, ts("2024-01-01 00:00:02"), 9, "b", 2.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ss_join").select($"event_id", $"tier")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "gold"), (2L, null)))
  }

  test("end-to-end streaming CDC: debezium lines -> decode -> upsert " +
      "materialization with DELETE tombstones, replay-idempotent") {
    import org.apache.spark.sql.types._
    val payload = new StructType()
      .add("id", LongType).add("v", StringType)
    val dir = Files.createTempDirectory("graft_cdc").toString + "/t"
    val in = MemoryStream[String]
    // the full pipeline a Kafka CDC topic would drive: decode the
    // envelope, drop the -U retraction half (upsert keeps state by
    // key), tombstone on -D
    def pipeline = graft.sources.DebeziumJson
      .decode(in.toDF(), payload)
      .filter($"kind" =!= "-U")
      .withColumn("__del", $"kind" === "-D").drop("kind")
    val q = Sinks.upsert(pipeline, Seq("id"), "ts_ms", dir,
      tombstoneCol = Some("__del")).queryName("cdc1").start()
    in.addData(
      """{"after":{"id":1,"v":"a"},"op":"c","ts_ms":1}""",
      """{"after":{"id":2,"v":"b"},"op":"c","ts_ms":1}""")
    q.processAllAvailable()
    in.addData( // second micro-batch: update 1, delete 2, insert 3
      """{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"a2"},"op":"u","ts_ms":2}""",
      """{"before":{"id":2,"v":"b"},"op":"d","ts_ms":2}""",
      """{"after":{"id":3,"v":"c"},"op":"c","ts_ms":2}""")
    q.processAllAvailable()
    q.stop()
    def snap() = Sinks.readSnapshot(spark, dir)
      .select($"id", $"v").as[(Long, String)].collect().toSet
    assert(snap() == Set((1L, "a2"), (3L, "c")),
      s"deleted key must leave the snapshot: ${snap()}")
    // replay the ENTIRE history through a fresh query against the same
    // snapshot dir (a restart-from-zero): keep-latest-by-seq makes the
    // materialization idempotent — state must not change
    val q2 = Sinks.upsert(pipeline, Seq("id"), "ts_ms", dir,
      tombstoneCol = Some("__del")).queryName("cdc2").start()
    q2.processAllAvailable()
    q2.stop()
    assert(snap() == Set((1L, "a2"), (3L, "c")),
      s"full-history replay must be a no-op: ${snap()}")
  }
}

/** Static probes shared with executor code (same JVM under local[*]). */
object LookupProbe {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  val attempts = new java.util.concurrent.ConcurrentHashMap[
    Int, java.util.concurrent.atomic.AtomicInteger]()
  /** Succeeds on the 3rd attempt per key. */
  def flaky(i: Int): (Int, String) = {
    val a = attempts.computeIfAbsent(i,
      _ => new java.util.concurrent.atomic.AtomicInteger(0)).incrementAndGet()
    if (a < 3) throw new RuntimeException(s"transient failure for $i")
    (i, s"v$i")
  }
  def counting(i: Int): (Int, String) = { calls.incrementAndGet(); (i, s"v$i") }
}
