package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming throughput benchmark: drives the core stateful operators
  * with MemoryStream batches and reports steady-state rows/second per
  * operator as ONE JSON line (same contract style as [[Bench]]).
  *
  * What this measures: single-node end-to-end micro-batch throughput
  * of the operator pipeline (ingest -> stateful transform -> memory
  * sink), the number a capacity plan divides by. The reference
  * publishes no absolute numbers (BASELINE.md) — Flink 1.16 single-node
  * stateful ops are commonly cited in the 10^5..10^6 events/s range;
  * these runs land in the same class despite micro-batch overheads.
  *
  * Each operator processes `batches` x `rowsPerBatch` events after a
  * warmup pass; rows/sec = total events / wall time of the measured
  * span. MemoryStream feeds data pre-materialized on the driver so
  * generation cost stays out of the measurement.
  */
object StreamBench {
  case class E(id: Long, ts: java.sql.Timestamp, k: Long, v: Double)
  case class Doc(doc_id: Long, source: String, text: String)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // State-store backend: the default HDFS-backed provider keeps state
    // as in-heap immutable maps (fast, memory-bound); RocksDB keeps it
    // off-heap on disk (bounded heap, the backend Flink's comparably
    // cited numbers assume). SPARK_GRAFT_STATE_STORE=rocksdb switches —
    // COVERAGE.md documents both measurements.
    val stateStore = sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "hdfs")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (stateStore == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark: SparkSession = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rowsPerBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS", "500000").toInt
    val batches = 5
    val keys = 1000

    def events(batch: Int): Seq[E] = {
      val base = batch.toLong * rowsPerBatch
      (0 until rowsPerBatch).map { i =>
        val id = base + i
        E(id, new java.sql.Timestamp(1700000000000L + id * 10), id % keys,
          (id % 97).toDouble)
      }
    }

    // Synthetic doc stream for the near-dup gate: 12 tokens from a 40k
    // vocab per doc, deterministic by doc_id. Every 10th doc reuses an
    // earlier doc's token recipe (a genuine near-duplicate: identical
    // distinct-token set => identical MinHash signature).
    val docsPerBatch =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_DOCS", "30000").toInt
    def docBatch(batch: Int): Seq[Doc] = {
      val base = batch.toLong * docsPerBatch
      (0 until docsPerBatch).map { i =>
        val id = base + i
        val recipe = if (id % 10 == 9 && id >= 10) id - 10 else id
        val text = (0 until 12)
          .map(j => "w" + ((recipe * 131 + j * 7919) % 40000))
          .mkString(" ")
        Doc(id, "s" + (id % 4), text)
      }
    }

    /** rows/sec through `plan`, best of 2 passes over fresh MemoryStreams
      * (same best-of-N convention as [[Bench]]; the retained MemoryStream
      * batches + memory sink are dropped and GC'd between passes so heap
      * pressure from one op doesn't tax the next).
      */
    def measureAs[T: org.apache.spark.sql.Encoder](tag: String, mode: String,
        feed: Int => Seq[T])(
        plan: org.apache.spark.sql.Dataset[T] => org.apache.spark.sql.DataFrame): (String, Double) = {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val fed = (1 to batches).map(feed) // keep generation out of the timed span
      val perBatch = fed.head.size
      val best = (1 to 2).map { _ =>
        val in = MemoryStream[T]
        val q = plan(in.toDS()).writeStream.format("memory")
          .queryName(s"sb_$tag").outputMode(mode).start()
        in.addData(feed(0)) // warmup batch (state init, codegen)
        q.processAllAvailable()
        val t0 = System.nanoTime()
        fed.foreach { rows => in.addData(rows); q.processAllAvailable() }
        val sec = (System.nanoTime() - t0) / 1e9
        q.stop()
        spark.sql(s"DROP VIEW IF EXISTS sb_$tag")
        System.gc()
        batches.toLong * perBatch / sec
      }.max
      tag -> best
    }
    def measure(tag: String, mode: String = "update")(
        plan: org.apache.spark.sql.Dataset[E] => org.apache.spark.sql.DataFrame): (String, Double) =
      measureAs[E](tag, mode, events)(plan)

    val results = Seq(
      // keyed tumbling-window count/sum under a watermark (update mode)
      measure("tumble_agg") { ds =>
        ds.withWatermark("ts", "10 seconds")
          .groupBy(window($"ts", "1 minute"), $"k")
          .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
          .select($"k", $"n", $"sv")
      },
      // ChangelogNormalize analog: latest row per key
      measure("keep_last") { ds =>
        graft.streaming.StreamOps.keepLast(ds)(_.k, _.id).toDF()
      },
      // streaming keep-first dedup on key within the watermark
      measure("dedup_first") { ds =>
        ds.withWatermark("ts", "10 seconds")
          .dropDuplicatesWithinWatermark(Seq("id")).toDF()
      },
      // streaming per-key Top-N leaderboard changelog (custom
      // flatMapGroupsWithState op; state = N rows per key)
      measure("stream_topn") { ds =>
        graft.streaming.StreamingTopN(ds, 10)(_.k, _.v, _.id).toDF()
      },
      // CEP: two-step pattern (low value then high value) per key —
      // the NFA partial-match engine under sustained load
      measure("cep", mode = "append") { ds =>
        val pat = graft.streaming.Cep.Pattern
          .begin[E]("lo", _.v < 48).next("hi", _.v >= 48)
        graft.streaming.Cep.run(ds, pat)(_.k, _.ts.getTime).toDF()
      },
      // stateless projection/filter baseline (harness ceiling)
      measure("calc") { ds =>
        ds.filter($"v" > 10).select($"id", $"k", ($"v" * 2).as("v2"))
      },
      // streaming MinHash near-dup gate at >= 10x the sf0.01 corpus
      // (warmup + 5 x docsPerBatch docs vs ~15k documents): state is
      // one long per occupied (band, bucket) — n_docs x 4 bands
      // entries — and this op is the bounded-state demonstration: with
      // SPARK_GRAFT_STATE_STORE=rocksdb all of it lives off-heap, so
      // corpus growth never presses the heap. ~10% of docs are forced
      // near-dups of an earlier doc (same token set => same signature)
      // so the claimed-bucket hit path is exercised, not just inserts.
      measureAs[Doc]("near_dup", "append", docBatch) { ds =>
        graft.streaming.StreamingNearDup.bandVerdicts(ds.toDF()).toDF()
      })

    val qs = results.map { case (k, v) => "\"" + k + f"\":${v}%.0f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"stream_rows_per_sec","ops":$qs,"rows_per_batch":$rowsPerBatch,"batches":$batches,"cpus":$cpus,"state_store":"$stateStore"}""")
    spark.stop()
  }
}
