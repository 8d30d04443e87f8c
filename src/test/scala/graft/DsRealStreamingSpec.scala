package graft

import graft.dsreal.DsTables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5's batch-vs-stream self-oracle on the REAL derived star
  * (not the synthetic events table): the same weekly store-revenue
  * aggregation — store_sales joined to the store dim, tumbled into
  * 7-day event-time windows — run once as a batch DataFrame program
  * and once INCREMENTALLY, the fact replayed through the file
  * streaming source in three chronological arrival chunks across
  * restarts of the same checkpoint. The reference serves both modes
  * from one exec node (flink-table-planner
  * StreamExecWindowAggregate.java:86 vs the batch window agg); Spark's
  * analog contract is that the incremental plan over the identical
  * input files converges to the batch plan's result exactly.
  *
  * Mechanics pinned here, beyond the plain parity claim:
  *  - window STATE survives query restarts: the chunk split is
  *    chronological but not window-aligned, so windows spanning a
  *    chunk boundary accumulate rows from two different query runs
  *    before closing;
  *  - the watermark survives restarts too (it lives in the
  *    checkpoint's offset log) and the chronological replay keeps
  *    every row ahead of it — nothing is dropped as late;
  *  - a far-future sentinel row pushes the final watermark past every
  *    real window, so append mode flushes them all (the sentinel's own
  *    window never closes and is absent from BOTH sides).
  */
class DsRealStreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("incremental store_sales replay equals the batch weekly revenue " +
      "per store across two restarts") {
    val inDir =
      java.nio.file.Files.createTempDirectory("graft_dsrs_in").toString
    val ckpt =
      java.nio.file.Files.createTempDirectory("graft_dsrs_ck").toString
    val outDir =
      java.nio.file.Files.createTempDirectory("graft_dsrs_out").toString

    val fact = DsTables.storeSales(spark, TestSpark.sf)
      .select($"ss_sold_date_sk", $"ss_store_sk", $"ss_quantity",
        $"ss_ext_sales_price_cents")
      .withColumn("sold_ts",
        date_add(to_date(lit(DsTables.Epoch)),
          $"ss_sold_date_sk".cast("int")).cast("timestamp"))

    def weekly(df: org.apache.spark.sql.DataFrame) = df
      .join(broadcast(DsTables.store(spark)
        .select($"s_store_sk", $"s_store_name")),
        $"ss_store_sk" === $"s_store_sk")
      .groupBy(window($"sold_ts", "7 days"), $"s_store_name")
      .agg(count(lit(1)).as("n"), sum($"ss_quantity").as("qty"),
        sum($"ss_ext_sales_price_cents").as("rev"))
      .select($"window.start".cast("string").as("w_start"),
        $"s_store_name", $"n", $"qty", $"rev")

    // three chronological arrival chunks (the derived date_sk spans
    // 0..2556); one file each so a hop is one micro-batch
    def feed(lo: Long, hi: Long): Unit =
      fact.filter($"ss_sold_date_sk" >= lo && $"ss_sold_date_sk" < hi)
        .coalesce(1).write.mode("append").parquet(inDir)
    feed(0, 900)
    val schema = spark.read.parquet(inDir).schema

    def hop(): Unit = {
      val q = weekly(spark.readStream.schema(schema).parquet(inDir)
        .withWatermark("sold_ts", "1 day"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000); q.stop()
    }
    hop() // run 1: the first chunk
    feed(900, 1800) // arrives while the query is "down"
    hop() // restart 1: windows spanning day 900 finish accumulating
    feed(1800, 2557)
    // sentinel far past every real window, then the flush hop
    Seq((9000L, 1L, 1L, 1L)).toDF("ss_sold_date_sk", "ss_store_sk",
        "ss_quantity", "ss_ext_sales_price_cents")
      .withColumn("sold_ts",
        date_add(to_date(lit(DsTables.Epoch)),
          $"ss_sold_date_sk".cast("int")).cast("timestamp"))
      .select(schema.fieldNames.map(col): _*)
      .coalesce(1).write.mode("append").parquet(inDir)
    hop() // restart 2: last chunk + watermark pushed past all windows

    val streamed = spark.read.parquet(outDir)
      .select($"w_start", $"s_store_name", $"n", $"qty", $"rev")
      .as[(String, String, Long, Long, Long)].collect().toSet
    val batch = weekly(fact)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "batch side is empty — test is degenerate")
    assert(streamed == batch,
      s"incremental != batch: missing=${(batch -- streamed).take(5)} " +
        s"extra=${(streamed -- batch).take(5)}")
  }

  test("streaming sale<->return interval join on the real star equals " +
      "the batch join across a restart") {
    // The q50/q93 shape as a STREAM-STREAM join: store_sales and
    // store_returns replayed as two file streams, inner-joined on
    // (item, ticket) with the return constrained to land within 60
    // days of its sale — a genuine two-sided interval join whose
    // watermarks bound the sale-side state (the derived lag spans
    // 1..146 days, so the 60-day band keeps ~40% and DROPS the rest
    // on both sides). Chunked arrival puts many sales in run 1 whose
    // matching return only arrives after the restart: the join state
    // must survive the checkpoint reload (reference analog:
    // StreamExecIntervalJoin's relative-window state).
    val salesDir =
      java.nio.file.Files.createTempDirectory("graft_dsrj_s").toString
    val retDir =
      java.nio.file.Files.createTempDirectory("graft_dsrj_r").toString
    val ckpt =
      java.nio.file.Files.createTempDirectory("graft_dsrj_ck").toString
    val outDir =
      java.nio.file.Files.createTempDirectory("graft_dsrj_out").toString

    val sales = DsTables.storeSales(spark, TestSpark.sf)
      .select($"ss_item_sk", $"ss_ticket_number", $"ss_store_sk",
        $"ss_ext_sales_price_cents", $"ss_sold_date_sk")
      .withColumn("sold_ts",
        date_add(to_date(lit(DsTables.Epoch)),
          $"ss_sold_date_sk".cast("int")).cast("timestamp"))
    val rets = DsTables.storeReturns(spark, TestSpark.sf)
      .select($"sr_item_sk", $"sr_ticket_number",
        $"sr_return_amt_cents", $"sr_returned_date_sk")
      .withColumn("ret_ts",
        date_add(to_date(lit(DsTables.Epoch)),
          $"sr_returned_date_sk".cast("int")).cast("timestamp"))

    val joinCond = "sr_item_sk = ss_item_sk AND " +
      "sr_ticket_number = ss_ticket_number AND " +
      "ret_ts BETWEEN sold_ts AND sold_ts + INTERVAL 60 DAYS"
    def project(df: org.apache.spark.sql.DataFrame) = df
      .select($"ss_item_sk", $"ss_ticket_number",
        // ss_store_sk carries the derived ~2% NULL slice — fold to a
        // sentinel so the tuple encoder stays non-nullable
        coalesce($"ss_store_sk", lit(-1L)).as("store_sk"),
        $"ss_ext_sales_price_cents", $"sr_return_amt_cents",
        datediff($"ret_ts", $"sold_ts").cast("long").as("lag_days"))

    def feedS(lo: Long, hi: Long): Unit =
      sales.filter($"ss_sold_date_sk" >= lo && $"ss_sold_date_sk" < hi)
        .coalesce(1).write.mode("append").parquet(salesDir)
    def feedR(lo: Long, hi: Long): Unit =
      rets.filter($"sr_returned_date_sk" >= lo &&
          $"sr_returned_date_sk" < hi)
        .coalesce(1).write.mode("append").parquet(retDir)
    feedS(0, 1500)
    feedR(0, 800)
    val sSchema = spark.read.parquet(salesDir).schema
    val rSchema = spark.read.parquet(retDir).schema

    def hop(): Unit = {
      val sIn = spark.readStream.schema(sSchema).parquet(salesDir)
        .withWatermark("sold_ts", "1 day")
      val rIn = spark.readStream.schema(rSchema).parquet(retDir)
        .withWatermark("ret_ts", "1 day")
      val q = project(sIn.join(rIn, expr(joinCond)))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000); q.stop()
    }
    hop() // run 1: returns beyond day 800 not yet arrived
    feedS(1500, 2557)
    feedR(800, 2800) // includes returns of run-1 sales -> state reload
    hop() // restart: joins complete across the checkpoint boundary

    val streamed = spark.read.parquet(outDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    val batch = project(sales.join(rets, expr(joinCond)))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(batch.nonEmpty, "batch join is empty — test is degenerate")
    // the 60-day band must BITE (drop some returns) or the interval
    // condition is vacuous
    val allPairs = project(sales.join(rets,
      expr("sr_item_sk = ss_item_sk AND " +
        "sr_ticket_number = ss_ticket_number"))).count()
    assert(allPairs > batch.values.sum,
      "interval band drops nothing — condition is vacuous")
    assert(streamed == batch,
      s"stream-stream join != batch: missing=" +
        s"${(batch.keySet -- streamed.keySet).take(3)} extra=" +
        s"${(streamed.keySet -- batch.keySet).take(3)}")
  }
}
