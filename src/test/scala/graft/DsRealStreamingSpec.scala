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
}
