package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Late-data capture (SURVEY.md §2.5 gap; reference
  * flink-streaming-java .../datastream/WindowedStream.java:108
  * `sideOutputLateData(OutputTag)`): rows that arrive behind the
  * watermark are routed to a side sink instead of being silently
  * dropped by the windowed aggregation.
  *
  * Spark's built-in watermark drop is invisible; this operator makes
  * it observable by tracking the watermark explicitly in foreachBatch:
  * watermark = max(event ts over all PRIOR micro-batches) - delay —
  * the exact definition Spark's WatermarkTracker uses — then routing
  * each batch's rows by comparison against it. Run the windowed agg
  * downstream of the main sink (or on `mainPath`) with the same delay
  * and no row is ever lost unaccounted.
  *
  * The tracker lives in driver memory (foreachBatch runs driver-side):
  * on query restart it re-learns the watermark from the first batch,
  * i.e. the first post-restart batch classifies nothing as late —
  * conservative, never spuriously late. State is one long — O(1).
  */
object LateData {

  /** Route each micro-batch: rows with ts >= watermark append to
    * `mainPath`, late rows append to `latePath` (both parquet). Rows
    * whose ts is null or fails the timestamp cast have no position
    * relative to any watermark; they route to `latePath` (a windowed
    * agg downstream would drop them too), so every input row lands in
    * exactly one of the two sinks. */
  def sideOutputLate(stream: DataFrame, tsCol: String, delayMs: Long,
      mainPath: String, latePath: String): DataStreamWriter[Row] = {
    require(delayMs >= 0)
    val maxSeen = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    val tsMillis = unix_millis(col(tsCol).cast("timestamp"))
    // per-batch partition + dynamic overwrite: a RETRIED micro-batch
    // replaces its own previous output instead of appending duplicates
    def write(df: DataFrame, id: Long, path: String): Unit =
      df.withColumn("__batch", lit(id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch").parquet(path)
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val wm = maxSeen.get() match {
        case Long.MinValue => Long.MinValue // no prior batch: nothing late
        case mx => mx - delayMs
      }
      val cached = batch.cache()
      try {
        write(cached.filter(tsMillis >= wm), id, mainPath)
        // null/uncastable ts satisfies neither comparison — route it
        // explicitly so no row vanishes from both sinks
        val late = cached.filter(tsMillis < wm || tsMillis.isNull)
        if (!late.isEmpty) write(late, id, latePath)
        val mx = cached.agg(max(tsMillis)).head()
        if (!mx.isNullAt(0))
          maxSeen.getAndUpdate(m => math.max(m, mx.getLong(0)))
      } finally { cached.unpersist(); () }
      ()
    }
  }
}
