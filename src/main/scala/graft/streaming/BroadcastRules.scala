package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.streaming.DataStreamWriter

/** Dynamic broadcast state (SURVEY.md §2.13; reference
  * flink-streaming-java .../datastream/BroadcastConnectedStream.java +
  * .../co/KeyedBroadcastProcessFunction.java — a low-rate control
  * stream broadcasts rule updates that every data-stream task reads).
  *
  * Spark shape: the control stream materializes into a keyed upsert
  * snapshot ([[Sinks.upsert]] — hash-bucketed, latest row per rule
  * key); the data stream runs foreachBatch and each micro-batch joins
  * against the snapshot AS OF that batch, explicitly broadcast. Rule
  * updates become visible to the first data batch that starts after
  * the control batch committed — the same eventual-visibility contract
  * Flink's broadcast state has between the two streams.
  *
  * Scale posture: the rules side stays small (it's broadcast), the
  * data side is unbounded; per batch cost = one broadcast build of the
  * touched snapshot + a map-side join — no shuffle of the data stream.
  */
object BroadcastRules {

  /** Materialize the control stream as the current-rules snapshot at
    * `path` (latest row per `keys` by `seqCol`). Start + await this
    * query alongside the data query. */
  def materialize(control: DataFrame, keys: Seq[String], seqCol: String,
      path: String): DataStreamWriter[Row] =
    Sinks.upsert(control, keys, seqCol, path)

  /** Enrich each data micro-batch with the rules current at batch
    * time: left join on `joinKeys` against the snapshot, explicitly
    * broadcast. `sink` consumes the enriched batch. Before the first
    * rule arrives the batch passes through un-enriched (left join
    * with an empty frame is identity + null columns is not possible
    * pre-snapshot, so the batch is handed over as-is). */
  def enrich(data: DataFrame, rulesPath: String, joinKeys: Seq[String])(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    data.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val rules =
        try Some(Sinks.readSnapshot(batch.sparkSession, rulesPath))
        catch { case _: Exception => None } // snapshot not created yet
      val enriched = rules match {
        case Some(r) => batch.join(broadcast(r), joinKeys, "left")
        case None => batch
      }
      sink(enriched, id)
    }
}
