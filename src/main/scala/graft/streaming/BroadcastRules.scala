package graft.streaming

import org.apache.spark.sql.{AnalysisException, DataFrame, Row}
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType

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
    * broadcast. `sink` consumes the enriched batch. `rulesSchema` is
    * the snapshot's schema (sans the internal bucket column): before
    * the first control batch commits, the batch left-joins an EMPTY
    * rules frame of that schema, so the sink sees one stable schema
    * (rule columns all-null) from batch 0 — a schema flip mid-stream
    * breaks parquet/Delta-style sinks. Only a missing-path read is
    * treated as "not created yet"; real read errors propagate. */
  def enrich(data: DataFrame, rulesPath: String, joinKeys: Seq[String],
      rulesSchema: StructType)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    data.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val spark = batch.sparkSession
      val rules =
        try Sinks.readSnapshot(spark, rulesPath)
        catch {
          // not created yet — or created but mid-first-commit (dir
          // exists, no readable footer yet): both mean "no rules yet";
          // real read errors still propagate
          case e: AnalysisException
              if e.getCondition == "PATH_NOT_FOUND" ||
                e.getCondition == "UNABLE_TO_INFER_SCHEMA" ||
                e.getMessage.contains("Path does not exist") =>
            spark.createDataFrame(
              java.util.Collections.emptyList[Row](), rulesSchema)
        }
      sink(batch.join(broadcast(rules), joinKeys, "left"), id)
    }
}
