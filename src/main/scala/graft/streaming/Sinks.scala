package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Sink-side operators (SURVEY.md §2.1):
  *  - Upsert sink (Flink's SinkUpsertMaterializer + upsert sinks,
  *    OP/sink/SinkUpsertMaterializer.java): foreachBatch keeps the
  *    newest row per key across batches in a keyed snapshot table.
  *    In production the merge step is a MERGE INTO on Delta/Iceberg;
  *    here the snapshot is maintained in a parquet dir (read-merge-
  *    overwrite), which is the same dataflow at demo scale.
  *  - Side outputs (OutputTag, flink-streaming-java DataStream#getSideOutput):
  *    one foreachBatch fans out to several filtered writes.
  *  - Async lookup I/O (AsyncWaitOperator.java:91 /
  *    AsyncLookupJoinRunner): mapPartitions + Futures with bounded
  *    in-flight requests per partition.
  */
object Sinks {

  /** Start an upsert-materializing sink: the parquet dir at `path`
    * always holds exactly one (the latest by seqCol) row per key. */
  def upsert(stream: DataFrame, keys: Seq[String], seqCol: String,
      path: String): DataStreamWriter[Row] =
    stream.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val newRows = batch
        val merged = {
          val existing =
            try Some(spark.read.parquet(path)) catch { case _: Exception => None }
          existing.map(_.unionByName(newRows)).getOrElse(newRows)
        }
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(seqCol).desc)
        val snapshot = merged
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .cache()
        snapshot.count() // materialize before overwriting the source dir
        snapshot.write.mode("overwrite").parquet(path)
        snapshot.unpersist()
        ()
    }

  /** Side outputs: route each micro-batch into multiple sinks by
    * predicate (main + named side channels). */
  def sideOutputs(stream: DataFrame,
      routes: Seq[(String, org.apache.spark.sql.Column, String)]): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val cached = batch.cache()
      try routes.foreach { case (_, pred, path) =>
        cached.filter(pred).write.mode("append").parquet(path)
      } finally { cached.unpersist(); () }
    }

  /** Async lookup over an external service: batched per partition with
    * at most `maxInFlight` outstanding futures (AsyncWaitOperator's
    * ordered mode). `lookup` is user code hitting the external system. */
  def asyncLookup[I, O](ds: Dataset[I], maxInFlight: Int)(lookup: I => O)(
      implicit enc: org.apache.spark.sql.Encoder[O]): Dataset[O] =
    ds.mapPartitions { it =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      it.grouped(maxInFlight).flatMap { group =>
        val futs = group.map(i => Future(lookup(i)))
        futs.map(f => Await.result(f, Duration.Inf))
      }
    }
}
