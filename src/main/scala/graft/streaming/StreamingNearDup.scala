package graft.streaming

import graft.ext.TextOps
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, OutputMode}

/** Streaming MinHash near-duplicate gate: continuous-ingestion fuzzy
  * dedup (the streaming counterpart of ext/MinHashLSH — reference
  * analog: a keyed dedup over RowTimeDeduplicateFunction state crossed
  * with the batch LSH family; no single reference operator does fuzzy
  * streaming dedup, which is exactly why a training-data pipeline
  * needs it: new crawl batches must be near-dup-checked against
  * everything already ACCEPTED without re-scanning the corpus).
  *
  * Shape: each arriving doc computes its MinHash band keys statelessly
  * (the same `TextOps.minhashSignature`/`bandKeys` family the batch
  * path and the DuckDB oracles replay), explodes to one row per band,
  * and each (source, band, bucket) keyed group keeps ONE value of
  * state: the first doc id that ever claimed that bucket. A doc whose
  * EVERY band bucket was unclaimed is new; any claimed bucket marks it
  * a near-duplicate of the claimant. Within a micro-batch the claimant
  * is the smallest doc id (deterministic across retries — arrival
  * order inside a batch is not).
  *
  * 100-TB posture: state is one long per OCCUPIED bucket — bounded by
  * ALL INGESTED docs' bands (n_docs x bands), sharded by the bucket
  * hash across executors, never scanned (point lookups by key). The
  * band verdict -> doc verdict fold is per-batch (all bands of a doc
  * ride the same input row, so they land in the same micro-batch) —
  * use [[collapse]] inside foreachBatch; no second stateful stage.
  *
  * `dup_of` chains TRANSITIVELY: a doc claims its unclaimed buckets
  * even when another band flags the doc itself as a near-dup, so a
  * later doc's `dup_of` may name a claimant that was itself rejected
  * — follow the chain (dup_of -> ... -> a doc with is_dup = false) to
  * reach the kept representative, exactly like the batch LSH path's
  * connected-components clusters. The single-pass design is
  * deliberate: restricting claims to accepted docs would need a
  * second stateful pass per micro-batch (a doc's acceptance depends
  * on its OTHER buckets), doubling state traffic for no recall gain.
  *
  * Docs whose signature is null (fewer than one token —
  * `TextOps.minhashOf` returns null for the empty element set) cannot
  * band; they surface as SINGLETON verdicts (hit = false, claimant =
  * self) via a stateless union branch rather than silently vanishing,
  * matching the batch path's keep-as-singleton contract.
  */
object StreamingNearDup {

  case class BandVerdict(doc_id: Long, band_total: Int, hit: Boolean,
    claimant: Long)

  /** Per-(source, band, bucket) verdicts. `bands` x `rowsPerBand` must
    * equal the signature length. */
  def bandVerdicts(docs: DataFrame, numHashes: Int = 16, bands: Int = 4,
      rowsPerBand: Int = 4): Dataset[BandVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigged = docs.select($"doc_id".cast("long").as("doc_id"), $"source",
      TextOps.minhashSignature($"text", numHashes).as("sig"))
    val banded = sigged.filter($"sig".isNotNull)
      .select($"doc_id", $"source",
        posexplode(TextOps.bandKeys($"sig", bands, rowsPerBand))
          .as(Seq("band", "bkey")))
      .select($"doc_id", concat_ws("\u0001", $"source", $"band", $"bkey")
        .as("bucket"))
      .as[(Long, String)]
    val stateful = claimVerdicts(banded, bands)
    // null-signature docs cannot band: surface them as stateless
    // singleton verdicts (the batch keep-as-singleton contract)
    // instead of silently dropping them
    val singletons = sigged.filter($"sig".isNull)
      .select($"doc_id").as[Long]
      .map(id => BandVerdict(id, bands, hit = false, claimant = id))
    stateful.union(singletons)
  }

  /** The stateful bucket-claim core, shared with the embedding-side
    * gate ([[StreamingEmbedNearDup]]): per bucket key, ONE long of
    * state — the first id that ever claimed it. */
  private[streaming] def claimVerdicts(banded: Dataset[(Long, String)],
      bands: Int): Dataset[BandVerdict] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded.groupByKey(_._2)
      .flatMapGroupsWithState[Long, BandVerdict](
        OutputMode.Append(), org.apache.spark.sql.streaming
          .GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          val ids = rows.map(_._1).toVector
          val prior = state.getOption
          // deterministic in-batch claimant: the smallest id
          val claimant = prior.getOrElse(ids.min)
          if (prior.isEmpty) state.update(claimant)
          ids.iterator.map(id =>
            BandVerdict(id, bands, hit = id != claimant, claimant))
      }
  }

  case class DocVerdict(doc_id: Long, is_dup: Boolean, dup_of: Long)

  /** Batch-local fold of band verdicts to doc verdicts (run inside
    * foreachBatch): a doc is a near-dup if ANY band hit; `dup_of` is
    * the smallest claimant among hit bands (the doc itself if new). */
  def collapse(bandVerdicts: DataFrame): DataFrame =
    bandVerdicts.groupBy(col("doc_id"))
      .agg(max(when(col("hit"), 1).otherwise(0)).as("anyhit"),
        min(when(col("hit"), col("claimant"))).as("mc"))
      .select(col("doc_id"), (col("anyhit") === 1).as("is_dup"),
        coalesce(col("mc"), col("doc_id")).as("dup_of"))
}
