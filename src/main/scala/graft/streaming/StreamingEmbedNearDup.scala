package graft.streaming

import graft.ext.VectorOps
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming EMBEDDING near-duplicate gate: the sign-LSH mirror of
  * [[StreamingNearDup]] (which bands MinHash over text). New vectors
  * are fuzzy-checked against every embedding already ingested without
  * rescanning the corpus — the continuous-ingestion form of the batch
  * `VectorOps.embeddingDedup` / SemDeDup family (reference analog: the
  * same keyed-state machinery as RowTimeDeduplicateFunction, applied
  * to a capability the reference lacks).
  *
  * Shape: each arriving vector computes `tables` INDEPENDENT sign-LSH
  * bucket ids statelessly (table t uses plane set t — disjoint
  * planeOffset ranges of the shared md5-derived hyperplane stream, the
  * exact `VectorOps.lshBucket` the batch path and DuckDB oracles
  * replay), explodes to one row per table, and the shared bucket-claim
  * core keeps one long of state per occupied (table, bucket): the
  * first vec_id that claimed it. Any claimed bucket marks the arrival
  * a near-dup of the claimant; all-unclaimed means new. Cosine-similar
  * vectors agree on most plane signs, so they collide in at least one
  * of the `tables` bucketings with high probability — same
  * recall-vs-tables tradeoff as the batch sign-LSH candidates
  * (q_lsh_recall / q_lsh_precision measure that operating point).
  *
  * `dup_of` chains transitively exactly as in [[StreamingNearDup]]
  * (follow to a vec with is_dup = false for the kept representative).
  *
  * 100-TB posture: state is one long per occupied bucket — bounded by
  * n_vectors x tables, sharded by bucket hash, point lookups only;
  * RocksDB keeps it off-heap. The fold to per-vector verdicts is
  * batch-local ([[StreamingNearDup.collapse]] works unchanged — the
  * schema is identical).
  */
object StreamingEmbedNearDup {

  /** Per-(table, bucket) verdicts for a stream of (vec_id, emb) rows.
    * `emb` must be a numeric array of length `dims`; rows with a NULL
    * embedding cannot band (their bucket ids would be null, and
    * concat_ws skipping nulls would collapse every such row onto one
    * shared per-table key — spurious mutual dups) and surface as
    * stateless SINGLETON verdicts instead, the same contract as the
    * text gate's null-signature branch. */
  def bandVerdicts(vecs: DataFrame, planes: Int = 16, tables: Int = 4,
      dims: Int = 64): Dataset[StreamingNearDup.BandVerdict] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val typed = vecs.select(col("vec_id").cast("long").as("vec_id"),
      col("emb"))
    val buckets = array((0 until tables).map(t =>
      VectorOps.lshBucket(col("emb"), planes, dims, planeOffset = t * planes)
        .cast("string")): _*)
    val banded = typed.filter($"emb".isNotNull)
      .select($"vec_id", posexplode(buckets).as(Seq("table", "bucket")))
      .select($"vec_id",
        concat_ws("\u0001", $"table", $"bucket").as("key"))
      .as[(Long, String)]
    val singletons = typed.filter($"emb".isNull)
      .select($"vec_id").as[Long]
      .map(id => StreamingNearDup.BandVerdict(id, tables, hit = false,
        claimant = id))
    StreamingNearDup.claimVerdicts(banded, tables).union(singletons)
  }
}
