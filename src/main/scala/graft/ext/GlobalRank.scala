package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed GLOBAL ranking — the scalable form of `row_number() /
  * rank() / dense_rank() / ntile(k) / cume_dist() / percent_rank()
  * OVER (ORDER BY key)`. An un-partitioned window funnels the entire
  * input through ONE task (WindowExec warns "No Partition Defined");
  * at 100 TB that is a single-core sort of the whole dataset. This
  * operator instead runs the textbook two-phase scheme the repo's
  * [[PrefixSum]] already uses: range-partition by the key,
  * per-partition local window functions (parallel), prefix-sum the
  * tiny per-partition count table on the driver, broadcast the
  * offsets back, and derive every global rank statistic:
  *
  *   rn              global row number (arbitrary among key ties)
  *   rank_g          offset + per-partition rank()       — tie-exact
  *   dense_rank_g    distinct-key offset + dense_rank()  — tie-exact
  *   ntile(k)        exact SQL semantics over rn: the first
  *                   (total % k) buckets take ceil(total/k) rows each
  *   cume_dist_e6    (rows ≤ key) * 1e6 div total — exact micro-units
  *   percent_rank_e6 (rank_g - 1) * 1e6 div (total - 1)
  *
  * TIES ARE EXACT without any boundary-merge pass: Spark's
  * RangePartitioner assigns a partition by binary search on the KEY
  * VALUE, so rows with equal keys always land in the same partition —
  * a key group can never straddle a partition boundary. Per-partition
  * rank()/dense_rank()/peer-inclusive counts are therefore globally
  * correct once shifted by the row / distinct-key prefix offsets. The
  * only tie-UNSTABLE outputs are rn and ntile_k (row position among
  * peers is arbitrary, exactly as in SQL); callers needing
  * deterministic rn append a unique tiebreak column to the key.
  *
  * Micro-unit arithmetic runs in DECIMAL(38,0) and casts the ≤1e6
  * result back to BIGINT, so nothing overflows regardless of total
  * row count (rn * 1e6 in LONG would overflow past ~9.2e12 rows —
  * real territory at 100 TB).
  *
  * Scale posture: two shuffles total (the range partition, reused by
  * both phases via an eager pin), a driver-side array of one
  * (count, distinct-count) pair per partition, and a broadcast of the
  * same — nothing proportional to the data ever leaves the executors.
  * Reference analog: Flink's batch sort feeds rank the same way
  * (range partition + sequential per-partition scan,
  * BinaryExternalSorter.java:69).
  */
object GlobalRank {

  /** Adds `rn` (1-based global row number in `key` order), `rank_g`,
    * `dense_rank_g`, `ntile_k`, `cume_dist_e6`, `percent_rank_e6` to
    * `df`. Ties in `key` are allowed; see the scaladoc for which
    * outputs are tie-stable. */
  def rank(spark: SparkSession, df: DataFrame, key: Column, k: Int,
      partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val w = Window.partitionBy($"_pid").orderBy(key)
    // Range-partition + local window stats in one pass, pinned so the
    // count pass and the final pass see identical placement (the
    // PrefixSum determinism note: range boundaries come from sampling,
    // so an unpinned recompute could place rows differently).
    val local = Materialize.pin(df
      .repartitionByRange(n, key)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lrn", row_number().over(w))
      .withColumn("_lrk",
        org.apache.spark.sql.functions.rank().over(w))
      .withColumn("_ldr", dense_rank().over(w))
      // default frame = RANGE UNBOUNDED PRECEDING..CURRENT ROW, so
      // this count is peer-INCLUSIVE: rows with key <= current key
      .withColumn("_lcd", count(lit(1)).over(w)))
    // One (rows, distinct keys) pair per partition: a driver-side
    // array of at most n entries.
    val counts = local.groupBy($"_pid")
      .agg(count(lit(1)).as("c"), countDistinct(key).as("d"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val total = counts.values.map(_._1).sum
    val rowOffsets = (0 until n).scanLeft(0L) {
      case (acc, pid) => acc + counts.get(pid).map(_._1).getOrElse(0L)
    }
    val distOffsets = (0 until n).scanLeft(0L) {
      case (acc, pid) => acc + counts.get(pid).map(_._2).getOrElse(0L)
    }
    val offsetDf = broadcast(
      (0 until n).map(pid => (pid, rowOffsets(pid), distOffsets(pid)))
        .toDF("_opid", "_roff", "_doff"))
    // ntile arithmetic (exact SQL semantics): q = total div k buckets
    // of size q, the first m = total % k buckets take one extra row.
    val q = total / k
    val m = total % k
    local.join(offsetDf, $"_pid" === $"_opid")
      .withColumn("rn", $"_roff" + $"_lrn")
      .withColumn("rank_g", $"_roff" + $"_lrk")
      .withColumn("dense_rank_g", $"_doff" + $"_ldr")
      // `div`, NOT `/` — Column `/` is double division (the repo-wide
      // integer-exactness discipline)
      .withColumn("ntile_k",
        if (q == 0) col("rn") // fewer rows than buckets: one row each
        else when($"rn" - 1 < lit((q + 1) * m),
          expr(s"(rn - 1) div ${q + 1} + 1"))
          .otherwise(expr(s"(rn - 1 - $m) div $q + 1")))
      // DECIMAL(38,0) intermediates: overflow-free at any total
      .withColumn("cume_dist_e6", expr(
        s"CAST((CAST(_roff + _lcd AS DECIMAL(38,0)) * 1000000) " +
          s"div $total AS BIGINT)"))
      .withColumn("percent_rank_e6",
        if (total <= 1L) lit(0L)
        else expr(
          s"CAST((CAST(rank_g - 1 AS DECIMAL(38,0)) * 1000000) " +
            s"div ${total - 1} AS BIGINT)"))
      .drop("_pid", "_lrn", "_lrk", "_ldr", "_lcd",
        "_opid", "_roff", "_doff")
  }
}
