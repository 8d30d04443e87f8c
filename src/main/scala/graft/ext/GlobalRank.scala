package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed GLOBAL ranking — the scalable form of `row_number() /
  * ntile(k) / cume_dist() / percent_rank() OVER (ORDER BY key)`. An
  * un-partitioned window funnels the entire input through ONE task
  * (WindowExec warns "No Partition Defined"); at 100 TB that is a
  * single-core sort of the whole dataset. This operator instead runs
  * the textbook two-phase scheme the repo's [[PrefixSum]] already
  * uses: range-partition by the key, per-partition local row numbers
  * (parallel), prefix-sum the tiny per-partition count table on the
  * driver, broadcast the offsets back, and derive every global rank
  * statistic arithmetically from `global row number` + `total count`:
  *
  *   ntile(k)        exact SQL semantics: the first (total % k)
  *                   buckets take ceil(total/k) rows each
  *   cume_dist_e6    (rn * 1e6) div total        — exact micro-units
  *   percent_rank_e6 ((rn-1) * 1e6) div (total-1)
  *
  * The key must be a TOTAL order (append a unique tiebreak column as
  * the SQL convention in this repo already does for every rank under
  * LIMIT): with distinct keys, rank = dense_rank = row_number, and
  * cume_dist/percent_rank reduce to the closed forms above — which is
  * exactly what makes the two-phase scheme exact. Ties across
  * partition boundaries would otherwise need a boundary-merge pass.
  *
  * Scale posture: two shuffles total (the range partition, reused by
  * both phases via an eager pin), a driver-side array of one count
  * per partition, and a broadcast of the same — nothing proportional
  * to the data ever leaves the executors. Reference analog: Flink's
  * batch sort feeds rank the same way (range partition + sequential
  * per-partition scan, BinaryExternalSorter.java:69).
  */
object GlobalRank {

  /** Adds `rn` (1-based global row number in `key` order), `ntile_k`,
    * `cume_dist_e6`, `percent_rank_e6` to `df`. `key` must be unique
    * per row (total order). */
  def rank(spark: SparkSession, df: DataFrame, key: Column, k: Int,
      partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // Range-partition + local row number in one pass, pinned so the
    // count pass and the final pass see identical placement (the
    // PrefixSum determinism note: range boundaries come from sampling,
    // so an unpinned recompute could place rows differently).
    val local = Materialize.pin(df
      .repartitionByRange(n, key)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lrn", row_number().over(
        Window.partitionBy($"_pid").orderBy(key))))
    // One count per partition: a driver-side array of at most n longs.
    val counts = local.groupBy($"_pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val offsets = (0 until n).scanLeft(0L) {
      case (acc, pid) => acc + counts.getOrElse(pid, 0L)
    }
    val offsetDf = broadcast(
      offsets.init.zipWithIndex
        .map { case (off, pid) => (pid, off) }
        .toDF("_opid", "_offset"))
    // ntile arithmetic (exact SQL semantics): q = total div k buckets
    // of size q, the first m = total % k buckets take one extra row.
    val q = total / k
    val m = total % k
    local.join(offsetDf, $"_pid" === $"_opid")
      .withColumn("rn", $"_offset" + $"_lrn")
      // `div`, NOT `/` — Column `/` is double division (the repo-wide
      // integer-exactness discipline)
      .withColumn("ntile_k",
        if (q == 0) col("rn") // fewer rows than buckets: one row each
        else when($"rn" - 1 < lit((q + 1) * m),
          expr(s"(rn - 1) div ${q + 1} + 1"))
          .otherwise(expr(s"(rn - 1 - $m) div $q + 1")))
      .withColumn("cume_dist_e6", expr(s"(rn * 1000000) div $total"))
      .withColumn("percent_rank_e6",
        if (total <= 1L) lit(0L)
        else expr(s"((rn - 1) * 1000000) div ${total - 1}"))
      .drop("_pid", "_lrn", "_opid", "_offset")
  }
}
