package graft.ext

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed ordered prefix sum (running total) — the scalable form
  * of `sum(x) OVER (PARTITION BY g ORDER BY k ROWS UNBOUNDED
  * PRECEDING)`. A window does that with ONE task per group: a 100 TB
  * corpus with 20 sources runs on 20 cores. This operator instead
  * range-partitions by (group, key) and runs the textbook two-phase
  * scan: per-partition local running sums (parallel), prefix-sum of
  * the tiny per-(partition, group) subtotal table, then a broadcast
  * join adds each group's base back (parallel).
  *
  * Determinism note: the partition id and the local running sum are
  * computed in the SAME pass and the result is pinned with an eager
  * Materialize.pin before anything reads it twice. Range-partition
  * boundaries come from sampling, so a recomputation could place rows
  * differently — deriving subtotals and finals from two separate
  * materializations produced partition-base mismatches under a busy
  * session. After the checkpoint the tagged rows are immutable blocks:
  * bases and finals always agree.
  *
  * Reference posture: Flink's batch sort (BinaryExternalSorter.java:69)
  * feeds the same shape — range-partition then per-partition
  * sequential scan; only the subtotal table (partitions x groups rows)
  * leaves the executors.
  */
object PrefixSum {

  /** Adds `cum_before` = sum of `valueCol` over rows of the same
    * `groupCol` strictly before this row in `orderCol` order.
    * Input columns must be castable to (group: String, order: Long,
    * value: Long); output columns: groupCol, orderCol, valueCol,
    * cum_before. */
  def cumBefore(spark: SparkSession, df: DataFrame, groupCol: String,
      orderCol: String, valueCol: String, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // ONE pass computes (pid, local running sum) together; the eager
    // localCheckpoint pins the placement so every consumer sees the
    // same rows in the same partitions.
    val tagged = df
      .select(col(groupCol).cast("string").as("g"),
        col(orderCol).cast("long").as("k"), col(valueCol).cast("long").as("v"))
      .as[(String, Long, Long)]
      .repartitionByRange(n, col("g"), col("k"))
      .sortWithinPartitions(col("g"), col("k"))
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val running = scala.collection.mutable.HashMap[String, Long]()
        it.map { case (g, k, v) =>
          val before = running.getOrElse(g, 0L)
          running(g) = before + v
          (pid, g, k, v, before)
        }
      }
      .toDF("pid", "g", "k", "v", "local_before")
      .transform(Materialize.pin)
    // Subtotal table: partitions x groups rows — small relative to the
    // data, but it stays DISTRIBUTED (no driver collect): the running
    // base per (pid, g) is a window over pid within each group, i.e.
    // one task per group over ~`partitions` rows, never per data row,
    // so a high-cardinality groupCol cannot OOM the driver. The slice's
    // contribution to later partitions is its SUM (not max of prefixes
    // — that breaks on negative values). The bases frame is broadcast
    // back onto the tagged rows; at partitions x groups beyond broadcast
    // size, drop the hint and let AQE pick the join side.
    val subtotals = tagged.groupBy($"pid", $"g")
      .agg(sum($"v").as("subtotal"))
    val wBase = Window.partitionBy($"g").orderBy($"pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = subtotals
      .select($"pid", $"g",
        coalesce(sum($"subtotal").over(wBase), lit(0L)).as("base"))
    tagged.join(broadcast(bases), Seq("pid", "g"), "left")
      .select(col("g").as(groupCol), col("k").as(orderCol),
        col("v").as(valueCol),
        (col("local_before") + coalesce(col("base"), lit(0L))).as("cum_before"))
  }
}
