package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join splitting (OptimizeSkewedJoin) — the runtime
  * complement to the static salting in `operators/Salting.scala`: at
  * 100 TB a hot join key lands one straggler partition that dominates
  * the stage, and AQE re-plans it into N sub-partitions joined against
  * a replicated other side. Local test data never crosses the
  * production thresholds (256 MB advisory size, 5x median factor), so
  * — exactly like RuntimeFilterSpec — this pins the CONDITIONS under
  * which Spark splits a skewed partition (the knobs a deployment must
  * carry) and that the split never changes the join result.
  */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("AQE splits a skewed sort-merge join partition (skew=true) " +
      "without changing the result") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // production: a partition is skewed when > factor x median AND
      // > threshold bytes; the local hot key is ~100 KB, so lower the
      // absolute floor (and the advisory target the splitter cuts to)
      // to exercise the same code path the 256 MB defaults gate at
      // scale
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin" +
        ".skewedPartitionThresholdInBytes", "16k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
      // coalescing tiny partitions first would merge away the skew
      // signal on KB-scale data
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // skew splitting only applies to shuffle joins — force SMJ
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      import spark.implicits._
      // one hot key (0) carrying ~half the left side, against a
      // moderate right side with the same key space; payloads keep the
      // hot partition above the byte threshold (and must survive into
      // the checksum or pruning re-shrinks it below). NOTE: a keyed
      // aggregate directly on the join output would BLOCK the split —
      // OptimizeSkewedJoin refuses when the join's hash partitioning
      // is still required downstream — so the check aggregates with an
      // order-insensitive global checksum instead; at scale that is
      // exactly why skewed-join stages are usually followed by
      // partial aggs, not key-preserving ones.
      val left = spark.range(0, 60000)
        .select(when($"id" % 2 === 0, 0L).otherwise($"id" % 97).as("k"),
          concat(lit("payload_left_"), $"id").as("pl"))
      val right = spark.range(0, 2000)
        .select(($"id" % 97).as("k"),
          concat(lit("payload_right_"), $"id").as("pr"))
      def checksum(skewed: Boolean): (Long, Long, String) = {
        conf.set("spark.sql.adaptive.skewJoin.enabled", skewed.toString)
        val j = left.join(right, "k")
          .agg(count(lit(1)).as("n"),
            bit_xor(xxhash64($"k", $"pl", $"pr")).as("h"))
        val r = j.collect()(0)
        val plan = j.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        (r.getLong(0), r.getLong(1), plan)
      }
      val (n1, h1, plan) = checksum(skewed = true)
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot partition skew=true:\n$plan")
      val (n0, h0, _) = checksum(skewed = false)
      assert((n1, h1) == ((n0, h0)),
        "skew splitting must not change the join result")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }
}
