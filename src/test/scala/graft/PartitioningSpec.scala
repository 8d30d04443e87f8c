package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Flink partitioner surface (SURVEY §2.2 Exchange;
  * flink-streaming-java .../runtime/partitioner/: KeyGroup, Rebalance,
  * Rescale, Broadcast, Forward) mapped onto Spark exchanges. */
class PartitioningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keyBy -> repartition(col): hash partitioning on the key") {
    val p = Tables.orders(spark, TestSpark.sf)
      .repartition($"o_custkey")
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(o_custkey"), p)
  }

  test("rebalance -> repartition(n): round-robin partitioning") {
    val p = Tables.orders(spark, TestSpark.sf)
      .repartition(8)
      .queryExecution.executedPlan.toString
    assert(p.contains("RoundRobinPartitioning(8)"), p)
  }

  test("rescale/forward -> coalesce: no shuffle, partition merge only") {
    val df = Tables.orders(spark, TestSpark.sf).coalesce(1)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Coalesce 1"), p)
    assert(!p.contains("Exchange"), p) // narrow: never a shuffle
  }

  test("broadcast -> broadcast exchange feeding the join") {
    val big = Tables.orders(spark, TestSpark.sf)
    val dim = Tables.customer(spark, TestSpark.sf)
    val j = big.join(broadcast(dim), $"o_custkey" === $"c_custkey")
    j.collect()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"), p)
  }

  test("range partitioning backs global sort") {
    val p = Tables.orders(spark, TestSpark.sf)
      .orderBy($"o_totalprice")
      .queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning(o_totalprice"), p)
  }
}
