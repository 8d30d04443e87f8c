package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed (co-located) joins — the repeated-join shuffle eliminator
  * at 100 TB (SURVEY §7: "bucketing for co-located joins"; the
  * reference's analog is pre-partitioned connector tables). Writing
  * both fact and dim bucketed by the join key means every subsequent
  * join on that key reads matching buckets in place: NO exchange on
  * either side, ever — the shuffle is paid once at write time and
  * amortized over every downstream join.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("join of two tables bucketed on the key runs with ZERO " +
      "exchanges (the shuffle was paid at write time)") {
    val conf = spark.conf
    val savedBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join regime — broadcast would mask the
      // co-location this layout exists to prove
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.lineitem(spark, TestSpark.sf)
        .write.mode("overwrite")
        .bucketBy(8, "l_partkey").sortBy("l_partkey")
        .saveAsTable("bkt_lineitem")
      Tables.part(spark, TestSpark.sf)
        .write.mode("overwrite")
        .bucketBy(8, "p_partkey").sortBy("p_partkey")
        .saveAsTable("bkt_part")
      val joined = spark.table("bkt_lineitem")
        .join(spark.table("bkt_part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must read bucket-aligned scans in place: no
      // exchange below the join on either side (the aggregate above
      // it may still shuffle on p_brand — that one is allowed)
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange"),
        s"bucketed join must not exchange either side:\n$plan")
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan)
      // same result as the plain parquet join
      val expected = Tables.lineitem(spark, TestSpark.sf)
        .join(Tables.part(spark, TestSpark.sf),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity")).as("qty"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expected)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
      spark.sql("DROP TABLE IF EXISTS bkt_part")
    }
  }
}
