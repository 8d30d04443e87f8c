package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter injection (InjectRuntimeFilter) — the
  * shuffle-join scan-pruning lever at 100 TB: a selective filter on
  * the dimension side injects a bloom probe into the FACT side's
  * scan, so fact rows that cannot join are dropped before the
  * shuffle. On local test data every size threshold blocks it, so
  * this spec pins the CONDITIONS under which Spark injects the
  * filter — the session-level knobs a deployment must carry — rather
  * than trusting that defaults fire at scale.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a selective dim filter injects bloom_filter_might_contain on " +
      "the fact side of a shuffle join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // local parquet is KBs; production threshold (10GB) exists so the
      // probe only pays off on big scans — drop it to exercise the path
      conf.set("spark.sql.optimizer.runtime.bloomFilter" +
        ".applicationSideScanSizeThreshold", "0")
      // broadcast joins reuse the broadcast instead of a bloom filter;
      // force the shuffle-join regime the filter exists for
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val li = graft.Tables.lineitem(spark, TestSpark.sf)
      val dim = graft.Tables.part(spark, TestSpark.sf)
        .filter(col("p_size") < 3) // selective creation side
      val joined = li.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity")).as("qty"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") &&
        opt.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter on the fact side:\n$opt")
      // and the result is unchanged by the probe (it only prunes
      // non-joining rows)
      val expected = {
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        val e = li.join(dim, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(sum(col("l_quantity")).as("qty"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        e
      }
      val got = joined.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expected)
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }
}
