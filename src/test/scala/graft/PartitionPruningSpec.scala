package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-pruning levers (SURVEY §4: scan-reduction guarantees the
  * 100-TB posture rests on, alongside PushedFilters/ReadSchema in
  * `PlanSpec`). The driver tables ship as single unpartitioned files,
  * so these tests lay the fact out partitioned by year first — the
  * layout a 100-TB table would actually use — then pin:
  *
  *   - STATIC pruning: a literal filter on the partition column must
  *     land in the scan's PartitionFilters (directory-level skip, no
  *     footer even opened for other years);
  *   - DYNAMIC pruning (DPP): a join against a filtered dim on the
  *     partition column must inject a dynamicpruning subquery into the
  *     scan, so only the dim-selected years are read even though the
  *     literal never mentions them.
  *
  * Both paths must return exactly the rows the unpartitioned layout
  * returns.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.lineitem(spark, TestSpark.sf)
      .withColumn("yr", year($"l_shipdate"))
      .write.partitionBy("yr").mode("overwrite").parquet(d)
    d
  }

  test("static partition pruning: literal year filter becomes a " +
      "PartitionFilter (directory skip)") {
    val df = spark.read.parquet(dir)
      .filter($"yr" === 1995)
      .agg(count(lit(1)).as("n"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = p.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("(yr#")),
      s"year filter must prune partitions, plan:\n$p")
    val expected = Tables.lineitem(spark, TestSpark.sf)
      .filter(year($"l_shipdate") === 1995).count()
    assert(df.collect()(0).getLong(0) == expected)
  }

  test("dynamic partition pruning: a filtered dim joined on the " +
      "partition column injects a dynamicpruning subquery") {
    // the dim must be a SCAN with a live filter — a literal local
    // relation constant-folds the predicate away and DPP's
    // selective-predicate check never fires
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dppd").toString
    Seq((1995, "KEEP"), (1996, "DROP"), (1997, "DROP"))
      .toDF("d_yr", "tag").write.mode("overwrite").parquet(dimDir)
    val joined = spark.read.parquet(dir)
      .join(spark.read.parquet(dimDir).filter($"tag" === "KEEP"),
        $"yr" === $"d_yr")
      .agg(count(lit(1)).as("n"))
    joined.collect() // materialize so the DPP subquery actually runs
    val p = joined.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning expression in the scan, plan:\n$p")
    val expected = Tables.lineitem(spark, TestSpark.sf)
      .filter(year($"l_shipdate") === 1995).count()
    assert(joined.collect()(0).getLong(0) == expected,
      "DPP must not change results")
  }
}
