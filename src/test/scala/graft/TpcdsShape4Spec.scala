package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the fourth-wave TPC-DS battery
  * (operators/TpcdsShapePack4.scala). */
class TpcdsShape4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  test("q_tpcds_rollup4: the 4-column rollup (5 grouping sets) still " +
      "costs ONE Expand + one partial/final aggregate") {
    val p = plan("q_tpcds_rollup4")
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(p.contains("partial_"), p)
    val rows = SparkEntry.queries("q_tpcds_rollup4")(spark, TestSpark.sf)
      .collect()
    // all 5 rollup levels present: gid 0 (detail) .. 15 (grand total)
    assert(rows.map(_.getAs[Long]("gid")).toSet == Set(0L, 1L, 3L, 7L, 15L),
      rows.map(_.getAs[Long]("gid")).toSet.toString)
  }

  test("q_tpcds_hybridfilter: literal-IN OR subquery-IN plans as an " +
      "ExistenceJoin feeding one Filter — never a union of two scans " +
      "and never a cartesian") {
    val df = SparkEntry.queries("q_tpcds_hybridfilter")(spark, TestSpark.sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("ExistenceJoin"), opt)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Union"), p)
  }

  test("q_tpcds_distinct_buckets: four filtered COUNT(DISTINCT)s run " +
      "through ONE Expand over ONE scan (not TPC-DS's six subquery " +
      "rescans)") {
    val p = plan("q_tpcds_distinct_buckets")
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }
}
