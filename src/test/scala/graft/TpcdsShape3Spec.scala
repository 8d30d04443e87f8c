package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the third-wave TPC-DS battery
  * (operators/TpcdsShapePack3.scala). */
class TpcdsShape3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  test("q_tpcds_weekpivot: weekday pivot frames join on the integer " +
      "week position — one scan per year frame, equi join") {
    val p = plan("q_tpcds_weekpivot")
    assert("Scan parquet".r.findAllIn(p).length == 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_tpcds_threeway: three channel legs join symmetrically on " +
      "the item key — equi joins only") {
    val p = plan("q_tpcds_threeway")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    val rows = SparkEntry.queries("q_tpcds_threeway")(spark, TestSpark.sf)
      .collect()
    rows.foreach { r =>
      val s = Seq("share_r_ppm", "share_n_ppm", "share_a_ppm")
        .map(r.getAs[Long](_)).sum
      // three half-up ppm shares of one total: sum within rounding slack
      assert(s >= 999998 && s <= 1000002, r.toString)
    }
  }

  test("q_tpcds_shortage: the 60-day date-offset inequality rides the " +
      "orderkey equi join as a post-condition (no cartesian, no " +
      "nested-loop fallback)") {
    val p = plan("q_tpcds_shortage")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_tpcds_nullchan: the partial dimension joins LEFT OUTER and " +
      "the null branch is grouped, not dropped") {
    val p = plan("q_tpcds_nullchan")
    assert(p.contains("LeftOuter"), p)
    val rows = SparkEntry.queries("q_tpcds_nullchan")(spark, TestSpark.sf)
      .collect()
    // both the hit and the miss channel must be represented
    assert(rows.map(_.getAs[Boolean]("dim_missing")).toSet.size == 2,
      rows.mkString("\n"))
  }

  test("q_tpcds_ziplist: both membership tests resolve as semi joins " +
      "on the dimension side, before the fact join") {
    val p = plan("q_tpcds_ziplist")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_tpcds_crosschannel: ALL-three-channels membership narrows " +
      "via consecutive semi joins into ONE rollup Expand") {
    val p = plan("q_tpcds_crosschannel")
    assert("LeftSemi".r.findAllIn(p).length >= 3, p)
    assert("Expand".r.findAllIn(p).length == 1, p)
  }

  test("q_tpcds_rollup_distinct: ROLLUP + COUNT(DISTINCT) in one fact " +
      "pass — ONE rollup Expand; the single distinct folds into a " +
      "4-stage aggregate (keys+custkey pre-agg) instead of a second " +
      "Expand or a rescan") {
    val p = plan("q_tpcds_rollup_distinct")
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert("Scan parquet".r.findAllIn(p).length == 2, p) // orders+customer
    assert("HashAggregate".r.findAllIn(p).length >= 4, p)
    assert(p.contains("count(distinct"), p)
  }
}
