package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the TPC-DS-style battery
  * (operators/TpcdsShapePack.scala). Value-level correctness is gated
  * by the DuckDB differential; these tests pin the properties that
  * make the shapes scale — the ones TPC-H never exercises.
  */
class TpcdsShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  test("q_tpcds_rollup: ONE Expand feeding partial aggregation " +
      "(a rollup must not scan or shuffle once per grouping set)") {
    val p = plan("q_tpcds_rollup")
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(p.contains("partial_"), s"expected map-side partial agg:\n$p")
    // the three dimension joins must all broadcast — one fact shuffle max
    assert("BroadcastHashJoin".r.findAllIn(p).length == 3, p)
  }

  test("q_tpcds_buckets: eight conditional aggregates in a single scan " +
      "(no per-bucket rescan, no join)") {
    val p = plan("q_tpcds_buckets")
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Join"), s"single-pass agg must not join:\n$p")
  }

  test("q_tpcds_cumwin: per-channel cumulative windows + full outer join") {
    val p = plan("q_tpcds_cumwin")
    assert(p.contains("FullOuter"), p)
    assert("RunningWindowFunction|Window".r.findAllIn(p).nonEmpty, p)
  }

  test("q_tpcds_winjoin: window over the dimension join, dim broadcast") {
    val p = plan("q_tpcds_winjoin")
    assert(p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_tpcds_cte_reuse and q_tpcds_freq_cte: derived sets consumed " +
      "via semi joins (no materialized pair blowup)") {
    Seq("q_tpcds_cte_reuse", "q_tpcds_freq_cte").foreach { q =>
      val p = plan(q)
      assert(p.contains("LeftSemi"), s"$q:\n$p")
    }
  }

  test("q_tpcds_rank_rollup ranks within (gid, parent) partitions " +
      "and keeps rank <= 3") {
    val rows = SparkEntry.queries("q_tpcds_rank_rollup")(spark, TestSpark.sf)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("rk") <= 3L))
    // grand-total row (gid = all bits set for 3 rollup cols) exists once
    assert(rows.count(_.getAs[Long]("gid") == 7L) == 1)
  }

  test("q_tpcds_ret_above_avg / q_tpcds_scalar_sub: the decorrelated " +
      "group-average joins back via BROADCAST (never a fact shuffle " +
      "for a per-group scalar)") {
    Seq("q_tpcds_ret_above_avg", "q_tpcds_scalar_sub").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q:\n$p")
      assert(p.contains("partial_"), s"$q expected partial agg:\n$p")
    }
  }

  test("q_tpcds_intersect: INTERSECT/EXCEPT lower to semi/anti joins " +
      "over distinct sets (no pair materialization)") {
    val p = plan("q_tpcds_intersect")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("q_tpcds_exists_chain: EXISTS chain is two semi joins + one " +
      "anti join, no cartesian") {
    val p = plan("q_tpcds_exists_chain")
    assert("LeftSemi".r.findAllIn(p).length >= 2, p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_tpcds_share: the corpus-total scalar joins as a single-row " +
      "broadcast, never a shuffle") {
    val p = plan("q_tpcds_share")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_tpcds_timebucket: two bucket counts in ONE scan of events " +
      "(no per-bucket rescan)") {
    val p = plan("q_tpcds_timebucket")
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q_tpcds_bestworst: two opposite rankings join WITHOUT a " +
      "cartesian (equi on group+rank)") {
    val p = plan("q_tpcds_bestworst")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("WindowGroupLimit") || p.contains("Window"), p)
  }

  test("q_tpcds_rebuy: triple fact chain is all equi joins, " +
      "no cartesian") {
    val p = plan("q_tpcds_rebuy")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_tpcds_rankgate: the rank filter gates the rollup via a semi " +
      "join and ONE Expand") {
    val p = plan("q_tpcds_rankgate")
    assert(p.contains("LeftSemi"), p)
    assert("Expand".r.findAllIn(p).length == 1, p)
  }

  test("q_tpcds_aging: four latency buckets in one grouped pass, " +
      "dims broadcast") {
    val p = plan("q_tpcds_aging")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // one partial+final agg pair, not one per bucket
    assert("HashAggregate".r.findAllIn(p).length <= 4, p)
  }

  test("q_tpcds_yoy growth test is exact integer arithmetic " +
      "(every surviving customer really grew >20%)") {
    SparkEntry.queries("q_tpcds_yoy")(spark, TestSpark.sf)
      .collect().foreach { r =>
        val t95 = r.getAs[Long]("t95_cents")
        val t96 = r.getAs[Long]("t96_cents")
        assert(t95 > 0 && t96 * 10 > t95 * 12, r.toString)
      }
  }

  test("q_tpcds_notin: NOT IN plans as a NULL-AWARE anti join " +
      "(plain LeftAnti would silently change NULL semantics)") {
    val p = SparkEntry.queries("q_tpcds_notin")(spark, TestSpark.sf)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("LeftAnti") &&
      (p.contains("isnull") || p.contains("IsNull")),
      s"expected null-aware anti join condition:\n$p")
  }

  test("q_tpcds_multidistinct: three COUNT(DISTINCT)s split through " +
      "ONE Expand, one scan (not one scan per distinct)") {
    val p = plan("q_tpcds_multidistinct")
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("q_tpcds_lateral: correlated LATERAL LIMIT decorrelates to a " +
      "windowed pass (no per-outer-row re-execution, no cartesian)") {
    val p = plan("q_tpcds_lateral")
    assert(p.contains("Window") || p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_tpcds_returnratio: both leaderboards rank integer ppm " +
      "ratios (rank order can never flip between engines)") {
    val rows = SparkEntry.queries("q_tpcds_returnratio")(spark, TestSpark.sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("ret_ppm")
      assert(ppm >= 0 && ppm <= 1000000, r.toString)
    }
  }

  test("q_tpcds_returns_profit: per-line returns LEFT join + one " +
      "Expand rollup, dims broadcast") {
    val p = plan("q_tpcds_returns_profit")
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(p.contains("LeftOuter"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
