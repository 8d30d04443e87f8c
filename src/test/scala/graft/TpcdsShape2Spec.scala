package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the second-wave TPC-DS battery
  * (operators/TpcdsShapePack2.scala). Value-level correctness is gated
  * by the DuckDB differential; these pin the scale-relevant plan
  * properties of each newly covered shape family.
  */
class TpcdsShape2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  test("q_tpcds_channel_rollup: derived channel column rolls up through " +
      "ONE Expand over ONE fact scan (TPC-DS's three channel tables " +
      "must not become three scans)") {
    val p = plan("q_tpcds_channel_rollup")
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert("Scan parquet".r.findAllIn(p).length == 4, p) // li+ord+supp+nat
    assert(p.contains("partial_"), s"expected map-side partial agg:\n$p")
  }

  test("q_tpcds_union_rollup: three per-channel dim chains union at " +
      "pre-aggregated granularity, then ONE Expand re-aggregate " +
      "(the rollup runs over ~channels x nations rows, not the fact)") {
    val p = plan("q_tpcds_union_rollup")
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(p.contains("Union"), p)
  }

  test("q_tpcds_3chan_yoy: per-channel aggregates join prior-year on " +
      "(chan, brand) — equi join, no cartesian") {
    val p = plan("q_tpcds_3chan_yoy")
    assert(p.contains("Union"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_tpcds_order_profile: COUNT(DISTINCT) profile re-joined to " +
      "dims with a windowed qualifying-order count (no self-join of " +
      "the fact)") {
    val p = plan("q_tpcds_order_profile")
    assert(p.contains("Window"), p)
    assert("Scan parquet".r.findAllIn(p).length == 3, p) // li+ord+cust
  }

  test("q_tpcds_monthshare / q_tpcds_classshare: share-of-whole via a " +
      "window over the grouped frame — the whole-partition sum must " +
      "not become a separate aggregate + re-join") {
    Seq("q_tpcds_monthshare", "q_tpcds_classshare").foreach { q =>
      val p = plan(q)
      assert(p.contains("Window"), s"$q:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      // one fact scan + one dim scan, never a second fact pass
      assert("Scan parquet".r.findAllIn(p).length == 2, s"$q:\n$p")
    }
  }

  test("q_tpcds_triunion: three filtered slices re-aggregate through " +
      "one Union (partial aggs push below the union)") {
    val p = plan("q_tpcds_triunion")
    assert(p.contains("Union"), p)
    assert(p.contains("partial_"), p)
  }

  test("q_tpcds_cov: variance test is pure BIGINT moments; the " +
      "consecutive-month self-join is an equi join on the supplier") {
    val p = plan("q_tpcds_cov")
    assert(!p.contains("CartesianProduct"), p)
    val rows = SparkEntry.queries("q_tpcds_cov")(spark, TestSpark.sf).collect()
    rows.foreach { r =>
      Seq(("n1", "sx1", "sxx1"), ("n2", "sx2", "sxx2")).foreach {
        case (nc, sxc, sxxc) =>
          val n = r.getAs[Long](nc)
          val sx = r.getAs[Long](sxc)
          val sxx = r.getAs[Long](sxxc)
          assert(n > 1 && n * (n * sxx - sx * sx) > (n - 1) * sx * sx,
            r.toString)
      }
    }
  }

  test("q_tpcds_beforeafter: both split sums come from ONE conditional " +
      "aggregate pass (no per-side rescan)") {
    val p = plan("q_tpcds_beforeafter")
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q_tpcds_disjunct: the 3-arm OR predicate stays ONE Filter over " +
      "one join tree — no per-arm union of scans") {
    val p = plan("q_tpcds_disjunct")
    assert(!p.contains("Union"), p)
    assert("Scan parquet".r.findAllIn(p).length == 3, p)
  }

  test("q_tpcds_monthpivot: 12 month columns from ONE fact scan " +
      "(12 conditional sums, not 12 passes)") {
    val p = plan("q_tpcds_monthpivot")
    assert("Scan parquet".r.findAllIn(p).length == 2, p) // li + supplier
    assert(p.contains("partial_"), p)
  }

  test("q_tpcds_balanced: three channel sums in one grouped pass; the " +
      "balance band is integer cross-multiplication") {
    val p = plan("q_tpcds_balanced")
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
    val rows =
      SparkEntry.queries("q_tpcds_balanced")(spark, TestSpark.sf).collect()
    rows.foreach { r =>
      val (a, b, c) = (r.getAs[Long]("amt_r"), r.getAs[Long]("amt_n"),
        r.getAs[Long]("amt_a"))
      val tot = a + b + c
      Seq(a, b, c).foreach { ch =>
        assert(ch * 6 >= tot && ch * 2 <= tot, r.toString)
      }
    }
  }

  test("q_tpcds_promoratio: both scalars from ONE scan (TPC-DS's two " +
      "cross-joined scalar subqueries collapse to conditional sums)") {
    val p = plan("q_tpcds_promoratio")
    assert("Scan parquet".r.findAllIn(p).length == 3, p) // li+ord+cust
    assert(!p.contains("CartesianProduct"), p)
    val r = SparkEntry.queries("q_tpcds_promoratio")(spark, TestSpark.sf)
      .collect().head
    val ppm = r.getAs[Long]("promo_ppm")
    assert(ppm >= 0 && ppm <= 1000000, r.toString)
  }

  test("q_tpcds_itemavail: the price band prunes the part dimension " +
      "BEFORE the fact join (PushedFilters on the dim scan)") {
    val p = plan("q_tpcds_itemavail")
    assert(p.contains("PushedFilters: [IsNotNull(p_retailprice)"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_tpcds_salesgap: two year-slices of the fact join on the part " +
      "key; unit-price growth is BIGINT cross-multiplied") {
    val p = plan("q_tpcds_salesgap")
    assert(!p.contains("CartesianProduct"), p)
    val rows =
      SparkEntry.queries("q_tpcds_salesgap")(spark, TestSpark.sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("amt96") * r.getAs[Long]("qty95") >
        r.getAs[Long]("amt95") * r.getAs[Long]("qty96"), r.toString)
    }
  }

  test("q_tpcds_citymismatch: 4-table star chain is all equi joins") {
    val p = plan("q_tpcds_citymismatch")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
