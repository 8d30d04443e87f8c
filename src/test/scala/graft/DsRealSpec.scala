package graft

import graft.dsreal.DsTables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the derived TPC-DS star schema (graft.dsreal) that
  * the q_dsreal_* oracle queries silently rely on. Each is a property
  * of the DERIVATION, checked once here so an oracle mismatch can be
  * attributed to query logic rather than schema drift.
  */
class DsRealSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def sf = TestSpark.sf
  import spark.implicits._

  test("date_dim: one row per day, integer quarters, exact sequences") {
    val dd = DsTables.dateDim(spark).cache()
    try {
      assert(dd.count() == DsTables.Days)
      assert(dd.select($"d_date_sk").distinct().count() == DsTables.Days)
      // d_qoy must be an exact integer 1..4 (the `/`-vs-`div` trap:
      // Spark's `/` is double division and once fragmented this col)
      val qoy = dd.select($"d_qoy").distinct().as[Int].collect().sorted
      assert(qoy.toSeq == Seq(1, 2, 3, 4))
      val probe = dd.filter($"d_date" === lit("2000-03-31").cast("date"))
        .select($"d_qoy", $"d_month_seq", $"d_week_seq").head()
      assert(probe.getInt(0) == 1)
      assert(probe.getLong(1) == (2000 - 1995) * 12 + 2)
    } finally dd.unpersist()
  }

  test("d_dow = d_date_sk % 7 is calendar-correct (epoch IS a Sunday)") {
    // q2's weekday pivot labels rest on this; the DuckDB oracle CANNOT
    // catch it being wrong (both engines share the same arithmetic),
    // so pin the semantic claim against the real calendar here.
    val mismatches = DsTables.dateDim(spark)
      .select($"d_dow", (dayofweek($"d_date") - 1).as("cal_dow"))
      .filter($"d_dow" =!= $"cal_dow")
      .count()
    assert(mismatches == 0,
      "d_dow must equal Spark's calendar day-of-week (0 = Sunday)")
  }

  test("fact channels partition lineitem exactly (no row lost or doubled)") {
    val n = Tables.lineitem(spark, sf).count()
    val parts = Seq(
      DsTables.storeSales(spark, sf).count(),
      DsTables.catalogSales(spark, sf).count(),
      DsTables.webSales(spark, sf).count())
    assert(parts.sum == n, s"channels ${parts.mkString("+")} != lineitem $n")
    assert(parts.forall(_ > 0), "every channel must be populated")
  }

  test("returns join back to their sale on (item_sk, ticket): no orphans") {
    // NOT exactly-once: the driver's lineitem contains duplicate
    // (l_orderkey, l_linenumber) pairs (11,785 at sf0.01), so tickets
    // can collide and a return may match >1 sale. Both engines
    // compute the same fanout from the same data, so oracle parity is
    // unaffected; what the queries DO rely on is that no return is
    // orphaned (q75/q78 left joins would silently drop the adjustment).
    val ss = DsTables.storeSales(spark, sf)
    val sr = DsTables.storeReturns(spark, sf)
    assert(sr.count() > 0)
    val orphans = sr.join(ss,
      $"sr_item_sk" === $"ss_item_sk" &&
        $"sr_ticket_number" === $"ss_ticket_number", "left_anti")
      .count()
    assert(orphans == 0, "every return must key back to at least one sale")
  }

  test("money columns are positive integer cents with consistent identities") {
    val bad = DsTables.storeSales(spark, sf)
      .filter($"ss_ext_sales_price_cents" <= 0 ||
        $"ss_wholesale_cost_cents" <= 0 ||
        $"ss_net_profit_cents" =!=
          $"ss_ext_sales_price_cents" - $"ss_wholesale_cost_cents" ||
        $"ss_sales_price_cents" > $"ss_ext_sales_price_cents" ||
        $"ss_list_price_cents" < $"ss_ext_sales_price_cents")
      .count()
    assert(bad == 0)
  }

  test("wholesale fraction varies by item (margin queries non-degenerate)") {
    val distinctMargins = DsTables.storeSales(spark, sf)
      .select(expr(
        "(ss_net_profit_cents * 100) div ss_ext_sales_price_cents"))
      .distinct().count()
    assert(distinctMargins >= 10,
      s"only $distinctMargins distinct margin pcts - degenerate derivation")
  }

  test("cross-channel items exist (q14/q23 INTERSECT semantics are live)") {
    def items(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(col(c).as("i")).distinct()
    val cross = items(DsTables.storeSales(spark, sf), "ss_item_sk")
      .intersect(items(DsTables.catalogSales(spark, sf), "cs_item_sk"))
      .intersect(items(DsTables.webSales(spark, sf), "ws_item_sk"))
      .count()
    assert(cross > 0, "no item sells in all three channels - q14a degenerate")
  }
}
