package graft

import graft.dsreal.{DsScale, DsTables}
import graft.examples.DsScalingProbe.normalize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Durable (CI-sized) half of the TPC-DS scaling evidence: the star
  * replicator must produce a CONSISTENT mult-x instance (facts grow
  * mult-x, fact->dim joins lose nothing new), and the heavy dsreal
  * queries' optimized plans must be IDENTICAL across 1x/2x/4x data —
  * a plan that flips shape with volume (broadcast -> shuffle, a new
  * Expand, a cartesian) would invalidate every "this plan survives
  * 100x" claim. The wall-time half (near-linear growth at sf0.1 up to
  * 8x) lives in examples/DsScalingProbe; its measured results are
  * recorded in COVERAGE.md.
  */
class DsScalingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dirs: Map[Int, String] = Seq(1, 2, 4).map { m =>
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_dsscale_spec_${m}x").toString
    DsScale.replicate(spark, TestSpark.sf, dir, m)
    m -> dir
  }.toMap

  test("replication grows every fact channel and the item/customer " +
      "dims exactly mult-x, with disjoint key ranges") {
    val base = DsTables.storeSales(spark, dirs(1)).count()
    assert(base > 0)
    Seq(2, 4).foreach { m =>
      assert(DsTables.storeSales(spark, dirs(m)).count() == base * m,
        s"store_sales at ${m}x")
    }
    val items1 = DsTables.item(spark, dirs(1)).count()
    assert(DsTables.item(spark, dirs(4)).count() == items1 * 4)
    val cust1 = DsTables.customerDim(spark, dirs(1)).count()
    assert(DsTables.customerDim(spark, dirs(4)).count() == cust1 * 4)
    // keys disjoint: 4x the distinct keys, not 4 overlapping copies
    val k1 = DsTables.storeSales(spark, dirs(1))
      .select($"ss_item_sk", $"ss_ticket_number").distinct().count()
    val k4 = DsTables.storeSales(spark, dirs(4))
      .select($"ss_item_sk", $"ss_ticket_number").distinct().count()
    assert(k4 == k1 * 4, "replica key ranges overlap")
  }

  test("replication keeps fact->dim integrity: no replicated fact row " +
      "loses its item or customer") {
    val facts = DsTables.storeSales(spark, dirs(4))
    val items = DsTables.item(spark, dirs(4))
    assert(facts.join(items, $"ss_item_sk" === $"i_item_sk", "left_anti")
      .isEmpty, "orphaned ss_item_sk after replication")
    val cust = DsTables.customerDim(spark, dirs(4))
    assert(facts.filter($"ss_customer_sk".isNotNull)
      .join(cust, $"ss_customer_sk" === $"c_customer_sk", "left_anti")
      .isEmpty, "orphaned ss_customer_sk after replication")
  }

  DsScale.HeavyQueries.foreach { q =>
    test(s"$q optimized plan is volume-stable across 1x/2x/4x") {
      val plans = Seq(1, 2, 4).map { m =>
        m -> normalize(SparkEntry.queries(q)(spark, dirs(m))
          .queryExecution.optimizedPlan.toString)
      }
      plans.tail.foreach { case (m, p) =>
        assert(p == plans.head._2,
          s"$q plan changed shape between 1x and ${m}x data")
      }
    }
  }
}
