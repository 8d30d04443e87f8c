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

  test("CORRECTNESS is scale-invariant: every heavy query is oracle-" +
      "exact on the 2x replicated star (DuckDB rebuild via diffcheck)") {
    // r12 ran this parity check manually (COVERAGE.md paragraph); this
    // test makes it a standing suite gate: run each heavy query on the
    // 2x-replica base, dump Verify-layout parquet + oracle_sql.json,
    // and drive the SAME tools/diffcheck.py the driver-replica gate
    // uses — DuckDB rebuilds the derived star from the replicated base
    // tables and must hash-match. A query whose result only matches at
    // 1x (e.g. an accidental LIMIT-without-ORDER or a key-collision
    // assumption the replica's shifted keys break) fails here.
    val out = java.nio.file.Files
      .createTempDirectory("graft_scale_parity").toString
    DsScale.HeavyQueries.foreach { q =>
      SparkEntry.queries(q)(spark, dirs(2))
        .write.mode("overwrite").parquet(s"$out/$q")
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    DsScale.HeavyQueries.foreach(q => node.put(q, SparkEntry.oracleSql(q)))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      mapper.writeValueAsBytes(node))
    val cmd = Seq("python3", "tools/diffcheck.py", dirs(2), out) ++
      DsScale.HeavyQueries
    val proc = new ProcessBuilder(cmd: _*)
      .directory(new java.io.File(sys.props("user.dir")))
      .redirectErrorStream(true).start()
    val log = scala.io.Source.fromInputStream(proc.getInputStream)
      .mkString
    val code = proc.waitFor()
    assert(code == 0 && log.contains(" 0 fail"),
      s"2x-replica oracle parity failed (exit $code):\n$log")
    assert(log.contains(s"== ${DsScale.HeavyQueries.size} pass"),
      s"expected ${DsScale.HeavyQueries.size} passes:\n$log")
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
