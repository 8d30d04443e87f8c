package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must at least execute end-to-end on the smoke
  * dataset (correctness itself is gated by the DuckDB differential —
  * tools/diffcheck.py / the driver's t2 gate). */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes on sf0.001") {
      val n = fn(spark, TestSpark.sf).count()
      assert(n >= 0)
    }
  }
}
