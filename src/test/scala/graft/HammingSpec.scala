package graft

import graft.functions.HammingDistance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HammingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hamming = popcount(xor), via Column API") {
    val df = Seq((0xFFL, 0x0FL), (5L, 5L), (0L, Long.MaxValue))
      .toDF("a", "b")
    val got = df.select(HammingDistance.hamming($"a", $"b")).as[Int].collect().toSeq
    assert(got == Seq(4, 0, 63))
  }

  test("hamming is codegen'd (no CodegenFallback in plan)") {
    val df = Seq((1L, 2L)).toDF("a", "b")
      .select(HammingDistance.hamming($"a", $"b").as("h"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CodegenFallback"), p)
  }

  test("hamming registered for SQL") {
    HammingDistance.register(spark)
    assert(spark.sql("SELECT hamming(255L, 15L) AS h").as[Int].head() == 4)
  }

  test("type check rejects non-bigint input") {
    // .schema asserts the rejection at ANALYSIS without launching a
    // job. (Spark still posts the analysis failure to the async
    // ExecutionListenerBus, whose ObservationManager listener logs one
    // ERROR stack — inherent to any deliberately-failing analysis,
    // same class as the CRC-tamper/constraint-violation tests.)
    val e = intercept[Exception] {
      Seq(("x", 1L)).toDF("a", "b")
        .select(HammingDistance.hamming($"a", $"b")).schema
    }
    assert(e.getMessage.toLowerCase.contains("hamming") ||
      e.getMessage.toLowerCase.contains("type"))
  }
}
