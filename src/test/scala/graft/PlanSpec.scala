package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape tests (SURVEY §5: the analog of Flink's golden-plan XML
  * files): assert the optimizations we rely on for 100 TB viability are
  * actually present in the physical plan. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q1_agg: shipdate filter is pushed into the parquet scan") {
    val p = planOf("q1_agg")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
  }

  test("q_sort_limit: column pruning (only 2 columns read) + TakeOrderedAndProject") {
    val p = planOf("q_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("o_orderkey") && readSchema.contains("o_totalprice"))
    assert(!readSchema.contains("o_custkey"), readSchema)
  }

  test("q_multiway_join: dimensions are broadcast") {
    val p = planOf("q_multiway_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_topn: filter over rank compiles to WindowGroupLimit") {
    val p = planOf("q_topn")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q1_agg: partial aggregation before the shuffle") {
    val p = planOf("q1_agg")
    assert(p.contains("HashAggregate"), p)
    // partial + final pairs
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("whole-stage codegen covers the scan->filter->agg pipeline") {
    val df = SparkEntry.queries("q1_agg")(spark, TestSpark.sf)
    df.collect() // materialize the AQE final plan
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen'd spans
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, p)
  }
}
