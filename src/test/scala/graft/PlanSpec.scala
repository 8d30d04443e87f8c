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

  test("parquet aggregate pushdown: bare count/min/max resolve from " +
      "footer metadata, no row scan") {
    // the 100-TB lever for stats queries: with aggregatePushDown on,
    // COUNT(*)/MIN/MAX over an unfiltered parquet table read row-group
    // footers only (PushedAggregation in the scan). Needs the DSv2
    // parquet reader, so run in an ISOLATED newSession (own SQLConf —
    // flipping useV1SourceList on the shared session would change scan
    // nodes under concurrently-running suites). Values must agree with
    // the shared session's row-scan path bit-for-bit.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    def stats(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.min("l_quantity").as("qmin"),
          org.apache.spark.sql.functions.max("l_quantity").as("qmax"))
    val df = stats(s2)
    val p = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PushedAggregation"), p)
    val pushed = df.collect()(0)
    val scanned = stats(spark).collect()(0)
    assert(pushed == scanned, s"footer stats $pushed vs scan $scanned")
  }
}
