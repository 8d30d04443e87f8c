package graft

import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide plan audit: no query may silently plan a cartesian
  * product (the classic 100 TB killer). Queries that intentionally
  * cross tiny dimensions are allowlisted. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // intentional cross/theta joins over tiny inputs
  private val allowCartesian = Set("q_join_cross", "q_join_theta", "q_values")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans without an accidental cartesian product") {
      val plan = fn(spark, TestSpark.sf).queryExecution.executedPlan.toString
      val hasCartesian = plan.contains("CartesianProduct")
      if (allowCartesian(name)) succeed
      else assert(!hasCartesian, s"unexpected CartesianProduct in $name:\n$plan")
    }
  }

  // Per-row operators must stay shuffle-free: at 100 TB a stray
  // exchange on these would be the whole job cost. Budget = 0.
  private val shuffleFree = Seq("q_chunking", "q_token_count", "q_lang_id",
    "q_fingerprint", "q_embedding_lsh", "q_text_stats", "q_multimodal_meta",
    "q_hash_split", "q_stratified_sample", "q_pii_scrub", "q_winnowing",
    "q_embedding_quant")

  // The LSH dedup rewrite: per-bucket minima via a window, not a
  // persist + groupBy + re-join. The md5-heavy banded explode must
  // appear EXACTLY once in the plan (single evaluation) and nothing
  // may be registered in the session cache.
  test("q_minhash_lsh: banded signatures computed once, nothing cached") {
    val plan = SparkEntry.queries("q_minhash_lsh")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("InMemoryTableScan"),
      s"LSH dedup must not leave cache entries:\n$plan")
    val generates = "Generate posexplode".r.findAllIn(plan).length
    assert(generates == 1,
      s"banded explode must be evaluated exactly once, found $generates:\n$plan")
  }

  // Bounded-shuffle operators: exactly one exchange (the top-k window
  // partitioned by source). WindowGroupLimit must appear so map tasks
  // pre-trim to k rows before that shuffle.
  test("q_weighted_sample plans one shuffle with WindowGroupLimit pushdown") {
    val plan = SparkEntry.queries("q_weighted_sample")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    val shuffles = """Exchange (hash|range|SinglePartition)""".r
      .findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly one exchange:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit map-side trim:\n$plan")
  }

  shuffleFree.foreach { name =>
    test(s"$name plans zero shuffle exchanges (per-row operator)") {
      val plan = SparkEntry.queries(name)(spark, TestSpark.sf)
        .queryExecution.executedPlan.toString
      val shuffles = """Exchange (hash|range|SinglePartition)""".r
        .findAllIn(plan).length
      assert(shuffles == 0, s"$name should be shuffle-free:\n$plan")
    }
  }
}
