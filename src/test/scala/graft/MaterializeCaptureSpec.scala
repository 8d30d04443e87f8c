package graft

import graft.ext.Materialize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Materialize's conf-gated pinned-subplan capture (plan-evidence
  * tooling: a top-level explain stops at a pin's ExistingRDD scan, so
  * PlanDump drains this capture to record what the pin job actually
  * ran — e.g. the PPJoin verification joins inside
  * JaccardJoin.selfJoin, invisible from q_ngram_jaccard's final plan).
  */
class MaterializeCaptureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("capture off (default): pin records nothing") {
    val sp = spark
    import sp.implicits._
    sp.conf.unset(Materialize.CapturePinsConf)
    Materialize.drainCapturedPlans() // clear anything a prior test left
    val pinned = Materialize.pin(
      Seq(1L, 2L, 3L).toDF("v").select(($"v" * 2).as("w")))
    assert(pinned.count() == 3)
    assert(Materialize.drainCapturedPlans().isEmpty)
    Materialize.release(pinned)
  }

  test("capture on: pin records the pinned frame's formatted plan, and " +
      "the drain empties the buffer") {
    val sp = spark
    import sp.implicits._
    Materialize.drainCapturedPlans()
    sp.conf.set(Materialize.CapturePinsConf, "true")
    try {
      // range (not a local Seq): a filter over a LocalRelation is
      // constant-folded away at optimize time and would leave nothing
      // recognizable in the captured plan
      val pinned = Materialize.pin(
        sp.range(3).toDF("v").filter($"v" > 0L))
      assert(pinned.count() == 2)
      val plans = Materialize.drainCapturedPlans()
      // exactly this pin's subplan, rendered formatted (the pinned
      // frame's operators are visible even though pinned's own plan is
      // an ExistingRDD scan)
      assert(plans.size == 1)
      assert(plans.head.contains("Physical Plan"))
      assert(plans.head.contains("Filter"))
      assert(Materialize.drainCapturedPlans().isEmpty)
      Materialize.release(pinned)
    } finally sp.conf.unset(Materialize.CapturePinsConf)
  }
}
