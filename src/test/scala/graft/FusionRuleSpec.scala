package graft

import graft.operators.SqlTextPack
import graft.plans.ScalarAggBankFusion
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the injected [[graft.plans.ScalarAggBankFusion]] analyzer rule
  * (r14 judge directive 2): with the rule ON, q9's raw SQL text — 15
  * scalar subqueries over the same derived fact, three per quantity
  * band — fuses into ONE conditional-aggregate pass; with the rule OFF
  * (runtime conf), Spark's stock MergeScalarSubqueries can only merge
  * the same-gate triples, leaving one fact pass PER BAND. Both shapes
  * are asserted, plus row equality between the two, so the rule can
  * never silently change results or silently stop firing.
  */
class FusionRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = TestSpark.sf

  private def q9Text: DataFrame =
    SqlTextPack.queries("q_sqltext_q9")(spark, d)

  /** Number of distinct fused subquery bodies in the optimized plan:
    * MergeScalarSubqueries leaves every ScalarSubquery holding
    * Project(GetStructField_i, <merged body>), so strip the top
    * Project and count distinct canonicalized bodies — one per
    * surviving fact pass. */
  private def mergedBodies(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case s: ScalarSubquery => s.plan match {
        case Project(_, c) => c.canonicalized
        case p => p.canonicalized
      }
    }).distinct.size

  private def withRule[A](on: Boolean)(body: => A): A = {
    spark.conf.set(ScalarAggBankFusion.EnabledKey, on.toString)
    try body finally spark.conf.unset(ScalarAggBankFusion.EnabledKey)
  }

  // r16 boundary note: the scan fan-out (graft.ext.FanOut, a
  // RepartitionByExpression over the lineitem scan) splits the fused
  // bank in two. MergeScalarSubqueries merges structurally and has no
  // Repartition case, so across branches whose column pruning differs
  // (count(*) needs only the gate column; the avg pairs also need the
  // price columns) the differently-pruned scans under the Repartition
  // block the merge, and the bank settles at TWO bodies: the 5
  // count-only sites in one pass, the 10 sum/count sites in another.
  // Both passes now run at full scan parallelism (pre-r16 the single
  // fused pass ran on ONE task — the fan-out is the better trade; see
  // OPTIMIZATION_r16.md). With the fan-out disabled the rule still
  // produces the single pass — pinned below so the 1-pass capability
  // cannot silently rot.
  test("rule ON: q9's 15 scalar subqueries fuse into two " +
      "conditional-aggregate passes under the scan fan-out " +
      "(count-pruned + avg-pruned)") {
    withRule(on = true) {
      val df = q9Text
      val subs = df.queryExecution.optimizedPlan.expressions
        .flatMap(_.collect { case s: ScalarSubquery => s })
      assert(subs.size == 15, s"expected 15 subquery sites, ${subs.size}")
      assert(mergedBodies(df) == 2,
        "the band gates did not fuse into the two pruning-split passes")
      assert(df.queryExecution.optimizedPlan.toString.contains(" FILTER ("),
        "fused aggregates lost their FILTER clauses")
    }
  }

  test("rule ON + fan-out OFF: the bank fuses into ONE pass (the r15 " +
      "single-pass shape is reachable whenever the scan is not fanned)") {
    spark.conf.set(graft.ext.FanOut.EnabledConf, "false")
    try withRule(on = true) {
      assert(mergedBodies(q9Text) == 1,
        "without the repartition barrier the bank must fuse to one pass")
    } finally spark.conf.unset(graft.ext.FanOut.EnabledConf)
  }

  test("rule OFF: stock planning leaves the pruning-split per-band " +
      "bodies, and the gate stays a pushable Filter") {
    withRule(on = false) {
      val df = q9Text
      // 5 bands x the same count/avg pruning split = 10 stock bodies
      // (2x what the injected rule leaves)
      assert(mergedBodies(df) == 10,
        "expected the 10 per-band pruning-split bodies with fusion disabled")
      assert(!df.queryExecution.optimizedPlan.toString.contains(" FILTER ("))
    }
  }

  test("rule ON and OFF return identical rows") {
    val on = withRule(on = true)(q9Text.collect().map(_.toSeq).toSeq)
    val off = withRule(on = false)(q9Text.collect().map(_.toSeq).toSeq)
    assert(on == off, s"fusion changed results\non=$on\noff=$off")
  }

  test("no-bank guard: a single gated scalar subquery is left alone " +
      "(its Filter keeps scan pushdown)") {
    graft.Tables.registerAll(spark, d)
    val df = spark.sql(
      """SELECT o_orderpriority,
                (SELECT count(*) FROM lineitem WHERE l_quantity > 25) AS c
         FROM orders LIMIT 1""")
    val subPlans = df.queryExecution.analyzed
      .collect { case n => n.expressions }.flatten
      .flatMap(_.collect { case s: ScalarSubquery => s.plan })
    assert(subPlans.size == 1)
    assert(subPlans.head.collect { case f: Filter => f }.nonEmpty,
      "the lone subquery's WHERE was folded into a FILTER clause — " +
        "the rule fired without a fusable bank (pushdown lost)")
  }

  test("comma-join subquery banks keep their join predicates below " +
      "the aggregate (no cartesian) and still fuse on the gates") {
    graft.Tables.registerAll(spark, d)
    val sql =
      """SELECT (SELECT count(*) FROM lineitem, orders
                 WHERE l_orderkey = o_orderkey AND l_quantity <= 25) AS a,
                (SELECT count(*) FROM lineitem, orders
                 WHERE l_orderkey = o_orderkey AND l_quantity > 25) AS b"""
    val df = withRule(on = true)(spark.sql(sql))
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"),
      s"structural conjuncts were folded up — cartesian:\n$phys")
    assert(mergedBodies(df) == 1,
      "gate-differing comma-join subqueries did not fuse")
    val on = df.collect().map(_.toSeq).toSeq
    val off = withRule(on = false)(
      spark.sql(sql).collect().map(_.toSeq).toSeq)
    assert(on == off)
  }

  test("correlated subqueries are never rewritten") {
    graft.Tables.registerAll(spark, d)
    val text =
      """SELECT o_orderkey,
                (SELECT count(*) FROM lineitem
                 WHERE l_orderkey = o_orderkey AND l_quantity > 10) AS a,
                (SELECT count(*) FROM lineitem
                 WHERE l_orderkey = o_orderkey AND l_quantity <= 10) AS b
         FROM orders ORDER BY o_orderkey LIMIT 5"""
    // correctness is the assertion that matters: the rewrite would be
    // unsound here (per-row gates), so equal results ON vs OFF prove
    // the rule declined to fire
    val on = withRule(on = true)(
      spark.sql(text).collect().map(_.toSeq).toSeq)
    val off = withRule(on = false)(
      spark.sql(text).collect().map(_.toSeq).toSeq)
    assert(on.nonEmpty && on == off)
  }
}
