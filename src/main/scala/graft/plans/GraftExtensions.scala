package graft.plans

import graft.functions.HammingDistance
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer extension (SURVEY.md §4 / guide pattern (c)):
  * `hamming(a, b) <= 0` (or `= 0`) is exactly `a = b` — the rewrite
  * lets Catalyst then use the equality for join planning (an equi-join
  * key instead of a theta join) and pushdown, which a black-box
  * distance call would block.
  */
object RewriteTrivialHamming extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(HammingDistance(a, b), Literal(0, _)) => EqualTo(a, b)
      case EqualTo(HammingDistance(a, b), Literal(0, _)) => EqualTo(a, b)
      case GreaterThanOrEqual(Literal(0, _), HammingDistance(a, b)) => EqualTo(a, b)
    }
}

/** Builder-time registration:
  * SparkSession.builder().withExtensions(new GraftExtensions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteTrivialHamming)
    e.injectOptimizerRule(_ => PreAggBeforeExpand)
    // analysis-time, not optimizer-time — see ScalarAggBankFusion's
    // scaladoc for why the bank must be fused before OptimizeSubqueries
    // pushes each gate below the source's own joins; CrossJoinAggFusion
    // is the FROM-clause spelling of the same bank
    e.injectPostHocResolutionRule(_ => ScalarAggBankFusion)
    e.injectPostHocResolutionRule(_ => CrossJoinAggFusion)
    // sibling correlated aggregates over one base merge into a single
    // struct-valued subquery BEFORE the optimizer decorrelates each
    // one separately (the restored q32-family spelling's two gates)
    e.injectPostHocResolutionRule(_ => CorrelatedAggMerge)
    // PROTOTYPE, default OFF (spark.graft.ctePin.enabled): runtime
    // materialization of multi-referenced WITH frames — see CtePin's
    // adjudication docs
    e.injectPostHocResolutionRule(session => new CtePin(session))
  }
}

object GraftExtensions {
  /** Post-hoc installation on a live session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RewriteTrivialHamming))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteTrivialHamming
}
