package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** The FROM-clause spelling of the scalar-agg bank
  * ([[ScalarAggBankFusion]] handles the subquery spelling; same
  * reference mapping, SURVEY §3.1 / FlinkBatchRuleSets.scala):
  *
  *   SELECT a.x / b.y FROM (SELECT sum(v) x FROM t WHERE p) a,
  *                         (SELECT sum(v) y FROM t WHERE q) b
  *
  * plans as a cross join of two single-row aggregates — one scan of
  * `t` PER BRANCH. Every global aggregate yields exactly one row
  * (empty input included), so a condition-free inner/cross join of N
  * such branches over canonically-equal bases is exactly one row too,
  * and is computed in ONE pass by a single Aggregate whose outputs
  * carry each branch's gate as a FILTER clause — the same equivalence
  * [[ScalarAggBankFusion]] uses, minus the subquery indirection. The
  * fused node reuses each branch's output Aliases (ExprIds preserved),
  * so nothing above the join changes.
  *
  * Runs at post-hoc resolution for the same reason as the subquery
  * rule: at analysis end each branch still has its written
  * `Aggregate(global, aggs, Filter(gate, base))` shape, before the
  * optimizer pushes gates below the base's own joins. N-ary: a
  * left-deep or bushy tree of such joins collapses in one application
  * (the collector descends through nested condition-free inner/cross
  * joins).
  *
  * Each branch's WHERE is split by [[BankGates]]: single-attribute
  * gates fold into FILTER clauses; structural conjuncts (comma-join
  * predicates) stay below the fused aggregate as a Filter, so the
  * optimizer still reconstitutes the branch's real joins — this is
  * what makes the TPC-DS q90 shape (two comma-join branches differing
  * only in an hour band) fuse into ONE joined pass instead of either
  * two passes or a cartesian.
  *
  * Fires only when ≥2 branches share a canonical (base, structural
  * remainder) with ≥2 distinct gate sets among them, all gates and
  * aggregates deterministic and subquery-free — identical conservatism
  * to the subquery rule, and the same kill-switch granularity.
  */
object CrossJoinAggFusion extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.fuseCrossJoinAggs.enabled"

  private def enabled: Boolean =
    SQLConf.get.getConfString(EnabledKey, "true") == "true"

  /** One fusable branch: its aggregate list, foldable gate conjuncts,
    * structural conjuncts that must stay below (see [[BankGates]]),
    * and base; the SubqueryAlias/View wrappers are stripped on the way
    * down (the fused plan keeps the attrs, so wrappers can be
    * dropped). */
  private case class Branch(aggs: Seq[NamedExpression],
      gates: Seq[Expression], structural: Seq[Expression],
      base: LogicalPlan)

  private def asBranch(p: LogicalPlan): Option[Branch] =
    BankGates.stripAlias(p) match {
      case Aggregate(Nil, aggs, child, None) =>
        val (whereConds, base0) = child match {
          case Filter(c, b) => (BankGates.conjuncts(c), b)
          case b => (Nil, b)
        }
        // JOIN…ON and comma-join spell the same member: flatten the
        // base's inner joins so the ON conjuncts pool with the WHERE
        // conjuncts and both spellings yield one canonical
        // (skeleton, gates, structural) form (r15 directive 5)
        val (base, onConds) = BankGates.flattenJoins(base0)
        val cond = whereConds ++ onConds
        // base.deterministic matters here specifically: unlike the
        // subquery rule (which leaves each member's base in place for
        // stock MergeScalarSubqueries to merge under ITS determinism
        // check), this rule physically collapses N base instances into
        // one — fusing N independent evaluations of a nondeterministic
        // source (rand/sample in a shared view) would change results.
        val ok = (aggs ++ cond).forall(e => e.deterministic &&
            !e.exists(_.isInstanceOf[SubqueryExpression])) &&
          aggs.exists(_.exists(_.isInstanceOf[AggregateExpression])) &&
          base.deterministic
        if (ok) {
          val (gates, structural) = BankGates.splitGates(cond)
          Some(Branch(aggs, gates, structural, base))
        } else None
      case _ => None
    }

  /** Collects the leaves of a maximal condition-free inner/cross join
    * tree. Returns None unless EVERY leaf is a fusable branch (a
    * partial collapse would change the join's row-multiplication
    * semantics only if a side could be empty — and a non-branch side
    * can be). */
  /** The top-level join between members carries no real condition —
    * None, or the `ON true` a JOIN-spelled bank writes (any other ON
    * filters the joined row and blocks fusion). */
  private def freeCond(c: Option[Expression]): Boolean =
    c.forall(_ == Literal.TrueLiteral)

  private def collect(p: LogicalPlan): Option[Seq[Branch]] = p match {
    case Join(l, r, Inner | Cross, cond, _) if freeCond(cond) =>
      for (ls <- collect(l); rs <- collect(r)) yield ls ++ rs
    case other => asBranch(other).map(Seq(_))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || !plan.resolved) plan
    else plan.transform {
      case j @ Join(_, _, Inner | Cross, cond, _) if freeCond(cond) =>
        collect(j) match {
          case Some(branches) if branches.size >= 2 &&
              branches.map(b => (BankGates.stripAlias(b.base).canonicalized,
                BankGates.normalizedSet(b.structural, b.base)))
                .distinct.size == 1 &&
              branches.map(b => BankGates.normalizedSet(b.gates, b.base))
                .distinct.size >= 2 =>
            // one pass over the first branch's base (plus its
            // structural filter — identical across branches by the
            // group key) computes every branch's aggregates; output
            // attr order matches the join's (left-to-right), ExprIds
            // preserved
            val base = branches.head.base
            val rebased = branches.map { b =>
              if (b.base eq base) b
              else {
                // rebind this branch's attrs onto the shared base
                // positionally (canonical equality guarantees the
                // outputs correspond)
                val sub = b.base.output.zip(base.output).map {
                  case (from, to) => from.exprId -> to
                }.toMap
                def re(e: Expression): Expression = e.transform {
                  case a: Attribute if sub.contains(a.exprId) =>
                    sub(a.exprId)
                }
                Branch(
                  b.aggs.map(re(_).asInstanceOf[NamedExpression]),
                  b.gates.map(re), b.structural.map(re), base)
              }
            }
            Aggregate(Nil,
              rebased.flatMap(b => BankGates.gateAggs(b.aggs, b.gates)),
              BankGates.withStructural(rebased.head.structural, base),
              None)
          case _ => j
        }
    }
}
