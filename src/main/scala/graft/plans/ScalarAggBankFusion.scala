package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Scalar-subquery-bank fusion (SURVEY §3.1: the reference ships its
  * rewrites as planner rules — flink-table-planner
  * .../plan/rules/FlinkBatchRuleSets.scala, applied by
  * PlannerBase.optimize — which maps to `SparkSessionExtensions` here).
  *
  * The TPC-DS q9 family writes N scalar subqueries that are single-row
  * aggregates over the SAME source, differing only in their WHERE gate
  * (quantity bands): `(SELECT count(*) FROM s WHERE q BETWEEN 1 AND 10)`,
  * `(SELECT avg-ish FROM s WHERE q BETWEEN 11 AND 20)`, … Left alone,
  * each subquery plans its own scan of the source — q9's raw text costs
  * one full fact pass PER BAND (Spark's stock MergeScalarSubqueries
  * only merges subqueries whose whole plans are canonically equal, so
  * same-filter triples merge but cross-band ones never do). At 100 TB
  * that is N fact scans where one suffices.
  *
  * This rule rewrites each member of such a bank from
  * `Aggregate(global, aggs, Filter(cond, base))` to
  * `Aggregate(global, aggs FILTER (WHERE cond), base)` — exactly
  * equivalent for EVERY aggregate function (`f(x) FILTER (WHERE c)`
  * aggregates precisely the rows `c` keeps, and a global aggregate
  * yields one row either way, empty input included). After the rewrite
  * all bank members share a canonically-equal plan modulo output
  * expressions, which is precisely the shape the stock
  * MergeScalarSubqueries optimizer rule fuses into ONE pass (a shared
  * CTE producing a named_struct of all the bank's aggregates).
  *
  * Why an ANALYSIS-time (post-hoc resolution) rule and not an injected
  * optimizer rule: by the time the operator-optimization batch runs,
  * OptimizeSubqueries has already pushed each gate deep below the
  * source's own joins/projections (the derived store_sales view is a
  * lineitem⋈orders join — the band gate lands inside the join's left
  * branch), and un-pushing it generically is fragile. At the end of
  * analysis the subquery still has the written shape — the gate sits
  * directly above the FROM — so the rewrite is a local, provably
  * equivalent transformation.
  *
  * The WHERE is first split by [[BankGates]]: single-attribute GATE
  * conjuncts fold up into FILTER clauses, while structural conjuncts
  * (≥2 attributes — comma-join predicates above all) stay below as a
  * Filter, so a `FROM a, b WHERE a.k = b.k AND gate` member keeps its
  * join recoverable by the optimizer instead of degenerating into an
  * unconditioned cartesian (the q90-family hazard).
  *
  * Firing conditions (all required — the rewrite trades the gates' scan
  * pushdown for fusion, so it must only fire when fusion is real):
  *   - ≥2 uncorrelated scalar subqueries under the same operator whose
  *     plans are global aggregates over canonically-equal bases WITH
  *     canonically-equal structural remainders;
  *   - ≥2 DISTINCT gate sets among them (all-equal gates already merge
  *     via stock MergeScalarSubqueries with pushdown intact);
  *   - gates and aggregate expressions deterministic, no nested
  *     subqueries inside either.
  *
  * Kill switch: set [[ScalarAggBankFusion.EnabledKey]] to "false"
  * (runtime session conf) — used by the plan spec to pin both shapes.
  */
object ScalarAggBankFusion extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.fuseScalarAggBanks.enabled"

  private def enabled: Boolean =
    SQLConf.get.getConfString(EnabledKey, "true") == "true"

  /** One bank candidate: the subquery, its aggregate list, the
    * foldable gate conjuncts (empty = ungated member, left untouched
    * but still groupable), the structural conjuncts that must stay
    * below (see [[BankGates]] — comma-join predicates), and the base
    * plan. */
  private case class Cand(sub: ScalarSubquery, aggs: Seq[NamedExpression],
      gates: Seq[Expression], structural: Seq[Expression],
      base: LogicalPlan)

  private def decompose(s: ScalarSubquery): Option[Cand] = {
    if (s.outerAttrs.nonEmpty || s.joinCond.nonEmpty) return None
    s.plan match {
      case Aggregate(Nil, aggs, child, None) =>
        val (whereConds, base0) = child match {
          case Filter(c, b) => (BankGates.conjuncts(c), b)
          case b => (Nil, b)
        }
        // JOIN…ON and comma-join spell the same member (r15
        // directive 5) — see [[BankGates.flattenJoins]]
        val (base, onConds) = BankGates.flattenJoins(base0)
        val cond = whereConds ++ onConds
        val exprs = aggs ++ cond
        val ok = exprs.forall(e => e.deterministic &&
            !e.exists(_.isInstanceOf[SubqueryExpression])) &&
          aggs.exists(_.exists(_.isInstanceOf[AggregateExpression]))
        if (ok) {
          val (gates, structural) = BankGates.splitGates(cond)
          Some(Cand(s, aggs, gates, structural, base))
        } else None
      case _ => None
    }
  }

  private def fuse(c: Cand): ScalarSubquery =
    c.sub.copy(plan = Aggregate(Nil, BankGates.gateAggs(c.aggs, c.gates),
      BankGates.withStructural(c.structural, c.base), None))

  private def fuseNode(node: LogicalPlan,
      subs: Seq[ScalarSubquery]): LogicalPlan = {
    val cands = subs.flatMap(decompose)
    val repl = new java.util.IdentityHashMap[ScalarSubquery, ScalarSubquery]
    // members group on (base, structural remainder): only subqueries
    // that keep an IDENTICAL shape below the aggregate can merge
    cands.groupBy(c => (BankGates.stripAlias(c.base).canonicalized,
        BankGates.normalizedSet(c.structural, c.base))).values.foreach {
      group =>
        val gates = group
          .map(c => BankGates.normalizedSet(c.gates, c.base)).distinct
        if (group.size >= 2 && gates.size >= 2)
          group.filter(_.gates.nonEmpty)
            .foreach(c => repl.put(c.sub, fuse(c)))
    }
    if (repl.isEmpty) node
    else node.mapExpressions(_.transform {
      case s: ScalarSubquery if repl.containsKey(s) => repl.get(s)
    })
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || !plan.resolved) plan
    else plan.transform {
      case node if node.resolved =>
        val subs = node.expressions.flatMap(_.collect {
          case s: ScalarSubquery => s
        })
        if (subs.size < 2) node else fuseNode(node, subs)
    }
}
