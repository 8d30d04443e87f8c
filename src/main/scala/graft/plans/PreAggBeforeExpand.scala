package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Partial aggregation BELOW a grouping-sets Expand (SURVEY §3.1 — the
  * reference ships its aggregate rewrites as planner rules,
  * flink-table-planner .../plan/rules/FlinkBatchRuleSets.scala; this is
  * the q22 family's hand-derived "pre-agg below Expand" promoted from a
  * DataFrame-only formulation into an injected optimizer rule, so raw
  * SQL text gets the same plan).
  *
  * GROUP BY ROLLUP/CUBE/GROUPING SETS analyzes into
  * `Aggregate(variants+gid, aggs, Expand(N projections, child))`: every
  * child row is replicated N times (once per grouping set) BEFORE any
  * aggregation. For decomposable aggregates that replication is wasted
  * work — aggregating once at the FINEST grain first and expanding the
  * (much smaller) partial rows computes the same answer:
  *
  *   sum(x)   = sum over sets of per-finest-group sum(x)
  *   count(*) = sum of per-group count(*)     (as `count` never null:
  *              outer groups exist only where input rows exist)
  *   count(x) = sum of per-group count(x)
  *   min/max  = min/max of per-group min/max
  *
  * At q22's shape (5-way rollup over item attributes, inventory fact)
  * the Expand input shrinks from every fact row to one row per item —
  * the difference between expanding 100 TB five ways and expanding a
  * dimension table. The extra pass costs one hash aggregate whose
  * map-side partial combine already does most of the work Expand's
  * replication would have quintupled; like Spark's own always-on
  * partial aggregation, the rewrite can add an extra (cheap) pass when
  * the finest grain barely reduces, which is why it keeps a kill
  * switch, but fact grains grouped by dimension attributes — the only
  * shape TPC-DS rollups take — reduce by orders of magnitude.
  *
  * Fires only when: the aggregate sits directly on a grouping-sets
  * Expand (≥2 projections) whose child is not already an Aggregate
  * (idempotence); every aggregate call is an undistinct, unfiltered
  * Min/Max/Count or INTEGRAL Sum (re-associating float sums shifts
  * rounding, re-summing decimal partials widens the result precision —
  * both would change the answer or its type; integer arithmetic is the
  * repo-wide money discipline anyway); and every aggregate argument
  * reads Expand passthrough columns (never a per-set variant).
  */
object PreAggBeforeExpand extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.preAggBeforeExpand.enabled"

  private def enabled: Boolean =
    SQLConf.get.getConfString(EnabledKey, "true") == "true"

  /** Idempotence: after a rewrite the Expand's child is the pre-agg,
    * possibly with pruning Projects interposed by later rules — look
    * through unary Project/Filter so the fixedPoint never re-fires on
    * an already-pre-aggregated subtree. */
  @annotation.tailrec
  private def preAggregated(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case Project(_, c) => preAggregated(c)
    case Filter(_, c) => preAggregated(c)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case agg @ Aggregate(_, _, expand: Expand, None)
          if expand.projections.size >= 2 &&
            !preAggregated(expand.child) =>
        rewrite(agg, expand).getOrElse(agg)
    }

  private def rewrite(agg: Aggregate, expand: Expand): Option[LogicalPlan] = {
    val nPos = expand.output.size
    if (expand.projections.exists(_.size != nPos)) return None
    // classify positions: uniform = same expression in every projection
    // (a passthrough of child data); variant = per-set (nulled copies,
    // the grouping id literal)
    val uniform: Array[Boolean] = Array.tabulate(nPos) { i =>
      expand.projections.forall(p => p(i).semanticEquals(
        expand.projections.head(i)))
    }
    val posOf: Map[ExprId, Int] =
      expand.output.zipWithIndex.map { case (a, i) => a.exprId -> i }.toMap

    // each aggregate call must read only uniform positions; everything
    // the outer plan reads OUTSIDE aggregate calls keeps its position
    val aggCalls = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    val decomposable = aggCalls.forall { ae =>
      val fnOk = ae.aggregateFunction match {
        // integral sums ONLY: re-associating a float/double sum changes
        // rounding (caught live — q_groupingsets drifted 3e-6 from the
        // oracle), and re-summing decimal partials widens the result
        // precision, changing the output dataType
        case s: Sum => s.dataType match {
          case LongType | IntegerType | ShortType | ByteType => true
          case _ => false
        }
        case _: Min | _: Max | _: Count => true
        case _ => false
      }
      fnOk && !ae.isDistinct && ae.filter.isEmpty && ae.deterministic
    }
    if (aggCalls.isEmpty || !decomposable) return None
    val aggArgRefs = aggCalls.flatMap(_.references.toSeq).distinct
    if (!aggArgRefs.forall(a => posOf.get(a.exprId).exists(uniform))) {
      return None
    }
    // positions the outer plan reads outside aggregate calls (grouping
    // attrs, gid, anything echoed in the select list)
    val outsideRefs = (agg.groupingExpressions.flatMap(_.references) ++
      agg.aggregateExpressions.map(_.transform {
        case ae: AggregateExpression => Literal(null)
      }).flatMap(_.references)).map(_.exprId).toSet
    val keptPos = (0 until nPos).filter(i =>
      outsideRefs.contains(expand.output(i).exprId))
    // child attributes those kept positions' projection exprs read —
    // the finest grouping grain
    val innerKeys: Seq[Attribute] = keptPos
      .flatMap(i => expand.projections.flatMap(p => p(i).references))
      .distinct
    if (innerKeys.isEmpty) return None // degenerate global grouping sets
    if (!innerKeys.forall(a => expand.child.outputSet.contains(a))) {
      return None
    }

    // inner partial per distinct aggregate call, expressed over child
    // attrs (substituting the uniform passthrough expressions)
    val uniformExpr: Map[ExprId, Expression] = expand.output.zipWithIndex
      .collect { case (a, i) if uniform(i) =>
        a.exprId -> expand.projections.head(i)
      }.toMap
    def overChild(e: Expression): Expression = e.transform {
      case a: Attribute if uniformExpr.contains(a.exprId) =>
        uniformExpr(a.exprId)
    }
    val distinctCalls = aggCalls.foldLeft(Seq.empty[AggregateExpression]) {
      (acc, ae) => if (acc.exists(_.semanticEquals(ae))) acc else acc :+ ae
    }
    val partials: Seq[(AggregateExpression, Alias)] = distinctCalls.map {
      ae =>
        val fn = ae.aggregateFunction match {
          case c: Count => Count(c.children.map(overChild))
          case f => f.mapChildren(overChild).asInstanceOf[AggregateFunction]
        }
        ae -> Alias(ae.copy(aggregateFunction = fn,
          resultId = NamedExpression.newExprId), "_pre")()
    }
    val inner = Aggregate(innerKeys, innerKeys ++ partials.map(_._2),
      expand.child, None)

    // Expand over the partials: kept positions unchanged (their exprs
    // read innerKeys, which inner passes through with the same ExprIds),
    // partial attrs appended as passthrough in every projection
    val partialAttrs = partials.map(_._2.toAttribute)
    val newOutput = keptPos.map(expand.output) ++ partialAttrs
    val newProjections = expand.projections.map(p =>
      keptPos.map(p) ++ partialAttrs)
    val newExpand = Expand(newProjections, newOutput, inner)

    // outer aggregates re-aggregate the partials
    def reagg(ae: AggregateExpression, attr: Attribute): Expression =
      ae.aggregateFunction match {
        case _: Count =>
          // count never returns null; sum-of-counts over the outer
          // group (always ≥1 inner row) doesn't either, but Sum's
          // static nullability differs — pin it with a coalesce
          Coalesce(Seq(
            ae.copy(aggregateFunction = Sum(attr),
              resultId = NamedExpression.newExprId),
            Literal(0L)))
        case _: Sum => ae.copy(aggregateFunction = Sum(attr),
          resultId = NamedExpression.newExprId)
        case _: Min => ae.copy(aggregateFunction = Min(attr),
          resultId = NamedExpression.newExprId)
        case _: Max => ae.copy(aggregateFunction = Max(attr),
          resultId = NamedExpression.newExprId)
        case f => throw new IllegalStateException(s"unreachable: $f")
      }
    // transformUp, not transform: the Count replacement wraps a fresh
    // AggregateExpression in a Coalesce, and a top-down pass would
    // descend into its own replacement and re-match it
    val newAggExprs = agg.aggregateExpressions.map(_.transformUp {
      case ae: AggregateExpression =>
        val attr = partials.collectFirst {
          case (k, a) if k.semanticEquals(ae) => a.toAttribute
        }.get
        reagg(ae, attr)
    }.asInstanceOf[NamedExpression])
    Some(Aggregate(agg.groupingExpressions, newAggExprs, newExpand, None))
  }
}
