package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** PROTOTYPE (judge r15 stretch directive 7, default OFF): runtime
  * materialization of multi-referenced WITH frames from raw SQL text —
  * the capability behind the 7 remaining SQL-text battery exclusions
  * (q14a/b, q23a/b, q64, q72, q75), whose DataFrame twins pin their
  * shared frames via [[graft.ext.Materialize.pin]] while Spark's
  * `InlineCTE` re-plans every reference (per-reference pushdown makes
  * the copies canonically different, so not even physical exchange
  * reuse recovers them).
  *
  * Mechanism: a POST-HOC RESOLUTION rule (the only injectable hook
  * that sees `WithCTE` before the optimizer's early InlineCTE batch
  * inlines it). For each self-contained (no nested CTE refs),
  * deterministic def referenced ≥ 2 times, the def body is EXECUTED
  * immediately via `Materialize.pin` (localCheckpoint — one job, one
  * scan) and every `CTERelationRef` is replaced by a Project binding
  * the ref's own ExprIds onto the pinned `LogicalRDD` — exactly the
  * twins' pin-then-reuse pattern, derived from the text.
  *
  * Why this stays a prototype rather than a product default:
  *  - it trades PER-REFERENCE PUSHDOWN for single evaluation — a
  *    cost-based call Spark's analyzer cannot make (no stats at this
  *    hook; a def whose references each prune 99% of it would read
  *    ~2x MORE when pinned). The twins make that call by hand per
  *    query; a rule firing on every ≥2-ref CTE cannot.
  *  - analysis-time execution: `.explain` / plan-only tooling triggers
  *    the materialization job (and the pinned LogicalRDD embeds a
  *    per-run RDD id, so plans stop being rebuild-stable — the census
  *    would flag every WITH query as UNSTABLE if this were on).
  *  - `localCheckpoint` blocks are executor-resident: on a real
  *    cluster the reliable-checkpoint mode (`graft.checkpoint
  *    .reliable`) is required for fault tolerance.
  *
  * `graft.examples.CtePinProbe` measures it on the excluded q72 text;
  * COVERAGE.md carries the adjudication.
  */
class CtePin(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!CtePin.enabled(session) || !plan.resolved) plan
    else plan.transform {
      case w @ WithCTE(child, defs) =>
        val refCounts = w.collectWithSubqueries {
          case r: CTERelationRef => r.cteId
        }.groupBy(identity).view.mapValues(_.size).toMap
        // defs are in dependency order (a body only references EARLIER
        // defs), so one forward pass pins each ≥2-ref deterministic
        // def with every earlier pin already substituted into its
        // body; a body still referencing KEPT (unpinned) defs is
        // executed under its own WithCTE of those defs.
        var pinned = Map.empty[Long, LogicalPlan]
        val kept = scala.collection.mutable.ArrayBuffer[CTERelationDef]()
        def substitute(p: LogicalPlan): LogicalPlan =
          p.transformUpWithSubqueries {
            case r: CTERelationRef if pinned.contains(r.cteId) =>
              val src = pinned(r.cteId)
              Project(r.output.zip(src.output).map { case (ro, po) =>
                Alias(po, ro.name)(exprId = ro.exprId,
                  qualifier = ro.qualifier)
              }, src)
          }
        defs.foreach { d =>
          val body = substitute(d.child)
          if (refCounts.getOrElse(d.id, 0) >= 2 && body.deterministic) {
            val stillRefs = body.collectWithSubqueries {
              case r: CTERelationRef => r
            }.nonEmpty
            val exec = if (stillRefs) WithCTE(body, kept.toSeq) else body
            val df = org.apache.spark.sql.GraftSqlBridge
              .ofRows(session, exec)
            pinned += d.id ->
              graft.ext.Materialize.pin(df).queryExecution.analyzed
          } else kept += d.copy(child = body)
        }
        if (pinned.isEmpty) w
        else {
          val newChild = substitute(child)
          if (kept.isEmpty) newChild else WithCTE(newChild, kept.toSeq)
        }
    }
}

object CtePin {
  /** Default OFF — see the prototype adjudication in the class docs. */
  val EnabledKey = "spark.graft.ctePin.enabled"

  private def enabled(session: SparkSession): Boolean =
    session.conf.get(EnabledKey, "false") == "true"
}
