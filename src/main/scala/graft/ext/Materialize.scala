package graft.ext

import org.apache.spark.sql.DataFrame

/** Single materialization point for every graft operator that needs an
  * eager, lineage-cutting pin (iterative loops whose plans would grow
  * exponentially, placement-sensitive two-phase scans, snapshots that
  * must not recompute from a directory being overwritten).
  *
  * Two modes, selected by the session conf `graft.checkpoint.reliable`:
  *
  *  - `false` (default): `localCheckpoint(eager = true)`. Blocks live on
  *    executors with NO lineage to recompute — fast, zero-config, and
  *    (unlike `DataFrame.persist`) never registered in the SQL cache
  *    manager, so the blocks are reclaimed by the ContextCleaner as soon
  *    as the DataFrame is garbage-collected instead of leaking until
  *    `unpersist()`/session end. The trade-off: on a real multi-executor
  *    cluster, losing an executor mid-job fails the job loudly (there is
  *    nothing to recompute from).
  *  - `true`: reliable `checkpoint(eager = true)` against the
  *    SparkContext checkpoint directory — survives executor loss, the
  *    right mode for 100 TB runs where a 1000-executor job WILL see node
  *    failures. Requires `spark.sparkContext.setCheckpointDir(...)` (a
  *    shared filesystem path on a real cluster); set
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` or use a
  *    job-scoped directory so checkpoint files do not accumulate.
  */
object Materialize {

  val ReliableConf = "graft.checkpoint.reliable"

  /** When `spark.graft.plans.capturePins=true` (default off — evidence
    * tooling only, zero work on query paths otherwise), every [[pin]]
    * also appends the pinned frame's FORMATTED explain to this buffer.
    * A top-level `explain` stops at the pin's ExistingRDD scan, so the
    * subplan a pin materializes — where optimizations inside operators
    * like JaccardJoin.selfJoin live — is otherwise invisible to the
    * committed plan artifacts. Drained by [[drainCapturedPlans]]
    * (PlanDump appends the sections to its output files). */
  val CapturePinsConf = "spark.graft.plans.capturePins"

  private val captured =
    new java.util.concurrent.ConcurrentLinkedQueue[String]

  /** Drain and return every subplan captured since the last drain. */
  def drainCapturedPlans(): Seq[String] = {
    val out = Seq.newBuilder[String]
    var s = captured.poll()
    while (s != null) { out += s; s = captured.poll() }
    out.result()
  }

  /** Eagerly materialize `df` and cut its lineage (see object docs for
    * the local-vs-reliable trade-off). */
  def pin(df: DataFrame): DataFrame = {
    val reliable =
      df.sparkSession.conf.get(ReliableConf, "false").toBoolean
    val pinned =
      if (reliable) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    if (df.sparkSession.conf.get(CapturePinsConf, "false").toBoolean) {
      // after the eager checkpoint the adaptive plan is final, so this
      // is the plan the pin job actually ran
      captured.add(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    pinned
  }

  /** Deterministically drop a pinned frame's blocks, for operators that
    * KNOW the frame is superseded (an old iteration round, a scaffold
    * table already folded into a later pin). No-op on frames that are
    * not bare pinned scans. The ContextCleaner would reclaim the same
    * blocks on GC eventually; iterative operators that pin every round
    * should not gamble query-over-query block-manager health on GC
    * timing — a released round must NEVER be evaluated again. */
  def release(df: DataFrame): Unit =
    org.apache.spark.sql.GraftSqlBridge.pinnedRddOf(df)
      .foreach(_.unpersist(blocking = false))
}
