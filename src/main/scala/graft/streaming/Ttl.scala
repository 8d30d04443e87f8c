package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Keyed-state idle TTL (reference flink-core
  * .../api/common/state/StateTtlConfig.java:64 — Flink bounds every
  * keyed-state operator with an OnCreateAndWrite/OnReadAndWrite TTL).
  *
  * Spark's arbitrary-state analog is a processing-time timeout: each
  * time a key's batch is processed the idle clock is re-armed
  * (OnCreateAndWrite semantics); when a key goes unseen for `ttlMs` the
  * next trigger fires the timeout callback and the key's state is
  * dropped. This is what makes NoTimeout stateful operators (changelog
  * join/agg, top-N, keep-last, CEP, count windows) safe on unbounded
  * key spaces at 100 TB: state is O(live keys within the TTL horizon),
  * not O(all keys ever seen).
  *
  * All graft stateful ops take `ttlMs: Option[Long] = None`; None keeps
  * the old keep-forever behavior (Flink's TTL is also opt-in).
  */
object Ttl {

  /** Timeout conf for flatMapGroupsWithState: processing-time when a
    * TTL is requested, NoTimeout otherwise. */
  def conf(ttlMs: Option[Long]): GroupStateTimeout =
    if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
    else GroupStateTimeout.NoTimeout()

  /** Re-arm the idle clock after a key's batch is applied; call after
    * the final state.update. No-op when TTL is off or state was
    * removed (a removed key must not resurrect a timer). */
  def arm[S](state: GroupState[S], ttlMs: Option[Long]): Unit =
    if (state.exists) ttlMs.foreach(state.setTimeoutDuration)
}
