package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key Top-N (SURVEY.md §2.7; reference
  * StreamExecRank.java:83 with AppendOnlyTopNFunction.java:52).
  *
  * Keeps, per key, the current top-N rows by a score in GroupState and
  * emits a changelog whenever membership or ordering changes: "-D" for
  * rows leaving the board, "+I"/"+U" for rows entering or moving.
  * Downstream upsert sinks key on (key, rank_no).
  *
  * State per key is exactly N rows (AppendOnlyTopNFunction's in-state
  * sorted map) — constant memory per key regardless of input volume,
  * which is what makes per-key leaderboards viable on unbounded streams.
  */
object StreamingTopN {

  /** One changelog row of the per-key leaderboard. */
  case class Change[K, T](row_kind: String, key: K, rank_no: Int, payload: T)

  /** @param score   bigger wins
    * @param tieSeq  deterministic tie-break (smaller wins), e.g. event id
    * @param ttlMs   idle TTL: a key's leaderboard unseen this long is
    *                evicted (see [[Ttl]])
    */
  def apply[K: Encoder, T: Encoder](ds: Dataset[T], n: Int)(
      key: T => K, score: T => Double, tieSeq: T => Long,
      ttlMs: Option[Long] = None): Dataset[Change[K, T]] = {
    implicit val stateEnc: Encoder[List[T]] = Encoders.kryo[List[T]]
    implicit val outEnc: Encoder[Change[K, T]] = Encoders.kryo[Change[K, T]]
    val ord = Ordering.by[T, (Double, Long)](t => (-score(t), tieSeq(t)))

    ds.groupByKey(key)
      .flatMapGroupsWithState[List[T], Change[K, T]](
        OutputMode.Update(), Ttl.conf(ttlMs)) {
        (k: K, rows: Iterator[T], state: GroupState[List[T]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val before = state.getOption.getOrElse(Nil)
            val after = (before ++ rows).sorted(ord).take(n)
            state.update(after)
            Ttl.arm(state, ttlMs)
            val changes = scala.collection.mutable.ArrayBuffer[Change[K, T]]()
            val bi = before.iterator.zipWithIndex.toMap
            after.zipWithIndex.foreach { case (t, i) =>
              bi.get(t) match {
                case Some(j) if j == i => // unchanged at same rank
                case Some(_) => changes += Change(StreamOps.UpdateAfter, k, i + 1, t)
                case None => changes += Change(StreamOps.Insert, k, i + 1, t)
              }
            }
            before.zipWithIndex.foreach { case (t, _) =>
              if (!after.contains(t))
                changes += Change(StreamOps.Delete, k, 0, t)
            }
            changes.iterator
          }
      }
  }
}
