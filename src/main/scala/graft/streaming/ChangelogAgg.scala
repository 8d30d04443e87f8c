package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Retraction-aware streaming aggregation (SURVEY.md §2.4; reference
  * OP/aggregate/GroupAggFunction.java:43): consumes a changelog stream
  * (row_kind +I/+U/-U/-D per StreamOps) and maintains per-key
  * sum/count, emitting its own changelog: +U rows while the group is
  * live, a -D row when retractions empty the group (Flink's
  * RecordCounter behavior).
  *
  * This is the piece Spark's native streaming aggregation cannot do
  * (it only consumes append-only input); keeping it a library operator
  * means Catalyst never needs to know about retractions — exactly the
  * "changelog as library convention" stance from SURVEY §7.4.
  */
object ChangelogAgg {

  /** One output changelog row for a group. */
  case class GroupUpdate[K](row_kind: String, key: K, sum: Double, count: Long)

  case class Acc(sum: Double, count: Long)

  /** @param kind   row_kind accessor (+I/+U add, -U/-D retract)
    * @param value  the aggregated value accessor
    * @param ttlMs  idle TTL: a group unseen this long is evicted */
  def sumCount[K: Encoder, T: Encoder](ds: Dataset[T])(
      key: T => K, kind: T => String, value: T => Double,
      ttlMs: Option[Long] = None): Dataset[GroupUpdate[K]] = {
    implicit val stateEnc: Encoder[Acc] = Encoders.kryo[Acc]
    implicit val outEnc: Encoder[GroupUpdate[K]] = Encoders.kryo[GroupUpdate[K]]
    ds.groupByKey(key)
      .flatMapGroupsWithState[Acc, GroupUpdate[K]](
        OutputMode.Update(), Ttl.conf(ttlMs)) {
        (k: K, rows: Iterator[T], state: GroupState[Acc]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val before = state.getOption.getOrElse(Acc(0.0, 0L))
            var acc = before
            rows.foreach { t =>
              val v = value(t)
              kind(t) match {
                case StreamOps.Insert | StreamOps.UpdateAfter =>
                  acc = Acc(acc.sum + v, acc.count + 1)
                case StreamOps.UpdateBefore | StreamOps.Delete =>
                  acc = Acc(acc.sum - v, acc.count - 1)
                case other =>
                  throw new IllegalArgumentException(s"bad row_kind: $other")
              }
            }
            if (acc.count <= 0L) {
              state.remove()
              if (before.count > 0L)
                Iterator.single(GroupUpdate(StreamOps.Delete, k, 0.0, 0L))
              else Iterator.empty
            } else {
              state.update(acc)
              Ttl.arm(state, ttlMs)
              if (acc != before)
                Iterator.single(GroupUpdate(StreamOps.UpdateAfter, k, acc.sum, acc.count))
              else Iterator.empty
            }
          }
      }
  }
}
