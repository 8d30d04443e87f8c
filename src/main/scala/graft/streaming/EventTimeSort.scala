package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Temporal sort (SURVEY.md §2.8; reference StreamExecTemporalSort.java:64
  * / RowTimeSortOperator.java): emit rows in event-time order per key,
  * releasing a row only once the watermark has passed its timestamp.
  *
  * flatMapGroupsWithState with EventTimeTimeout: rows buffer in state;
  * on each timeout (watermark advance) every buffered row older than the
  * current watermark is emitted in (ts, seq) order and dropped from
  * state. State is bounded by the watermark delay × per-key rate — the
  * same bound Flink's RowTimeSortOperator gets from its event-time
  * timers.
  */
object EventTimeSort {

  def apply[K: Encoder, T: Encoder](ds: Dataset[T])(
      key: T => K, tsMillis: T => Long, seq: T => Long): Dataset[T] = {
    implicit val stateEnc: Encoder[List[T]] = Encoders.kryo[List[T]]
    ds.groupByKey(key)
      .flatMapGroupsWithState[List[T], T](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: K, rows: Iterator[T], state: GroupState[List[T]]) =>
          val wm = state.getCurrentWatermarkMs()
          val buffered = state.getOption.getOrElse(Nil) ++ rows
          val (ripe, young) = buffered.partition(t => tsMillis(t) <= wm)
          if (young.nonEmpty) {
            state.update(young)
            // wake up when the watermark can have moved past someone
            state.setTimeoutTimestamp(young.map(tsMillis).min)
          } else state.remove()
          ripe.sortBy(t => (tsMillis(t), seq(t))).iterator
      }
  }
}
