package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming bounded-preceding OVER aggregation (SURVEY.md §2.6;
  * reference OP/over/RowTimeRowsBoundedPrecedingFunction.java and
  * RowTimeRangeBoundedPrecedingFunction.java:61): for each arriving
  * row, emit the aggregate over the trailing window of its key —
  * either the last `n` rows (ROWS frame) or the rows within a trailing
  * time range (RANGE frame).
  *
  * ROWS: rows are aggregated in arrival order — compose with
  * EventTimeSort upstream for strict rowtime order (Flink
  * buffers+sorts identically inside its over operator). State per key
  * is a ring of the last n-1 values (Flink keeps the same bounded
  * retract list), so state is O(n) per key on unbounded input.
  *
  * RANGE: watermark-driven — a row is released only once the watermark
  * passes its timestamp (so every window member has arrived), peers
  * with equal rowtime share one frame (SQL RANGE semantics), and
  * history older than (watermark - range) is evicted. State per key is
  * the un-released buffer + the in-range value history — exactly the
  * two MapStates Flink's RowTimeRangeBoundedPrecedingFunction keeps,
  * with the same eviction bound.
  */
object StreamingOverAgg {

  case class WithAgg[T](payload: T, running_sum: Double, running_count: Int)

  def rowsBoundedPreceding[K: Encoder, T: Encoder](ds: Dataset[T], n: Int)(
      key: T => K, value: T => Double,
      ttlMs: Option[Long] = None): Dataset[WithAgg[T]] = {
    require(n >= 1)
    implicit val stateEnc: Encoder[List[Double]] = Encoders.kryo[List[Double]]
    implicit val outEnc: Encoder[WithAgg[T]] = Encoders.kryo[WithAgg[T]]
    ds.groupByKey(key)
      .flatMapGroupsWithState[List[Double], WithAgg[T]](
        OutputMode.Append(), Ttl.conf(ttlMs)) {
        (k: K, rows: Iterator[T], state: GroupState[List[Double]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var window = state.getOption.getOrElse(Nil) // newest first
            val out = rows.map { t =>
              window = (value(t) :: window).take(n)
              state.update(window)
              WithAgg(t, window.sum, window.size)
            }.toList
            Ttl.arm(state, ttlMs)
            out.iterator
          }
      }
  }

  /** Internal state for the RANGE frame: un-released rows and the
    * (ts, value) history still inside some future frame. Public for
    * kryo. */
  case class RangeState[T](pending: List[(Long, Long, T)],
      hist: List[(Long, Double)])

  /** RANGE INTERVAL .. PRECEDING frame over event time:
    * [rowTs - rangeMs, rowTs]. See [[rowTimeRangeFrame]]. */
  def rowTimeRangeBoundedPreceding[K: Encoder, T: Encoder](
      ds: Dataset[T], rangeMs: Long)(
      key: T => K, tsMillis: T => Long, seq: T => Long,
      value: T => Double): Dataset[WithAgg[T]] =
    rowTimeRangeFrame(ds, rangeMs, 0L)(key, tsMillis, seq, value)

  /** General event-time RANGE frame
    * [rowTs - beforeMs, rowTs + afterMs] — PRECEDING and FOLLOWING
    * bounds. Input must carry a watermark (`withWatermark`) — a row is
    * released only once the watermark passes rowTs + afterMs, which is
    * what guarantees every frame member (including future ones) has
    * arrived. Rows with equal rowtime are peers: they share one frame
    * (SQL RANGE semantics).
    *
    * State per key: the un-released rows + the (ts, value) history
    * inside the eviction horizon (watermark - after - before) — the
    * same bound Flink's RowTimeRangeBoundedPrecedingFunction keeps,
    * extended by the lookahead.
    *
    * @param seq deterministic tie-break for output order of peers
    */
  def rowTimeRangeFrame[K: Encoder, T: Encoder](
      ds: Dataset[T], beforeMs: Long, afterMs: Long)(
      key: T => K, tsMillis: T => Long, seq: T => Long,
      value: T => Double): Dataset[WithAgg[T]] = {
    require(beforeMs >= 0 && afterMs >= 0)
    implicit val stEnc: Encoder[RangeState[T]] = Encoders.kryo[RangeState[T]]
    implicit val outEnc: Encoder[WithAgg[T]] = Encoders.kryo[WithAgg[T]]
    ds.groupByKey(key)
      .flatMapGroupsWithState[RangeState[T], WithAgg[T]](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: K, rows: Iterator[T], state: GroupState[RangeState[T]]) =>
          val wm = state.getCurrentWatermarkMs()
          val st = state.getOption.getOrElse(RangeState[T](Nil, Nil))
          val newRows = rows.map(t => (tsMillis(t), seq(t), t)).toList
          // every arrival enters history immediately: it may sit in the
          // FOLLOWING part of an earlier row's frame
          var hist = st.hist ++ newRows.map(p => (p._1, value(p._3)))
          val pending = st.pending ++ newRows
          val (ripe, young) = pending.partition(_._1 + afterMs <= wm)
          val out = scala.collection.mutable.ArrayBuffer[WithAgg[T]]()
          val sorted = ripe.sortBy(p => (p._1, p._2))
          var i = 0
          while (i < sorted.length) {
            val t0 = sorted(i)._1
            var j = i
            while (j < sorted.length && sorted(j)._1 == t0) j += 1
            val peers = sorted.slice(i, j) // equal-rowtime peer group
            val frame = hist.filter(h => h._1 >= t0 - beforeMs &&
              h._1 <= t0 + afterMs)
            val s = frame.map(_._2).sum
            peers.foreach(p => out += WithAgg(p._3, s, frame.size))
            i = j
          }
          // anything below (wm - after - before) can't be in any frame
          // of a still-unreleased row (their ts > wm - after)
          hist = hist.filter(_._1 >= wm - afterMs - beforeMs)
          if (young.isEmpty && hist.isEmpty) state.remove()
          else {
            state.update(RangeState(young, hist))
            if (young.nonEmpty) // wake when a pending row can release
              state.setTimeoutTimestamp(young.map(_._1).min + afterMs)
            else // wake when the last history entry leaves the horizon
              state.setTimeoutTimestamp(
                hist.map(_._1).max + beforeMs + afterMs + 1)
          }
          out.iterator
      }
  }
}
