package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming bounded-preceding OVER aggregation (SURVEY.md §2.6;
  * reference OP/over/RowTimeRowsBoundedPrecedingFunction.java): for each
  * arriving row, emit the aggregate over the last `n` rows of its key
  * (ROWS n-1 PRECEDING .. CURRENT ROW).
  *
  * Rows are aggregated in arrival order — compose with EventTimeSort
  * upstream for strict rowtime order (Flink buffers+sorts identically
  * inside its over operator). State per key is a ring of the last n-1
  * values (Flink keeps the same bounded retract list), so state is
  * O(n) per key on unbounded input.
  */
object StreamingOverAgg {

  case class WithAgg[T](payload: T, running_sum: Double, running_count: Int)

  def rowsBoundedPreceding[K: Encoder, T: Encoder](ds: Dataset[T], n: Int)(
      key: T => K, value: T => Double): Dataset[WithAgg[T]] = {
    require(n >= 1)
    implicit val stateEnc: Encoder[List[Double]] = Encoders.kryo[List[Double]]
    implicit val outEnc: Encoder[WithAgg[T]] = Encoders.kryo[WithAgg[T]]
    ds.groupByKey(key)
      .flatMapGroupsWithState[List[Double], WithAgg[T]](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: K, rows: Iterator[T], state: GroupState[List[Double]]) =>
          var window = state.getOption.getOrElse(Nil) // newest first
          val out = rows.map { t =>
            window = (value(t) :: window).take(n)
            state.update(window)
            WithAgg(t, window.sum, window.size)
          }.toList
          out.iterator
      }
  }
}
