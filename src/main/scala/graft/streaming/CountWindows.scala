package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Tumbling count windows (SURVEY.md §2.5; reference
  * CountTumblingWindowAssigner + ElementTriggers.CountElement): every
  * `size` rows of a key form one window, emitted when full. State per
  * key is the current partial window (< size rows) — bounded.
  */
object CountWindows {

  /** Streaming keep-first-N per key (reference
    * OP/rank/AppendOnlyFirstNFunction.java): passes through the first
    * `n` rows of each key in arrival order, drops the rest. State per
    * key is one counter. */
  def firstN[K: Encoder, T: Encoder](ds: Dataset[T], n: Int)(
      key: T => K, ttlMs: Option[Long] = None): Dataset[T] = {
    implicit val cEnc: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(key)
      .flatMapGroupsWithState[Long, T](
        OutputMode.Append(), Ttl.conf(ttlMs)) {
        (k: K, rows: Iterator[T], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var seen = state.getOption.getOrElse(0L)
            val out = scala.collection.mutable.ListBuffer[T]()
            rows.foreach { t => if (seen < n) { out += t; seen += 1 } }
            state.update(seen)
            Ttl.arm(state, ttlMs)
            out.iterator
          }
      }
  }

  case class CountWindow[K, T](key: K, window_no: Long, rows: Seq[T])

  /** Delta-triggered windows (reference flink-streaming-java
    * .../api/windowing/triggers/DeltaTrigger.java wrapped in
    * PurgingTrigger.java over GlobalWindows — the bounded-state
    * combination): rows buffer per key until `delta(lastFirePoint,
    * current) > threshold`, then the buffered window (including the
    * firing row) emits AND purges, and the firing row becomes the next
    * reference point. The first row of a key is the initial reference
    * (no fire). State per key = reference point + current buffer —
    * bounded by fire rate, `ttlMs` evicts idle keys. `maxBuffer` is
    * the CountEvictor (.../api/windowing/evictors/CountEvictor.java)
    * composed in: only the most recent `maxBuffer` rows are retained
    * (older ones evicted front-of-window, exactly Flink's
    * evictBefore), giving a HARD state bound per key even for keys
    * whose measure never jumps. */
  def deltaTriggered[K: Encoder, T: Encoder](ds: Dataset[T],
      threshold: Double, maxBuffer: Option[Int] = None)(
      key: T => K, measure: T => Double, ttlMs: Option[Long] = None,
      delta: (Double, Double) => Double = (a, b) => math.abs(b - a))
      : Dataset[CountWindow[K, T]] = {
    require(maxBuffer.forall(_ >= 1))
    implicit val stateEnc: Encoder[(Long, Double, List[T])] =
      Encoders.kryo[(Long, Double, List[T])]
    implicit val outEnc: Encoder[CountWindow[K, T]] =
      Encoders.kryo[CountWindow[K, T]]
    ds.groupByKey(key)
      .flatMapGroupsWithState[(Long, Double, List[T]), CountWindow[K, T]](
        OutputMode.Append(), Ttl.conf(ttlMs)) {
        (k: K, rows: Iterator[T], state: GroupState[(Long, Double, List[T])]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = scala.collection.mutable.ArrayBuffer[CountWindow[K, T]]()
            var st = state.getOption
            rows.foreach { t =>
              st match {
                case None => st = Some((0L, measure(t), List(t)))
                case Some((winNo, ref, buf)) =>
                  if (delta(ref, measure(t)) > threshold) {
                    val win = buf :+ t
                    out += CountWindow(k, winNo,
                      maxBuffer.fold(win)(m => win.takeRight(m)))
                    st = Some((winNo + 1, measure(t), Nil))
                  } else {
                    val grown = buf :+ t
                    // CountEvictor.evictBefore: drop from the FRONT
                    st = Some((winNo, ref,
                      maxBuffer.fold(grown)(m => grown.takeRight(m))))
                  }
              }
            }
            st.foreach(state.update)
            Ttl.arm(state, ttlMs)
            out.iterator
          }
      }
  }

  def tumbling[K: Encoder, T: Encoder](ds: Dataset[T], size: Int)(
      key: T => K, ttlMs: Option[Long] = None): Dataset[CountWindow[K, T]] = {
    require(size >= 1)
    implicit val stateEnc: Encoder[(Long, List[T])] =
      Encoders.kryo[(Long, List[T])]
    implicit val outEnc: Encoder[CountWindow[K, T]] =
      Encoders.kryo[CountWindow[K, T]]
    ds.groupByKey(key)
      .flatMapGroupsWithState[(Long, List[T]), CountWindow[K, T]](
        OutputMode.Append(), Ttl.conf(ttlMs)) {
        (k: K, rows: Iterator[T], state: GroupState[(Long, List[T])]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var (windowNo, buf) = state.getOption.getOrElse((0L, List.empty[T]))
            val out = scala.collection.mutable.ArrayBuffer[CountWindow[K, T]]()
            rows.foreach { t =>
              buf = buf :+ t
              if (buf.size == size) {
                out += CountWindow(k, windowNo, buf)
                windowNo += 1
                buf = Nil
              }
            }
            state.update((windowNo, buf))
            Ttl.arm(state, ttlMs)
            out.iterator
          }
      }
  }
}
