package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming core (SURVEY.md §7.2 M2/M3): watermarked window aggs,
  * changelog conventions, streaming dedup, stream-stream interval join.
  *
  * Reference semantics being re-expressed:
  *  - WatermarkAssigner (EN/stream/StreamExecWatermarkAssigner.java:62)
  *    -> `withWatermark`
  *  - Window TVF aggs (StreamExecWindowAggregate.java:86) -> groupBy
  *    window()/session_window() under watermark, append mode
  *  - RowKind changelog (flink-core .../types/RowKind.java:25) -> an
  *    explicit `row_kind` string column ("+I","-U","+U","-D") — a library
  *    convention consumed by our stateful ops and upsert sinks; Catalyst
  *    never sees it as anything but data.
  *  - ChangelogNormalize (StreamExecChangelogNormalize.java:74) /
  *    Deduplicate keep-last (StreamExecDeduplicate.java:85) ->
  *    flatMapGroupsWithState keeping the last row per key
  *  - DropUpdateBefore (StreamExecDropUpdateBefore.java:55) -> filter
  *  - Interval join (StreamExecIntervalJoin.java:82) -> native Spark
  *    stream-stream join with a time-range condition + watermarks (state
  *    is bounded by the range exactly like Flink's TimeIntervalJoin)
  */
object StreamOps {

  val RowKind = "row_kind"
  val Insert = "+I"; val UpdateBefore = "-U"; val UpdateAfter = "+U"; val Delete = "-D"

  /** DropUpdateBefore: retraction-unaware consumers skip -U rows. */
  def dropUpdateBefore(df: DataFrame): DataFrame =
    df.filter(col(RowKind) =!= UpdateBefore)

  /** Internal marker column added by [[withIdleKeepalive]]. */
  val KeepaliveCol = "__keepalive"

  /** Watermark-idleness keepalive (reference flink-core
    * .../eventtime/WatermarksWithIdleness.java): Spark's watermark only
    * advances when events flow, so one silent source in a union (or a
    * quiet topic) stalls every event-time window in the query forever.
    * Flink solves this by marking idle sources and excluding them from
    * the watermark; Spark has no per-source idleness hook, so this
    * operator injects wall-clock KEEPALIVE rows from a rate source
    * unioned into the stream: the watermark then tracks processing time
    * whenever the real sources are quiet.
    *
    * Apply BEFORE `withWatermark` (the keepalive rows must flow through
    * the watermark node), then strip them with [[dropKeepalives]] before
    * the aggregation so they never count. The keepalive carries the
    * current processing time in `tsCol` and null everywhere else.
    *
    * Trade-off (identical to Flink's idleness marking): once the
    * watermark has advanced on keepalives, genuinely late events from
    * the quiet source are late — bound their tolerance with the normal
    * watermark delay. */
  def withIdleKeepalive(df: DataFrame, tsCol: String,
      rowsPerSecond: Int = 1): DataFrame = {
    val rate = df.sparkSession.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
    val shaped = df.schema.fields.map { f =>
      if (f.name == tsCol) col("timestamp").cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.withColumn(KeepaliveCol, lit(false))
      .unionByName(rate.select(shaped.toIndexedSeq: _*)
        .withColumn(KeepaliveCol, lit(true)))
  }

  /** Strip [[withIdleKeepalive]] rows after the watermark node, before
    * any aggregation.
    *
    * The predicate is deliberately marked non-deterministic: a plain
    * `!__keepalive` filter references neither the event-time column nor
    * anything else the optimizer must respect, so Catalyst pushes it
    * THROUGH the EventTimeWatermark node and into the union branches —
    * the keepalive branch constant-folds to an empty scan and its rows
    * never reach the watermark statistics, silently disabling the whole
    * mechanism. Non-deterministic predicates are never pushed, so the
    * filter stays above the watermark node where it belongs. */
  def dropKeepalives(df: DataFrame): DataFrame = {
    val notKeepalive = udf((k: Boolean) => !k).asNondeterministic()
    df.filter(notKeepalive(col(KeepaliveCol))).drop(KeepaliveCol)
  }

  /** Watermark alignment analog (reference flink-core
    * .../eventtime/WatermarksWithWatermarkAlignment.java, FLIP-182): no
    * row more than `maxDriftMs` ahead of the current event-time
    * watermark is released downstream. Rows from a source running ahead
    * of the group (union under the default min-watermark policy: the
    * watermark is the SLOWEST source's) park in per-source state and a
    * per-source event-time timer re-releases them as the watermark
    * catches up — so a downstream operator never sees drift beyond the
    * bound, exactly the alignment contract.
    *
    * Honest difference from Flink: alignment there pauses the SOURCE,
    * so excess data waits in the broker; a micro-batch source cannot be
    * paused per-partition from inside a query, so here the excess waits
    * in this operator's state (bounded by drift-violating rows only —
    * size it with the source's rate x expected drift). What it buys is
    * the contract downstream: bounded event-time disorder for
    * order-sensitive stateful ops, and a cap on how much early data
    * per-window/per-join-key state must absorb.
    *
    * Apply AFTER `withWatermark` (the timer needs the event-time
    * watermark). Released rows carry their original event times, which
    * are `maxDriftMs`-bounded ahead of the watermark by construction —
    * never late — so chained windows/joins accept them. */
  def alignedRelease[T](ds: Dataset[T], maxDriftMs: Long)(
      sourceOf: T => String, tsMillis: T => Long)(
      implicit tEnc: Encoder[T]): Dataset[T] = {
    implicit val bufEnc: Encoder[List[T]] =
      org.apache.spark.sql.Encoders.kryo[List[T]]
    implicit val strEnc: Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
    ds.groupByKey(sourceOf)
      .flatMapGroupsWithState[List[T], T](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[T], state: GroupState[List[T]]) =>
          val wm = state.getCurrentWatermarkMs()
          val all = state.getOption.getOrElse(Nil) ++ rows
          val (release, park) = all.partition(t => tsMillis(t) <= wm + maxDriftMs)
          if (park.isEmpty) state.remove()
          else {
            state.update(park)
            // fire when the watermark reaches the earliest parked row's
            // release point (must be strictly beyond the current wm)
            state.setTimeoutTimestamp(
              math.max(park.map(tsMillis).min - maxDriftMs, wm + 1))
          }
          release.iterator
      }
  }

  /** Tumbling-window streaming aggregation under a watermark (append
    * mode emits each window once, when the watermark passes its end). */
  def tumbleAgg(stream: DataFrame, tsCol: String, delay: String, size: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    stream.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), size) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start").cast("timestamp_ntz"))
      .withColumn("window_end", col("window.end").cast("timestamp_ntz"))
      .drop("window")

  /** Streaming keep-first dedup on arbitrary keys, state expired by
    * watermark (Spark's dropDuplicatesWithinWatermark ==
    * ProcTimeDeduplicateKeepFirstRowFunction + TTL). */
  def dedupKeepFirst(stream: DataFrame, tsCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)

  /** Streaming keep-last dedup / ChangelogNormalize: emits, per trigger,
    * the latest row per key (Update-mode changelog of an upsert stream).
    * seqNo breaks ordering ties (use event-time micros + a unique id). */
  def keepLast[K: Encoder, T: Encoder](ds: Dataset[T])(
      key: T => K, seqNo: T => Long,
      ttlMs: Option[Long] = None): Dataset[T] = {
    implicit val stateEnc: Encoder[(Long, T)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, implicitly[Encoder[T]])
    ds.groupByKey(key)
      .flatMapGroupsWithState[(Long, T), T](
        OutputMode.Update(), Ttl.conf(ttlMs)) {
        (k: K, rows: Iterator[T], state: GroupState[(Long, T)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val best = (state.getOption.iterator ++ rows.map(t => (seqNo(t), t)))
              .maxBy(_._1)
            val changed = state.getOption.forall(_._1 < best._1) ||
              state.getOption.isEmpty
            state.update(best)
            Ttl.arm(state, ttlMs)
            if (changed) Iterator.single(best._2) else Iterator.empty
          }
      }
  }

  /** Two-stream keyed co-process (SURVEY.md §2.13; reference
    * flink-streaming-java .../datastream/ConnectedStreams.java:57 +
    * co/KeyedCoProcessFunction.java): both streams are keyed to the
    * same key space; `fn` sees each element tagged by side (Left =
    * first stream) with shared per-key state — the primitive under
    * ChangelogJoin and every two-input stateful operator here.
    *
    * `ttlMs` evicts idle keys (see [[Ttl]]). Within a micro-batch the
    * two sides' rows arrive in nondeterministic relative order — carry
    * a sequence in the payloads and sort inside `fn` if cross-side
    * ordering matters (same caveat as ChangelogJoin's lSeq/rSeq). */
  def connect[K: Encoder, L: Encoder, R: Encoder, S, O](
      left: Dataset[L], right: Dataset[R],
      ttlMs: Option[Long] = None)(
      lKey: L => K, rKey: R => K)(
      fn: (K, Iterator[Either[L, R]], GroupState[S]) => Iterator[O])
      (implicit sEnc: Encoder[S], oEnc: Encoder[O]): Dataset[O] = {
    implicit val eEnc: Encoder[Either[L, R]] =
      org.apache.spark.sql.Encoders.kryo[Either[L, R]]
    left.map(l => (Left(l): Either[L, R]))
      .union(right.map(r => (Right(r): Either[L, R])))
      .groupByKey(e => e.fold(lKey, rKey))
      .flatMapGroupsWithState[S, O](OutputMode.Update(), Ttl.conf(ttlMs)) {
        (k: K, rows: Iterator[Either[L, R]], state: GroupState[S]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // materialize: GroupState must not be touched after return,
            // and the output iterator is consumed later
            val out = fn(k, rows, state).toVector
            Ttl.arm(state, ttlMs)
            out.iterator
          }
      }
  }

  /** Windowed coGroup (SURVEY.md §2.13; reference flink-streaming-java
    * .../datastream/CoGroupedStreams.java:59 + the windowed
    * CoGroupWindowFunction): both keyed streams buffer into the same
    * tumbling event-time window; when the watermark passes the window
    * end, `fn` sees the COMPLETE buffers of both sides at once. Window
    * join is the special case that pairs them; coGroup exposes the raw
    * groups (outer-join-like logic, per-window set reconciliation).
    *
    * Keyed by (key, window_start) under EventTimeTimeout, so state per
    * live window is exactly its buffered rows, dropped at emission.
    * The watermark (event time - `delayMs`) is applied INSIDE on the
    * unioned stream: a typed map to the tagged union would erase any
    * upstream watermark column, so callers pass the delay instead of
    * pre-watermarking. Rows later than an already-fired window are
    * re-buffered and fire on the next watermark advance (they form a
    * second, late emission — downstream dedup by window if needed). */
  def windowCoGroup[K: Encoder, L: Encoder, R: Encoder, O: Encoder](
      left: Dataset[L], right: Dataset[R], windowMs: Long,
      delayMs: Long = 0L)(
      lKey: L => K, rKey: R => K, lTs: L => Long, rTs: R => Long)(
      fn: (K, Long, Seq[L], Seq[R]) => IterableOnce[O]): Dataset[O] = {
    require(windowMs > 0 && delayMs >= 0)
    val kryoE = org.apache.spark.sql.Encoders.kryo[Either[L, R]]
    implicit val teEnc: Encoder[(java.sql.Timestamp, Either[L, R])] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.TIMESTAMP, kryoE)
    implicit val kEnc: Encoder[(K, Long)] =
      org.apache.spark.sql.Encoders.kryo[(K, Long)]
    implicit val sEnc: Encoder[(List[L], List[R])] =
      org.apache.spark.sql.Encoders.kryo[(List[L], List[R])]
    left.map(l => (new java.sql.Timestamp(lTs(l)), Left(l): Either[L, R]))
      .union(right.map(r =>
        (new java.sql.Timestamp(rTs(r)), Right(r): Either[L, R])))
      .toDF("ets", "tagged")
      .withWatermark("ets", s"$delayMs milliseconds")
      .as[(java.sql.Timestamp, Either[L, R])]
      .groupByKey(p =>
        (p._2.fold(lKey, rKey), p._1.getTime / windowMs * windowMs))
      .flatMapGroupsWithState[(List[L], List[R]), O](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (kw: (K, Long), rows: Iterator[(java.sql.Timestamp, Either[L, R])],
            state: GroupState[(List[L], List[R])]) =>
          val (k, winStart) = kw
          if (state.hasTimedOut) {
            val (ls, rs) = state.get
            state.remove()
            fn(k, winStart, ls.reverse, rs.reverse).iterator.toVector.iterator
          } else {
            var (ls, rs) = state.getOption.getOrElse((Nil: List[L], Nil: List[R]))
            rows.foreach {
              case (_, Left(l)) => ls ::= l
              case (_, Right(r)) => rs ::= r
            }
            state.update((ls, rs))
            // fire when the watermark REACHES the window end: Spark
            // event-time timeouts fire when wm > t, so arm at end-1 (a
            // timer at `end` would withhold a window whose end equals
            // the final watermark forever). A late window (watermark
            // already beyond it) fires on the next watermark move.
            state.setTimeoutTimestamp(
              math.max(winStart + windowMs - 1,
                state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Streaming global limit (SURVEY.md §2.8; reference
    * StreamExecLimit.java): pass through the first `n` rows of the
    * whole stream, in arrival order, across triggers. All rows route
    * to ONE key — the same single-parallelism constraint Flink's
    * StreamExecLimit has (a global limit is inherently serial); state
    * is a single counter. */
  def limit[T: Encoder](ds: Dataset[T], n: Int): Dataset[T] = {
    implicit val kEnc: Encoder[Boolean] =
      org.apache.spark.sql.Encoders.scalaBoolean
    CountWindows.firstN(ds, n)((_: T) => true)
  }

  /** Streaming PROCTIME sort (SURVEY §2.8; reference
    * StreamExecTemporalSort.java proctime branch / ProcTimeSortOperator):
    * Flink buffers rows per processing-time tick and emits each tick's
    * buffer sorted on the secondary keys. A Spark micro-batch IS the
    * proctime tick, so the operator is: per batch, deliver rows in
    * (batch, sort-key) order. `deliver` receives each batch already
    * sorted — e.g. append it to a sink that preserves insertion order.
    * (Event-time sort is the separate [[EventTimeSort]] operator.) */
  def procTimeSorted(stream: DataFrame, order: Seq[Column])(
      deliver: DataFrame => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      deliver(batch.orderBy(order: _*)); ()
    }

  /** Stream-stream interval join: right rows within [leftTs - before,
    * leftTs + after] on equal keys. Both sides MUST carry watermarks so
    * Spark can GC join state (same bound Flink derives in
    * TimeIntervalJoin). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      before: String, after: String): DataFrame =
    // qualify the ts columns through their side: unqualified col(...)
    // is AMBIGUOUS_REFERENCE when both sides name their event time the
    // same way (the common two-instances-of-one-schema case)
    left.join(right,
      left(key) === right(key) &&
        right(rightTs) >= left(leftTs) - expr(s"INTERVAL $before") &&
        right(rightTs) <= left(leftTs) + expr(s"INTERVAL $after"))
}
