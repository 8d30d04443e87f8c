package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-time temporal (as-of) join (SURVEY.md §2.3 hard part;
  * reference OP/join/temporal/TemporalRowTimeJoinOperator.java:78):
  * probe rows join the version row that was current AT THE PROBE'S
  * EVENT TIME, not at arrival time.
  *
  * Probes buffer in state until the watermark passes their timestamp —
  * only then can no earlier version still arrive — and are emitted in
  * (ts, seq) order with the latest version whose vTs <= probe ts
  * (None before the first version: left-outer semantics).
  *
  * Version-state GC is Flink's exactly: keep versions newer than the
  * watermark plus the single latest version at-or-before it (any older
  * version can never be "current" for a future probe). Both inputs must
  * carry `withWatermark` so the union's watermark advances.
  */
object StreamingTemporalJoin {

  /** Union envelope (public for kryo). */
  case class TEnv[P, V](probe: Option[P], version: Option[V])

  case class TState[P, V](probes: List[P], versions: List[V])

  /** @param delay watermark delay, declared PER SIDE before the union
    *               (on the envelope's timestamp — callers need not
    *               pre-watermark). Two separate watermarks are
    *               essential: Spark's default min-combination policy
    *               then reproduces Flink's two-input watermark
    *               semantics, so a fast probe source can never advance
    *               the watermark past versions still in flight on the
    *               other side (which would drop them as late). */
  def asOf[K: Encoder, P: Encoder, V: Encoder](
      probes: Dataset[P], versions: Dataset[V], delay: String = "0 seconds",
      ttlMs: Option[Long] = None)(
      pKey: P => K, pTs: P => Long, pSeq: P => Long,
      vKey: V => K, vTs: V => Long): Dataset[(P, Option[V])] = {
    implicit val stEnc: Encoder[TState[P, V]] = Encoders.kryo[TState[P, V]]
    implicit val outEnc: Encoder[(P, Option[V])] = Encoders.kryo[(P, Option[V])]
    implicit val pairEnc: Encoder[(java.sql.Timestamp, TEnv[P, V])] =
      Encoders.tuple(Encoders.TIMESTAMP, Encoders.kryo[TEnv[P, V]])

    val unioned = probes
      .map(p => (new java.sql.Timestamp(pTs(p)), TEnv[P, V](Some(p), None)))
      .withWatermark("_1", delay)
      .union(versions
        .map(v => (new java.sql.Timestamp(vTs(v)), TEnv[P, V](None, Some(v))))
        .withWatermark("_1", delay))

    unioned
      .groupByKey(e => e._2.probe.map(pKey).getOrElse(vKey(e._2.version.get)))
      .flatMapGroupsWithState[TState[P, V], (P, Option[V])](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: K, rows: Iterator[(java.sql.Timestamp, TEnv[P, V])],
         state: GroupState[TState[P, V]]) =>
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption.getOrElse(TState[P, V](Nil, Nil))
          rows.map(_._2).foreach {
            case TEnv(Some(p), _) => st = st.copy(probes = p :: st.probes)
            case TEnv(_, Some(v)) => st = st.copy(versions = v :: st.versions)
            case _ =>
          }
          val (ripe, young) = st.probes.partition(p => pTs(p) <= wm)
          val sortedVersions = st.versions.sortBy(vTs)
          val out = ripe.sortBy(p => (pTs(p), pSeq(p))).map { p =>
            val current = sortedVersions.takeWhile(v => vTs(v) <= pTs(p))
              .lastOption
            (p, current)
          }
          // GC: versions newer than the watermark + the latest one <= wm
          val (old, fresh) = sortedVersions.partition(v => vTs(v) <= wm)
          val kept = old.lastOption.toList ++ fresh
          // idle eviction: the GC above keeps >= 1 version per key
          // forever, so quiet keys need the ttl path — a pure-timeout
          // invocation (no new rows, nothing released, no waiting
          // probes) means the key has been idle for >= ttlMs
          val pureTimeoutIdle = state.hasTimedOut && ripe.isEmpty &&
            young.isEmpty && st.probes.isEmpty
          if (young.isEmpty &&
              (kept.isEmpty || ttlMs.exists(_ => pureTimeoutIdle))) {
            state.remove()
          } else {
            state.update(TState(young, kept))
            if (young.nonEmpty)
              state.setTimeoutTimestamp(young.map(pTs).min)
            else ttlMs.foreach { t =>
              if (wm > Long.MinValue + t) state.setTimeoutTimestamp(wm + t)
            }
          }
          out.iterator
      }
  }
}
