package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Two-sided changelog streaming join (SURVEY.md §2.3 "hard part";
  * reference OP/join/stream/StreamingJoinOperator.java:36 with
  * JoinRecordStateView): both inputs live in keyed state; every
  * arriving +I row emits join deltas against the opposite side's
  * current rows, every retraction (-U/-D) removes its row and emits
  * -D deltas for the pairs it participated in.
  *
  * Spark's native stream-stream join is append-only; this operator is
  * the retraction-aware variant, kept as a library op so Catalyst never
  * sees changelog semantics (SURVEY §7.4 stance). State per key is the
  * current multiset of live rows on each side — the same bound Flink's
  * JoinRecordStateView keeps; pair with a key-scoped TTL upstream when
  * inputs are unbounded.
  */
object ChangelogJoin {

  /** Internal union envelope (public for kryo). */
  case class Env[L, R](left: Option[L], right: Option[R])

  case class JoinDelta[L, R](row_kind: String, left: L, right: R)

  case class JoinState[L, R](lefts: List[L], rights: List[R])

  /** lId/rId: payload identity used to match a retraction to the stored
    * row (a -D row differs from its +I twin in the kind field itself,
    * so plain equality cannot find it).
    *
    * lSeq/rSeq: monotonic per-event sequence used to order a key's rows
    * WITHIN a micro-batch — the union delivers the two sides' rows in
    * nondeterministic order, so a +I and its -D landing in one batch
    * could otherwise apply reversed and corrupt state. The default (all
    * zero, stable sort) preserves arrival order, which is only safe when
    * at most one event per key lands per batch; pass a real sequence for
    * multi-event batches. */
  def inner[K: Encoder, L: Encoder, R: Encoder](
      left: Dataset[L], right: Dataset[R])(
      lKey: L => K, lKind: L => String, lId: L => Any,
      rKey: R => K, rKind: R => String, rId: R => Any,
      lSeq: L => Long = (_: L) => 0L,
      rSeq: R => Long = (_: R) => 0L,
      ttlMs: Option[Long] = None): Dataset[JoinDelta[L, R]] = {
    implicit val envEnc: Encoder[Env[L, R]] = Encoders.kryo[Env[L, R]]
    implicit val stEnc: Encoder[JoinState[L, R]] = Encoders.kryo[JoinState[L, R]]
    implicit val outEnc: Encoder[JoinDelta[L, R]] = Encoders.kryo[JoinDelta[L, R]]

    val unioned = left.map(l => Env[L, R](Some(l), None))
      .union(right.map(r => Env[L, R](None, Some(r))))

    unioned.groupByKey(e => e.left.map(lKey).getOrElse(rKey(e.right.get)))
      .flatMapGroupsWithState[JoinState[L, R], JoinDelta[L, R]](
        OutputMode.Update(), Ttl.conf(ttlMs)) {
        (k: K, rows: Iterator[Env[L, R]], state: GroupState[JoinState[L, R]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty } else {
          var st = state.getOption.getOrElse(JoinState[L, R](Nil, Nil))
          val out = scala.collection.mutable.ArrayBuffer[JoinDelta[L, R]]()
          sortBySeq(rows, lSeq, rSeq).foreach {
            case Env(Some(l), _) =>
              val add = lKind(l) == StreamOps.Insert || lKind(l) == StreamOps.UpdateAfter
              if (add) {
                st = st.copy(lefts = l :: st.lefts)
                st.rights.foreach(r => out += JoinDelta(StreamOps.Insert, l, r))
              } else {
                st = st.copy(lefts = removeOneBy(st.lefts)(x => lId(x) == lId(l)))
                st.rights.foreach(r => out += JoinDelta(StreamOps.Delete, l, r))
              }
            case Env(_, Some(r)) =>
              val add = rKind(r) == StreamOps.Insert || rKind(r) == StreamOps.UpdateAfter
              if (add) {
                st = st.copy(rights = r :: st.rights)
                st.lefts.foreach(l => out += JoinDelta(StreamOps.Insert, l, r))
              } else {
                st = st.copy(rights = removeOneBy(st.rights)(x => rId(x) == rId(r)))
                st.lefts.foreach(l => out += JoinDelta(StreamOps.Delete, l, r))
              }
            case _ =>
          }
          if (st.lefts.isEmpty && st.rights.isEmpty) state.remove()
          else { state.update(st); Ttl.arm(state, ttlMs) }
          out.iterator
          }
      }
  }

  /** Left-outer variant (reference OuterJoinRecordStateView +
    * OuterJoinPaddingUtil): an unmatched left row is emitted immediately
    * padded with None; when its first right match arrives the padded row
    * is retracted (-D (l, None)) and the real pair inserted; when the
    * last right match retracts, the padding comes back. */
  def leftOuter[K: Encoder, L: Encoder, R: Encoder](
      left: Dataset[L], right: Dataset[R])(
      lKey: L => K, lKind: L => String, lId: L => Any,
      rKey: R => K, rKind: R => String, rId: R => Any,
      lSeq: L => Long = (_: L) => 0L,
      rSeq: R => Long = (_: R) => 0L,
      ttlMs: Option[Long] = None): Dataset[JoinDelta[L, Option[R]]] = {
    implicit val envEnc: Encoder[Env[L, R]] = Encoders.kryo[Env[L, R]]
    implicit val stEnc: Encoder[JoinState[L, R]] = Encoders.kryo[JoinState[L, R]]
    implicit val outEnc: Encoder[JoinDelta[L, Option[R]]] =
      Encoders.kryo[JoinDelta[L, Option[R]]]

    val unioned = left.map(l => Env[L, R](Some(l), None))
      .union(right.map(r => Env[L, R](None, Some(r))))

    unioned.groupByKey(e => e.left.map(lKey).getOrElse(rKey(e.right.get)))
      .flatMapGroupsWithState[JoinState[L, R], JoinDelta[L, Option[R]]](
        OutputMode.Update(), Ttl.conf(ttlMs)) {
        (k: K, rows: Iterator[Env[L, R]], state: GroupState[JoinState[L, R]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty } else {
          var st = state.getOption.getOrElse(JoinState[L, R](Nil, Nil))
          val out = scala.collection.mutable.ArrayBuffer[JoinDelta[L, Option[R]]]()
          sortBySeq(rows, lSeq, rSeq).foreach {
            case Env(Some(l), _) =>
              if (lKind(l) == StreamOps.Insert || lKind(l) == StreamOps.UpdateAfter) {
                st = st.copy(lefts = l :: st.lefts)
                if (st.rights.isEmpty) out += JoinDelta(StreamOps.Insert, l, None)
                else st.rights.foreach(r => out += JoinDelta(StreamOps.Insert, l, Some(r)))
              } else {
                st = st.copy(lefts = removeOneBy(st.lefts)(x => lId(x) == lId(l)))
                if (st.rights.isEmpty) out += JoinDelta(StreamOps.Delete, l, None)
                else st.rights.foreach(r => out += JoinDelta(StreamOps.Delete, l, Some(r)))
              }
            case Env(_, Some(r)) =>
              if (rKind(r) == StreamOps.Insert || rKind(r) == StreamOps.UpdateAfter) {
                if (st.rights.isEmpty) // first match: retract the padding
                  st.lefts.foreach(l => out += JoinDelta(StreamOps.Delete, l, None))
                st = st.copy(rights = r :: st.rights)
                st.lefts.foreach(l => out += JoinDelta(StreamOps.Insert, l, Some(r)))
              } else {
                st = st.copy(rights = removeOneBy(st.rights)(x => rId(x) == rId(r)))
                st.lefts.foreach(l => out += JoinDelta(StreamOps.Delete, l, Some(r)))
                if (st.rights.isEmpty) // last match gone: padding returns
                  st.lefts.foreach(l => out += JoinDelta(StreamOps.Insert, l, None))
              }
            case _ =>
          }
          if (st.lefts.isEmpty && st.rights.isEmpty) state.remove()
          else { state.update(st); Ttl.arm(state, ttlMs) }
          out.iterator
          }
      }
  }

  /** Full-outer variant: BOTH sides get the padding lifecycle — an
    * unmatched row on either side is emitted padded with None; the
    * first opposite-side match retracts the padding(s); the last
    * opposite-side retraction restores them. */
  def fullOuter[K: Encoder, L: Encoder, R: Encoder](
      left: Dataset[L], right: Dataset[R])(
      lKey: L => K, lKind: L => String, lId: L => Any,
      rKey: R => K, rKind: R => String, rId: R => Any,
      lSeq: L => Long = (_: L) => 0L,
      rSeq: R => Long = (_: R) => 0L,
      ttlMs: Option[Long] = None): Dataset[JoinDelta[Option[L], Option[R]]] = {
    implicit val envEnc: Encoder[Env[L, R]] = Encoders.kryo[Env[L, R]]
    implicit val stEnc: Encoder[JoinState[L, R]] = Encoders.kryo[JoinState[L, R]]
    implicit val outEnc: Encoder[JoinDelta[Option[L], Option[R]]] =
      Encoders.kryo[JoinDelta[Option[L], Option[R]]]

    val unioned = left.map(l => Env[L, R](Some(l), None))
      .union(right.map(r => Env[L, R](None, Some(r))))

    unioned.groupByKey(e => e.left.map(lKey).getOrElse(rKey(e.right.get)))
      .flatMapGroupsWithState[JoinState[L, R], JoinDelta[Option[L], Option[R]]](
        OutputMode.Update(), Ttl.conf(ttlMs)) {
        (k: K, rows: Iterator[Env[L, R]], state: GroupState[JoinState[L, R]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty } else {
          var st = state.getOption.getOrElse(JoinState[L, R](Nil, Nil))
          val out = scala.collection.mutable.ArrayBuffer[JoinDelta[Option[L], Option[R]]]()
          sortBySeq(rows, lSeq, rSeq).foreach {
            case Env(Some(l), _) =>
              if (lKind(l) == StreamOps.Insert || lKind(l) == StreamOps.UpdateAfter) {
                if (st.lefts.isEmpty && st.rights.nonEmpty)
                  st.rights.foreach(r => // rights stop being unmatched
                    out += JoinDelta(StreamOps.Delete, None, Some(r)))
                st = st.copy(lefts = l :: st.lefts)
                if (st.rights.isEmpty) out += JoinDelta(StreamOps.Insert, Some(l), None)
                else st.rights.foreach(r =>
                  out += JoinDelta(StreamOps.Insert, Some(l), Some(r)))
              } else {
                st = st.copy(lefts = removeOneBy(st.lefts)(x => lId(x) == lId(l)))
                if (st.rights.isEmpty) out += JoinDelta(StreamOps.Delete, Some(l), None)
                else {
                  st.rights.foreach(r =>
                    out += JoinDelta(StreamOps.Delete, Some(l), Some(r)))
                  if (st.lefts.isEmpty) // rights become unmatched again
                    st.rights.foreach(r =>
                      out += JoinDelta(StreamOps.Insert, None, Some(r)))
                }
              }
            case Env(_, Some(r)) =>
              if (rKind(r) == StreamOps.Insert || rKind(r) == StreamOps.UpdateAfter) {
                if (st.rights.isEmpty && st.lefts.nonEmpty)
                  st.lefts.foreach(l =>
                    out += JoinDelta(StreamOps.Delete, Some(l), None))
                st = st.copy(rights = r :: st.rights)
                if (st.lefts.isEmpty) out += JoinDelta(StreamOps.Insert, None, Some(r))
                else st.lefts.foreach(l =>
                  out += JoinDelta(StreamOps.Insert, Some(l), Some(r)))
              } else {
                st = st.copy(rights = removeOneBy(st.rights)(x => rId(x) == rId(r)))
                if (st.lefts.isEmpty) out += JoinDelta(StreamOps.Delete, None, Some(r))
                else {
                  st.lefts.foreach(l =>
                    out += JoinDelta(StreamOps.Delete, Some(l), Some(r)))
                  if (st.rights.isEmpty)
                    st.lefts.foreach(l =>
                      out += JoinDelta(StreamOps.Insert, Some(l), None))
                }
              }
            case _ =>
          }
          if (st.lefts.isEmpty && st.rights.isEmpty) state.remove()
          else { state.update(st); Ttl.arm(state, ttlMs) }
          out.iterator
          }
      }
  }

  /** Output row of the semi/anti variants: the LEFT row only, tagged
    * with the emission kind (+I / -D; like the other variants, update
    * kinds are normalized to insert/delete). */
  case class SemiDelta[L](row_kind: String, left: L)

  /** Streaming changelog SEMI join — `WHERE key IN (subquery stream)` /
    * `WHERE EXISTS` (reference OP/join/stream/
    * StreamingSemiAntiJoinOperator.java:34, planned by
    * StreamExecJoin.java:71): a left row is live in the output while
    * the right side holds AT LEAST ONE row for its key.
    *
    *  - left +I with right matches present -> +I(left); left retract
    *    while matched -> -D(left) (unmatched left rows move silently)
    *  - right transition 0->1 rows -> +I for every stored left row;
    *    1->0 -> -D for every stored left row; transitions that stay
    *    above zero (1->2, 2->1) emit NOTHING — exactly the reference's
    *    numOfAssociations == 0 / == 1 gates. */
  def semi[K: Encoder, L: Encoder, R: Encoder](
      left: Dataset[L], right: Dataset[R])(
      lKey: L => K, lKind: L => String, lId: L => Any,
      rKey: R => K, rKind: R => String, rId: R => Any,
      lSeq: L => Long = (_: L) => 0L,
      rSeq: R => Long = (_: R) => 0L,
      ttlMs: Option[Long] = None): Dataset[SemiDelta[L]] =
    semiAnti(isAnti = false, left, right)(
      lKey, lKind, lId, rKey, rKind, rId, lSeq, rSeq, ttlMs)

  /** Streaming changelog ANTI join — `WHERE key NOT IN (...)` /
    * `WHERE NOT EXISTS`: a left row is live in the output while the
    * right side holds NO row for its key ("events whose key is absent
    * from the retracting allowlist stream"). Mirrors [[semi]]: right
    * 0->1 retracts every stored left row, 1->0 re-emits them. */
  def anti[K: Encoder, L: Encoder, R: Encoder](
      left: Dataset[L], right: Dataset[R])(
      lKey: L => K, lKind: L => String, lId: L => Any,
      rKey: R => K, rKind: R => String, rId: R => Any,
      lSeq: L => Long = (_: L) => 0L,
      rSeq: R => Long = (_: R) => 0L,
      ttlMs: Option[Long] = None): Dataset[SemiDelta[L]] =
    semiAnti(isAnti = true, left, right)(
      lKey, lKind, lId, rKey, rKind, rId, lSeq, rSeq, ttlMs)

  private def semiAnti[K: Encoder, L: Encoder, R: Encoder](
      isAnti: Boolean, left: Dataset[L], right: Dataset[R])(
      lKey: L => K, lKind: L => String, lId: L => Any,
      rKey: R => K, rKind: R => String, rId: R => Any,
      lSeq: L => Long, rSeq: R => Long,
      ttlMs: Option[Long]): Dataset[SemiDelta[L]] = {
    implicit val envEnc: Encoder[Env[L, R]] = Encoders.kryo[Env[L, R]]
    implicit val stEnc: Encoder[JoinState[L, R]] = Encoders.kryo[JoinState[L, R]]
    implicit val outEnc: Encoder[SemiDelta[L]] = Encoders.kryo[SemiDelta[L]]

    val unioned = left.map(l => Env[L, R](Some(l), None))
      .union(right.map(r => Env[L, R](None, Some(r))))

    unioned.groupByKey(e => e.left.map(lKey).getOrElse(rKey(e.right.get)))
      .flatMapGroupsWithState[JoinState[L, R], SemiDelta[L]](
        OutputMode.Update(), Ttl.conf(ttlMs)) {
        (k: K, rows: Iterator[Env[L, R]], state: GroupState[JoinState[L, R]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty } else {
          var st = state.getOption.getOrElse(JoinState[L, R](Nil, Nil))
          val out = scala.collection.mutable.ArrayBuffer[SemiDelta[L]]()
          sortBySeq(rows, lSeq, rSeq).foreach {
            case Env(Some(l), _) =>
              val add = lKind(l) == StreamOps.Insert ||
                lKind(l) == StreamOps.UpdateAfter
              // semi emits when matched, anti when unmatched — with the
              // input's accumulate/retract polarity (reference
              // processElement1 pseudo code)
              if (st.rights.nonEmpty != isAnti)
                out += SemiDelta(
                  if (add) StreamOps.Insert else StreamOps.Delete, l)
              st =
                if (add) st.copy(lefts = l :: st.lefts)
                else st.copy(lefts = removeOneBy(st.lefts)(x => lId(x) == lId(l)))
            case Env(_, Some(r)) =>
              val add = rKind(r) == StreamOps.Insert ||
                rKind(r) == StreamOps.UpdateAfter
              val before = st.rights.size
              st =
                if (add) st.copy(rights = r :: st.rights)
                else st.copy(rights = removeOneBy(st.rights)(x => rId(x) == rId(r)))
              // only the 0<->1 transitions flip the membership predicate
              // for the stored left rows (processElement2 pseudo code);
              // 1->2 / 2->1 emit nothing
              if (add && before == 0)
                st.lefts.foreach(l => out += SemiDelta(
                  if (isAnti) StreamOps.Delete else StreamOps.Insert, l))
              else if (!add && before == 1 && st.rights.isEmpty)
                st.lefts.foreach(l => out += SemiDelta(
                  if (isAnti) StreamOps.Insert else StreamOps.Delete, l))
            case _ =>
          }
          if (st.lefts.isEmpty && st.rights.isEmpty) state.remove()
          else { state.update(st); Ttl.arm(state, ttlMs) }
          out.iterator
          }
      }
  }

  /** Right-outer variant: the exact mirror of [[leftOuter]] — unmatched
    * RIGHT rows get the None-padding lifecycle (reference
    * OuterJoinRecordStateView handles all four shapes symmetrically). */
  def rightOuter[K: Encoder, L: Encoder, R: Encoder](
      left: Dataset[L], right: Dataset[R])(
      lKey: L => K, lKind: L => String, lId: L => Any,
      rKey: R => K, rKind: R => String, rId: R => Any,
      lSeq: L => Long = (_: L) => 0L,
      rSeq: R => Long = (_: R) => 0L,
      ttlMs: Option[Long] = None): Dataset[JoinDelta[Option[L], R]] = {
    implicit val outEnc: Encoder[JoinDelta[Option[L], R]] =
      Encoders.kryo[JoinDelta[Option[L], R]]
    leftOuter(right, left)(rKey, rKind, rId, lKey, lKind, lId, rSeq, lSeq, ttlMs)
      .map(d => JoinDelta[Option[L], R](d.row_kind, d.right, d.left))
  }

  // Stable sort of a key's micro-batch rows by the caller's sequence;
  // default all-zero seqs keep arrival order.
  private def sortBySeq[L, R](rows: Iterator[Env[L, R]],
      lSeq: L => Long, rSeq: R => Long): Vector[Env[L, R]] =
    rows.toVector.sortBy {
      case Env(Some(l), _) => lSeq(l)
      case Env(_, Some(r)) => rSeq(r)
      case _ => Long.MaxValue
    }

  // iterative (span + splice): a recursive version overflows the stack
  // on hot keys with ~100k live rows — exactly the skew this op's scale
  // posture anticipates
  private def removeOneBy[T](xs: List[T])(p: T => Boolean): List[T] = {
    val (pre, post) = xs.span(x => !p(x))
    if (post.isEmpty) xs else pre ::: post.tail
  }
}
