package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CEP-lite: MATCH_RECOGNIZE-style pattern matching over keyed streams
  * (SURVEY.md §2.12; reference flink-cep .../nfa/NFA.java and
  * StreamExecMatch.java:59).
  *
  * Supported pattern algebra (the workhorse subset of Flink's CEP):
  *  - sequence of named steps, each with a predicate
  *  - per-step quantifier: exactly-one or oneOrMore (greedy)
  *  - contiguity per step: strict (`next`) or relaxed (`followedBy`)
  *  - `within` time bound on the whole match
  *  - after-match skip: SKIP_PAST_LAST_EVENT (Flink's default for
  *    MATCH_RECOGNIZE `AFTER MATCH SKIP PAST LAST ROW`)
  *
  * Events are processed in arrival order per key (feed event-time-ordered
  * input, e.g. through EventTimeSort, for rowtime semantics — Flink's
  * CepOperator does exactly this buffering+sorting internally).
  *
  * The NFA state per key is the set of live partial matches; with strict
  * contiguity and skip-past-last it is small in practice, and `within`
  * expiry prunes stale partials — bounded state on unbounded streams.
  */
object Cep {

  case class Step[T](name: String, pred: T => Boolean,
      oneOrMore: Boolean = false, strict: Boolean = false)

  case class Pattern[T](steps: Vector[Step[T]], withinMs: Option[Long] = None) {
    def next(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, pred, strict = true))
    def followedBy(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, pred))
    def nextOneOrMore(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, pred, oneOrMore = true, strict = true))
    def followedByOneOrMore(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, pred, oneOrMore = true))
    /** Flink `times(n)`: exactly n strict consecutive matches — unrolled
      * into n steps sharing the name (toMatch regroups them). */
    def nextTimes(name: String, pred: T => Boolean, n: Int): Pattern[T] = {
      require(n >= 1)
      copy(steps = steps ++ Vector.fill(n)(Step(name, pred, strict = true)))
    }
    def within(ms: Long): Pattern[T] = copy(withinMs = Some(ms))
  }

  object Pattern {
    def begin[T](name: String, pred: T => Boolean): Pattern[T] =
      Pattern(Vector(Step(name, pred, strict = true)))
  }

  /** A completed match: events grouped per step name, in order. */
  case class Match[K, T](key: K, steps: Map[String, Seq[T]])

  // One partial match: index of the step being matched, events per step,
  // ts of first event. Public: kryo state encoders reject non-public
  // classes.
  case class Partial[T](stepIdx: Int, acc: Vector[(String, T)],
      startTs: Long, lastWasStep: Boolean)

  case class NfaState[T](partials: List[Partial[T]])

  /** Run the pattern over a keyed stream; emits a Match row as each match
    * completes. */
  def run[K: Encoder, T: Encoder](ds: Dataset[T], pattern: Pattern[T])(
      key: T => K, tsMillis: T => Long): Dataset[Match[K, T]] = {
    implicit val stateEnc: Encoder[NfaState[T]] = Encoders.kryo[NfaState[T]]
    implicit val outEnc: Encoder[Match[K, T]] = Encoders.kryo[Match[K, T]]
    val steps = pattern.steps

    ds.groupByKey(key)
      .flatMapGroupsWithState[NfaState[T], Match[K, T]](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: K, rows: Iterator[T], state: GroupState[NfaState[T]]) =>
          var partials = state.getOption.map(_.partials).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer[Match[K, T]]()

          rows.foreach { ev =>
            val ts = tsMillis(ev)
            // expire partials beyond the within-window
            partials = partials.filter(p =>
              pattern.withinMs.forall(w => ts - p.startTs <= w))

            var nextPartials = List.empty[Partial[T]]
            var completed: Option[Partial[T]] = None
            // does the completing match contain the current event?
            var completedWithEv = false
            // the step-0 partial started by the current event, if any
            var freshP: Option[Partial[T]] = None

            // try to start a new partial at step 0
            if (steps(0).pred(ev)) {
              val p = Partial(0, Vector(steps(0).name -> ev), ts, lastWasStep = true)
              if (steps.length == 1 && !steps(0).oneOrMore) {
                completed = Some(p); completedWithEv = true
              } else { freshP = Some(p); nextPartials ::= p }
            }

            partials.foreach { p =>
              val cur = steps(p.stepIdx)
              val nxt = if (p.stepIdx + 1 < steps.length) Some(steps(p.stepIdx + 1)) else None
              var advanced = false
              // (a) loop on a oneOrMore step
              if (cur.oneOrMore && cur.pred(ev)) {
                nextPartials ::= p.copy(acc = p.acc :+ (cur.name -> ev),
                  lastWasStep = true)
                advanced = true
              }
              // (b) advance to the next step
              nxt.foreach { n =>
                if (n.pred(ev)) {
                  val p2 = Partial(p.stepIdx + 1, p.acc :+ (n.name -> ev),
                    p.startTs, lastWasStep = true)
                  if (p.stepIdx + 2 == steps.length && !n.oneOrMore) {
                    if (completed.isEmpty) { completed = Some(p2); completedWithEv = true }
                  } else nextPartials ::= p2
                  advanced = true
                }
              }
              // (c) oneOrMore final step: a non-matching event closes it
              if (cur.oneOrMore && p.stepIdx + 1 == steps.length && !cur.pred(ev)) {
                if (completed.isEmpty) completed = Some(p)
                advanced = true
              }
              // (d) keep waiting only if the NEXT event may still match
              //     (relaxed contiguity); strict steps drop unadvanced
              if (!advanced && !(nxt.exists(_.strict) ||
                  (cur.oneOrMore && cur.strict))) {
                nextPartials ::= p
              }
            }

            completed match {
              case Some(c) =>
                out += toMatch(k, c, steps)
                // SKIP_PAST_LAST_EVENT resumes after the match's LAST row:
                // partials overlapping the match die, but when the match was
                // closed by a non-matching event (case c, current event not
                // in the match) that event's own step-0 partial survives —
                // otherwise e.g. `a then b+` over a,b,a,b finds 1 match
                // instead of 2.
                nextPartials = if (completedWithEv) Nil else freshP.toList
              case None =>
            }
            partials = nextPartials.reverse
          }

          state.update(NfaState(partials))
          out.iterator
      }
  }

  private def toMatch[K, T](k: K, p: Partial[T],
      steps: Vector[Step[T]]): Match[K, T] = {
    val grouped = steps.map(s => s.name ->
      p.acc.filter(_._1 == s.name).map(_._2).toSeq).toMap
    Match(k, grouped)
  }
}
