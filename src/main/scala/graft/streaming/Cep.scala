package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, OutputMode}

/** CEP: MATCH_RECOGNIZE-style pattern matching over keyed streams
  * (SURVEY.md §2.12; reference flink-cep .../nfa/NFA.java,
  * .../pattern/Pattern.java and StreamExecMatch.java:59).
  *
  * Pattern algebra (mirrors flink-cep Pattern.java):
  *  - sequence of named steps, each with a predicate
  *  - quantifiers per step: exactly-one, `oneOrMore` (Pattern.java:271),
  *    `times(n)` / `times(from,to)` (Pattern.java:311), `timesOrMore`,
  *    `optional` (Pattern.java:257)
  *  - `greedy` vs reluctant looping (Pattern.java:285): greedy emits
  *    only the maximal match of a loop; reluctant emits every valid
  *    completion as the loop grows
  *  - `until` stop-condition on a looping step (Pattern.java:199)
  *  - contiguity per step: strict (`next`), relaxed (`followedBy`), or
  *    any (`followedByAny` / `allowCombinations` — SKIP_TILL_ANY,
  *    opt-in; see the state-cost note on those methods)
  *  - negation: `notFollowedBy` (relaxed — any event until the next
  *    positive step can kill, Pattern.java:222) and `notNext` (strict —
  *    only the immediately-next event is tested, Pattern.java:294)
  *  - `within` time bound on the whole match (Pattern.java:132)
  *  - after-match skip strategies (nfa/aftermatch/
  *    AfterMatchSkipStrategy.java:38): NO_SKIP, SKIP_TO_NEXT,
  *    SKIP_PAST_LAST_EVENT (default), SKIP_TO_FIRST(step),
  *    SKIP_TO_LAST(step) — implemented by per-key event sequence
  *    numbers, exactly how Flink's EventId comparisons work
  *
  * Events are processed in arrival order per key (feed event-time-
  * ordered input, e.g. through EventTimeSort, for rowtime semantics —
  * Flink's CepOperator does exactly this buffering+sorting internally).
  *
  * Documented deviations from the full Flink NFA (kept for bounded
  * state): under the DEFAULT eager contiguity a matching event always
  * extends/advances a partial — the skip-this-event branch exists only
  * behind the opt-in `followedByAny` / `allowCombinations`
  * (SKIP_TILL_ANY), which reproduce Flink's alternative-binding and
  * loop-subset outputs exactly at Flink's state cost (CepSpec
  * "reference-exact" ports of NFAITCase:2914 and
  * NotPatternITCase:46) — and an emitted partial is consumed (a
  * greedy loop followed by optional steps emits either the
  * loop-maximal or the extended match, not both). The remaining
  * default-mode boundary is pinned by CepSpec's NFAITCase ports with
  * reference-derived expected outputs:
  *  - "NFAITCase testSkipTillNextOneOrMore (2882)": Flink's eager
  *    prefix set collapses to our greedy maximal;
  *  - "NFAITCase testSkipTillAnyOneOrMore (2914)": subsets need the
  *    opt-in allowCombinations; the default-flag form stays maximal;
  *  - "NFAITCase testEagerZeroOrMore (1014)": the skip-the-loop
  *    branch of an optional loop is not enumerated when the loop
  *    matched;
  *  - "NFAITCase testEndWithOneOrMore (2317)": for TRAILING loops our
  *    reluctant mode reproduces Flink's eager output exactly;
  *  - "NFAITCase testStrictOneOrMore (2858)": a consecutive() loop
  *    whose contiguity breaks CLOSES (stops extending) but still
  *    reaches a relaxed next step, matching Flink's maximal match.
  *
  * State per key = live partial matches + a sequence counter; `within`
  * expiry and the skip strategy prune partials, and `ttlMs` (see
  * [[Ttl]]) evicts idle keys — bounded state on unbounded streams.
  */
object Cep {

  /** After-match skip strategies (AfterMatchSkipStrategy.java:38). */
  sealed trait SkipStrategy extends Serializable
  object SkipStrategy {
    /** Emit all matches, overlapping partials keep running. */
    case object NoSkip extends SkipStrategy
    /** Discard other partials that started at the match's first event. */
    case object SkipToNext extends SkipStrategy
    /** Discard partials that started at or before the match's last
      * event (Flink's MATCH_RECOGNIZE default). */
    case object SkipPastLastEvent extends SkipStrategy
    /** Discard partials that started before the first event mapped to
      * `step`. */
    case class SkipToFirst(step: String) extends SkipStrategy
    /** Discard partials that started before the last event mapped to
      * `step`. */
    case class SkipToLast(step: String) extends SkipStrategy
  }

  /** One pattern step. minTimes/maxTimes quantify repetitions
    * (maxTimes=None = unbounded); strict = must match the immediately
    * next event; greedy applies to looping steps; until stops a loop
    * from accepting further events; predCtx is an iterative condition
    * (flink-cep IterativeCondition.java:57): it additionally sees the
    * events matched so far in this partial, keyed by step name —
    * Flink's ctx.getEventsForPattern. */
  case class Step[T](name: String, pred: T => Boolean,
      minTimes: Int = 1, maxTimes: Option[Int] = Some(1),
      strict: Boolean = false, greedy: Boolean = true,
      until: Option[T => Boolean] = None,
      predCtx: Option[(T, Map[String, Seq[T]]) => Boolean] = None,
      negated: Boolean = false,
      any: Boolean = false, combinations: Boolean = false) {
    def isLoop: Boolean = maxTimes != Some(1)
    def canTake(ev: T): Boolean = pred(ev) && !until.exists(_(ev))
    def canTake(ev: T, soFar: => Map[String, Seq[T]]): Boolean =
      canTake(ev) && predCtx.forall(_(ev, soFar))
  }

  case class Pattern[T](steps: Vector[Step[T]], withinMs: Option[Long] = None) {
    def next(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, pred, strict = true))
    def followedBy(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, pred))
    def nextOneOrMore(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, pred, maxTimes = None, strict = true))
    def followedByOneOrMore(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, pred, maxTimes = None))
    /** Flink `times(n)`: exactly n strict consecutive matches. */
    def nextTimes(name: String, pred: T => Boolean, n: Int): Pattern[T] = {
      require(n >= 1)
      copy(steps = steps :+ Step(name, pred, minTimes = n, maxTimes = Some(n),
        strict = true))
    }
    def within(ms: Long): Pattern[T] = copy(withinMs = Some(ms))

    // ---- modifiers on the LAST step (Flink's builder style) ----
    private def mod(f: Step[T] => Step[T]): Pattern[T] =
      copy(steps = steps.init :+ f(steps.last))
    /** Pattern.java:257 — the last step may match zero times. */
    def optional: Pattern[T] = mod(_.copy(minTimes = 0))
    /** Pattern.java:311 — the last step repeats from..to times. */
    def times(from: Int, to: Int): Pattern[T] = {
      require(from >= 0 && to >= from && to >= 1)
      mod(_.copy(minTimes = from, maxTimes = Some(to)))
    }
    /** Pattern.java:327 — the last step repeats at least n times. */
    def timesOrMore(n: Int): Pattern[T] = {
      require(n >= 1)
      mod(_.copy(minTimes = n, maxTimes = None))
    }
    /** Pattern.java:285 — reluctant looping: emit each completion as
      * the loop grows instead of only the maximal match. */
    def reluctant: Pattern[T] = mod(_.copy(greedy = false))
    /** Pattern.java:199 — loop stop condition. */
    def until(p: T => Boolean): Pattern[T] = mod(_.copy(until = Some(p)))
    /** IterativeCondition on the last step: the predicate also sees the
      * partial match so far (events per step name, in match order). */
    def whereCtx(p: (T, Map[String, Seq[T]]) => Boolean): Pattern[T] =
      mod(_.copy(predCtx = Some(p)))
    /** Negative pattern (Pattern.java:222 `notFollowedBy`): while a
      * partial waits between the previous step and the next positive
      * step, an event matching `pred` KILLS it. Consumes nothing;
      * cannot end the pattern. */
    def notFollowedBy(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, pred, minTimes = 0,
        maxTimes = Some(0), negated = true))
    /** Strict negative pattern (Pattern.java:294 `notNext`): only the
      * event IMMEDIATELY after the previous step's last matched event
      * is tested — if it matches `pred` the partial dies; any other
      * immediate event discharges the guard for good (unlike
      * [[notFollowedBy]], which stays armed until the next positive
      * step matches). Consumes nothing; cannot end the pattern. */
    def notNext(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, pred, minTimes = 0,
        maxTimes = Some(0), negated = true, strict = true))
    /** SKIP_TILL_ANY contiguity (Pattern.java:185 `followedByAny`):
      * when an event matches this step, the skip-this-event
      * interpretation ALSO stays live, so LATER events matching the
      * step produce additional matches. OPT-IN state cost: live
      * partials multiply with the number of viable bindings (Flink
      * pays the same in its SharedBuffer); prune with `within`, a
      * skip strategy, and `ttlMs`. */
    def followedByAny(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, pred, any = true))
    /** Pattern.java:366 `allowCombinations`: the last (looping) step
      * emits every SUBSET of its matching events that contains the
      * first one, not just the contiguous prefix chain — each loop
      * extension also keeps the skip-this-event interpretation.
      * Loop ENTRY stays eager (first loop event is always bound),
      * matching Flink's SKIP_TILL_ANY internal strategy. Same opt-in
      * state cost as [[followedByAny]]. */
    def allowCombinations: Pattern[T] = mod(_.copy(combinations = true))
  }

  object Pattern {
    def begin[T](name: String, pred: T => Boolean): Pattern[T] =
      Pattern(Vector(Step(name, pred, strict = true)))
  }

  /** A completed match: events grouped per step name, in order.
    * `start_seq`/`end_seq` are the per-key arrival sequence numbers of
    * the match's first/last event — a deterministic match identity and
    * ordering (Flink's EventId pair), which MATCH_RECOGNIZE output
    * modes (ALL ROWS PER MATCH) need to tag rows by match. */
  case class Match[K, T](key: K, steps: Map[String, Seq[T]],
      start_seq: Long = 0L, end_seq: Long = 0L)

  /** A completed match OR a `within`-expired partial match
    * (timed_out=true) — Flink's TimedOutPartialMatchHandler side
    * output, used for absence detection ("no b followed a within T"). */
  case class MatchResult[K, T](key: K, steps: Map[String, Seq[T]],
      timed_out: Boolean, start_seq: Long = 0L, end_seq: Long = 0L)

  // One partial match: step index, repetition count at that step,
  // accumulated (stepName, seq, event), first-event ts + seq. `closed`
  // marks a STRICT loop that saw a non-taking event after reaching
  // minTimes: it can never extend again (consecutiveness is broken)
  // but still awaits a relaxed next step — Flink's consecutive() loop
  // followed by followedBy behaves exactly so (NFAITCase.java:2858
  // testStrictOneOrMore). Public: kryo state encoders reject
  // non-public classes.
  case class Partial[T](stepIdx: Int, count: Int,
      acc: Vector[(String, Long, T)], startTs: Long, startSeq: Long,
      closed: Boolean = false)

  case class NfaState[T](partials: List[Partial[T]], nextSeq: Long)

  /** Run the pattern over a keyed stream; emits a Match row as each
    * match completes.
    *
    * State-size contract: a key that has seen any event retains at
    * minimum its sequence counter forever (it is the match identity —
    * resetting it on idle would collide the start_seq/end_seq of later
    * matches on the same key). On an unbounded key space, PASS `ttlMs`:
    * it evicts idle keys entirely and keeps state bounded; match
    * identity is then unique within the TTL window (Flink's EventId
    * under state TTL behaves the same). Leaving `ttlMs = None` on
    * high-cardinality keys is an unbounded-state configuration. */
  def run[K: Encoder, T: Encoder](ds: Dataset[T], pattern: Pattern[T],
      skip: SkipStrategy = SkipStrategy.SkipPastLastEvent,
      ttlMs: Option[Long] = None)(
      key: T => K, tsMillis: T => Long): Dataset[Match[K, T]] = {
    implicit val outEnc: Encoder[Match[K, T]] = Encoders.kryo[Match[K, T]]
    runWithTimeouts(ds, pattern, skip, ttlMs)(key, tsMillis)
      .filter((r: MatchResult[K, T]) => !r.timed_out)
      .map(r => Match(r.key, r.steps, r.start_seq, r.end_seq))
  }

  /** Like [[run]], but `within`-expired partial matches are ALSO
    * emitted, flagged `timed_out = true` (reference flink-cep
    * .../nfa/TimedOutPartialMatchHandler.java — Flink's side output
    * for timed-out partials). Expiry is detected lazily, when the
    * key's next event arrives — feed keepalive/punctuation events for
    * prompt absence alerts on quiet keys. See [[run]] for the
    * state-size contract: pass `ttlMs` on unbounded key spaces. */
  def runWithTimeouts[K: Encoder, T: Encoder](ds: Dataset[T],
      pattern: Pattern[T],
      skip: SkipStrategy = SkipStrategy.SkipPastLastEvent,
      ttlMs: Option[Long] = None)(
      key: T => K, tsMillis: T => Long): Dataset[MatchResult[K, T]] = {
    implicit val stateEnc: Encoder[NfaState[T]] = Encoders.kryo[NfaState[T]]
    implicit val outEnc: Encoder[MatchResult[K, T]] =
      Encoders.kryo[MatchResult[K, T]]
    val steps = pattern.steps
    require(!steps.head.negated && !steps.last.negated,
      "a negative pattern cannot begin or end the sequence (Flink rule)")

    ds.groupByKey(key)
      .flatMapGroupsWithState[NfaState[T], MatchResult[K, T]](
        OutputMode.Append(), Ttl.conf(ttlMs)) {
        (k: K, rows: Iterator[T], state: GroupState[NfaState[T]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st0 = state.getOption.getOrElse(NfaState[T](Nil, 0L))
            val (st1, out) =
              advance(steps, pattern.withinMs, skip, k, st0, rows, tsMillis)
            // The seq counter persists even with no live partials: it IS
            // the match identity (start_seq/end_seq) — resetting it would
            // collide ids of later matches on the same key. Idle-key
            // state is one counter per key, UNBOUNDED across keys unless
            // `ttlMs` evicts it (see the run/runWithTimeouts scaladoc;
            // match identity is then unique within the TTL window, like
            // Flink's EventId under state TTL). The remove() below only
            // fires for a key that produced no state at all this batch.
            if (st1.partials.isEmpty && st1.nextSeq == 0L) state.remove()
            else { state.update(st1); Ttl.arm(state, ttlMs) }
            out.iterator
          }
      }
  }

  /** BATCH MATCH_RECOGNIZE (the reference's batch Match node —
    * CommonExecMatch is shared by StreamExecMatch and the batch
    * planner): PARTITION BY `key`, explicit ORDER BY (tsMillis,
    * tiebreak) materialized per group, then ONE pass of the same NFA
    * the streaming operator runs — engine single-sourced via
    * [[Cep.advance]], so CepSpec's NFAITCase ports guard both modes.
    * Per-group buffering bounds memory at the largest single key's
    * events, the same bound Flink's batch sort-based match carries. */
  def runBatch[K: Encoder, T: Encoder](ds: Dataset[T], pattern: Pattern[T],
      skip: SkipStrategy = SkipStrategy.SkipPastLastEvent)(
      key: T => K, tsMillis: T => Long,
      tiebreak: T => Long = (_: T) => 0L): Dataset[Match[K, T]] = {
    implicit val outEnc: Encoder[Match[K, T]] = Encoders.kryo[Match[K, T]]
    val steps = pattern.steps
    require(!steps.head.negated && !steps.last.negated,
      "a negative pattern cannot begin or end the sequence (Flink rule)")
    ds.groupByKey(key).flatMapGroups { (k: K, rows: Iterator[T]) =>
      val ordered = rows.toVector.sortBy(e => (tsMillis(e), tiebreak(e)))
      matchLocal(pattern, skip, k, ordered, tsMillis).iterator
    }
  }

  /** Single-key batch matcher on an in-memory ordered run — the exact
    * engine [[runBatch]] executes per group (one [[advance]] pass plus
    * the end-of-input flush), WITHOUT a SparkSession. Exists for
    * lightweight library use and for differential testing
    * (CepPropertySpec drives hundreds of randomized patterns through
    * it against a brute-force enumeration oracle). Events must already
    * be in match order. */
  def matchLocal[K, T](pattern: Pattern[T], skip: SkipStrategy, k: K,
      ordered: Seq[T], tsMillis: T => Long): Seq[Match[K, T]] = {
    val steps = pattern.steps
    require(!steps.head.negated && !steps.last.negated,
      "a negative pattern cannot begin or end the sequence (Flink rule)")
    val (st, out) = advance(steps, pattern.withinMs, skip, k,
      NfaState[T](Nil, 0L), ordered.iterator, tsMillis)
    (out ++ flushEndOfInput(steps, skip, k, st))
      .filter(!_.timed_out)
      .map(r => Match(r.key, r.steps, r.start_seq, r.end_seq))
  }

  /** End-of-input flush (batch only): a GREEDY open loop that is still
    * deferring its emission (waiting for more loop events) and has all
    * remaining obligations satisfied emits its maximal match when the
    * input ends — SQL/Flink batch MATCH_RECOGNIZE emits the maximal
    * match at end-of-input (CommonExecMatch's bounded-input final
    * advance). Mirrors the `deferred` branch of the within-expiry path
    * exactly: same completability test, same (startSeq, -length)
    * emission order, same after-match-skip pruning across the flushed
    * set. Reluctant loops are NOT flushed — they already emitted every
    * completion as they grew. Streaming never calls this: a micro-batch
    * boundary is not end-of-input. */
  private[graft] def flushEndOfInput[K, T](steps: Vector[Step[T]],
      skip: SkipStrategy, k: K, st: NfaState[T])
      : Seq[MatchResult[K, T]] = {
    def completable(i: Int, c: Int): Boolean =
      c >= steps(i).minTimes &&
        (i + 1 until steps.length).forall(steps(_).minTimes == 0)
    val deferred = st.partials.filter(p =>
      steps(p.stepIdx).greedy && completable(p.stepIdx, p.count))
    val ordered = deferred.sortBy(p => (p.startSeq, -p.acc.length))
    val killed = scala.collection.mutable.Set[Partial[T]]()
    val out = scala.collection.mutable.ArrayBuffer[MatchResult[K, T]]()
    ordered.foreach { c =>
      if (!killed(c)) {
        out += toResult(k, c, steps, timedOut = false)
        val keep = keepAfter(c, skip)
        ordered.foreach(o => if (!keep(o.startSeq)) killed += o)
      }
    }
    out.toSeq
  }

  /** The NFA engine: advances a key's state over an ORDERED event run,
    * returning the new state and the emitted (match | timed-out
    * partial) results. Shared verbatim by the streaming operator
    * ([[runWithTimeouts]]) and the batch one ([[runBatch]]).
    * private[graft] (not private) so CepPropertySpec can assert
    * chunk-split invariance — the streaming-restart contract that
    * state carries everything a later micro-batch needs. */
  private[graft] def advance[K, T](steps: Vector[Step[T]],
      withinMs: Option[Long], skip: SkipStrategy, k: K,
      st0: NfaState[T], rows: Iterator[T], tsMillis: T => Long)
      : (NfaState[T], Seq[MatchResult[K, T]]) = {
            var partials = st0.partials
            var seq = st0.nextSeq
            val out = scala.collection.mutable.ArrayBuffer[MatchResult[K, T]]()

            // completable = all remaining obligations satisfied
            def completable(i: Int, c: Int): Boolean =
              c >= steps(i).minTimes &&
                (i + 1 until steps.length).forall(steps(_).minTimes == 0)

            rows.foreach { ev =>
              val ts = tsMillis(ev)
              val s = seq; seq += 1
              // expire partials beyond the within-window. A GREEDY open
              // loop that was deferring its emission (waiting for more
              // loop events) and is completable emits its maximal MATCH
              // — the window closing is its closing signal; dropping it
              // as a mere timed-out partial would lose a valid match.
              // Everything else surfaces as a timed-out partial.
              // Expired completables go through the SAME ordering +
              // after-match-skip pruning as the normal candidate path:
              // for `a+ within w` with partials [a1,a2] and [a2] both
              // expiring on one late event, SkipPastLastEvent must emit
              // only [a1,a2] and surface the overlapping suffix [a2] as
              // a timed-out partial, exactly as if the matches had
              // closed on a live event.
              withinMs.foreach { w =>
                val (live, dead) = partials.partition(p => ts - p.startTs <= w)
                val (deferred, expired) = dead.partition(p =>
                  steps(p.stepIdx).greedy && completable(p.stepIdx, p.count))
                expired.foreach(p => out += toResult(k, p, steps, timedOut = true))
                val ordered = deferred.sortBy(p => (p.startSeq, -p.acc.length))
                val killed = scala.collection.mutable.Set[Partial[T]]()
                var survivors = live
                ordered.foreach { c =>
                  if (!killed(c)) {
                    out += toResult(k, c, steps, timedOut = false)
                    val keep = keepAfter(c, skip)
                    ordered.foreach(o => if (!keep(o.startSeq)) killed += o)
                    survivors = survivors.filter(p => keep(p.startSeq))
                  } else {
                    // pruned by the skip strategy: not a match, but its
                    // window still closed — surface as timed-out partial
                    out += toResult(k, c, steps, timedOut = true)
                  }
                }
                partials = survivors
              }

              var nextPartials = List.empty[Partial[T]]
              // completed-match candidates from this event, in creation order
              val candidates = scala.collection.mutable.ArrayBuffer[Partial[T]]()

              // Route a new configuration: emit-now, defer (greedy open
              // loop), or keep as a live partial. Greedy open loops with a
              // completable config stay live and emit on close (case c).
              def route(p: Partial[T]): Unit = {
                val stp = steps(p.stepIdx)
                val loopOpen = stp.isLoop && stp.maxTimes.forall(p.count < _)
                if (completable(p.stepIdx, p.count)) {
                  if (stp.greedy && loopOpen) nextPartials ::= p // defer
                  else if (!stp.greedy && loopOpen) {
                    candidates += p; nextPartials ::= p // emit AND continue
                  } else candidates += p // closed: emit, consumed
                } else nextPartials ::= p
              }

              // start new partial(s) at each reachable leading position
              val emptyCtx = Map.empty[String, Seq[T]].withDefaultValue(Seq.empty)
              var j = 0
              var scan = true
              while (scan && j < steps.length) {
                if (!steps(j).negated && steps(j).canTake(ev, emptyCtx))
                  route(Partial(j, 1, Vector((steps(j).name, s, ev)), ts, s))
                scan = steps(j).minTimes == 0 // deeper starts need skippable prefix
                j += 1
              }

              partials.foreach { p =>
                val cur = steps(p.stepIdx)
                // iterative-condition context: events matched so far,
                // per step name (Flink ctx.getEventsForPattern)
                lazy val soFar: Map[String, Seq[T]] = p.acc.groupBy(_._1)
                  .map { case (n, v) => n -> v.map(_._3).toSeq }
                  .withDefaultValue(Seq.empty)
                var advanced = false
                // did any branch CONSUME the partial (eager contiguity)?
                // any/combinations branches retain the skip-this-event
                // interpretation instead (SKIP_TILL_ANY).
                var tookNonAny = false
                // (a) loop on the current step (a closed strict loop can
                // never extend again — see Partial.closed)
                if (cur.isLoop && !p.closed && cur.maxTimes.forall(p.count < _) &&
                    cur.canTake(ev, soFar)) {
                  route(p.copy(count = p.count + 1,
                    acc = p.acc :+ ((cur.name, s, ev))))
                  advanced = true
                  if (!cur.combinations) tookNonAny = true
                }
                // (b) advance to a later step (skipping min-0 steps);
                // a negative guard (notFollowedBy) consumes nothing —
                // an event matching it kills the waiting partial and
                // blocks advancing through it
                var guardKilled = false
                if (p.count >= cur.minTimes) {
                  var i = p.stepIdx + 1
                  var go = true
                  while (go && i < steps.length) {
                    val st = steps(i)
                    if (st.negated) {
                      // a STRICT negation (notNext) is armed only for the
                      // event immediately after the partial's last matched
                      // event; once any other event passed it, it is
                      // discharged and becomes transparent. A relaxed
                      // negation (notFollowedBy) stays armed while waiting.
                      val armed = !st.strict || s == p.acc.last._2 + 1
                      if (armed && st.canTake(ev, soFar)) {
                        guardKilled = true; go = false
                      }
                    } else {
                      if (st.canTake(ev, soFar)) {
                        route(Partial(i, 1, p.acc :+ ((st.name, s, ev)),
                          p.startTs, p.startSeq))
                        advanced = true
                        if (!st.any) tookNonAny = true
                      }
                      go = st.minTimes == 0
                    }
                    i += 1
                  }
                }
                // (d) keep waiting under relaxed contiguity; strict
                // obligations kill the partial. Negative guards consume
                // nothing, so the contiguity obligation is carried by the
                // first POSITIVE step after them — and it binds only once
                // the partial is ELIGIBLE to advance (count >= minTimes):
                // while a relaxed loop is still filling, gaps are the
                // loop's own business, not the next step's.
                def keepWaiting(): Unit = {
                  var nx = p.stepIdx + 1
                  while (nx < steps.length && steps(nx).negated) nx += 1
                  val strictNext = p.count >= cur.minTimes &&
                    nx < steps.length && steps(nx).strict
                  val strictFill = cur.strict && p.count < cur.minTimes
                  if (!(strictNext || strictFill)) {
                    // A filled STRICT loop seeing a non-taking event
                    // CLOSES (consecutiveness is broken for good) but
                    // survives to await a relaxed next step — Flink's
                    // consecutive() + followedBy(end) semantics
                    // (NFAITCase.java:2858). Relaxed loops stay open:
                    // SKIP_TILL_NEXT skips gap events.
                    val nowClosed = p.closed || (cur.strict && cur.isLoop)
                    nextPartials ::= p.copy(closed = nowClosed)
                  }
                }
                if (guardKilled) {
                  // the waiting interpretation dies (loop branches taken
                  // above survive as their own interpretation)
                } else if (!advanced) {
                  // (c) a greedy completable loop closes on a non-taking
                  // event: emit the maximal match (partial consumed)
                  if (cur.greedy && cur.isLoop && completable(p.stepIdx, p.count))
                    candidates += p
                  else keepWaiting()
                } else if (!tookNonAny) {
                  // SKIP_TILL_ANY retention: every branch that took this
                  // event is an any/combinations step, so the skip-this-
                  // event interpretation stays live under the same
                  // waiting obligations as an untouched partial
                  keepWaiting()
                }
              }

              // emit candidates in start order, applying the after-match
              // skip strategy to both later candidates and live partials
              val ordered = candidates.sortBy(c => (c.startSeq, -c.acc.length))
              val killed = scala.collection.mutable.Set[Partial[T]]()
              ordered.foreach { c =>
                if (!killed(c)) {
                  out += toResult(k, c, steps, timedOut = false)
                  val keep = keepAfter(c, skip)
                  ordered.foreach(o => if (!keep(o.startSeq)) killed += o)
                  nextPartials = nextPartials.filter(p => keep(p.startSeq))
                }
              }
              partials = nextPartials.reverse
            }

            (NfaState(partials, seq), out.toSeq)
  }

  // Which start-seqs survive after emitting match `m`?
  private def keepAfter[T](m: Partial[T], skip: SkipStrategy): Long => Boolean = {
    val lastSeq = m.acc.last._2
    skip match {
      case SkipStrategy.NoSkip => _ => true
      case SkipStrategy.SkipToNext => _ != m.startSeq
      case SkipStrategy.SkipPastLastEvent => _ > lastSeq
      case SkipStrategy.SkipToFirst(stepName) =>
        val first = m.acc.collectFirst { case (n, q, _) if n == stepName => q }
          .getOrElse(m.startSeq)
        _ >= first
      case SkipStrategy.SkipToLast(stepName) =>
        val last = m.acc.reverseIterator
          .collectFirst { case (n, q, _) if n == stepName => q }
          .getOrElse(m.startSeq)
        _ >= last
    }
  }

  private def toResult[K, T](k: K, p: Partial[T], steps: Vector[Step[T]],
      timedOut: Boolean): MatchResult[K, T] = {
    val grouped = steps.map(s => s.name ->
      p.acc.filter(_._1 == s.name).map(_._3).toSeq).toMap
    MatchResult(k, grouped, timedOut, p.startSeq, p.acc.last._2)
  }
}
