package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** MATCH_RECOGNIZE-style front end over the CEP engine (SURVEY.md
  * §2.12; reference flink-table-planner
  * .../nodes/exec/stream/StreamExecMatch.java:59, which lowers the SQL
  * MATCH_RECOGNIZE clause onto flink-cep's Pattern/NFA — this object
  * is the same lowering for a compact pattern string).
  *
  * Pattern grammar (the PATTERN(...) sub-language):
  * {{{
  *   pattern   := term (' ' term)*
  *   term      := '!' NAME                  // negative guard (notFollowedBy)
  *              | NAME quant? '?'?          // trailing '?' = reluctant
  *   quant     := '+' | '*' | '?'           // 1+, 0+ (optional 1+), 0-1
  *              | '{' n '}' | '{' n ',' m '}' | '{' n ',}'
  * }}}
  * Contiguity: SQL MATCH_RECOGNIZE is STRICT-contiguous over the
  * partition — `PATTERN (low high)` does NOT match `low, gap, high`
  * (the reference lowering, CommonExecMatch.java:365, chains terms
  * with `previousPattern.next`). Terms therefore compile strict by
  * default; pass `relaxed = true` to chain with `followedBy`
  * (Flink CEP DataStream-style skip-over-gaps semantics) instead.
  * Example: `"down+ !cancel up{2,3} spike?"` with a predicate per
  * name. `*` desugars to an optional one-or-more, exactly how
  * Calcite's MATCH_RECOGNIZE planner normalizes it; `!n` is the
  * PATTERN-exclusion syntax `{- n -}` lowered to notFollowedBy.
  */
object MatchRecognize {

  private val Term = """([A-Za-z_][A-Za-z0-9_]*)(\+\??|\*\??|\?\??|\{\d+(,(\d+)?)?\}\??)?""".r

  /** Compile a pattern string + per-name predicates into a
    * [[Cep.Pattern]]. */
  def compile[T](patternStr: String, defs: Map[String, T => Boolean],
      withinMs: Option[Long] = None,
      relaxed: Boolean = false): Cep.Pattern[T] = {
    val terms = patternStr.trim.split("""\s+""").toVector
    require(terms.nonEmpty, "empty pattern")
    val steps = terms.map {
      case t if t.startsWith("!") =>
        val name = t.drop(1)
        val pred = defs.getOrElse(name,
          throw new IllegalArgumentException(s"no predicate DEFINEd for '$name'"))
        Cep.Step[T](name, pred, minTimes = 0, maxTimes = Some(0),
          negated = true)
      case Term(name, quant, _, _) =>
        val pred = defs.getOrElse(name,
          throw new IllegalArgumentException(s"no predicate DEFINEd for '$name'"))
        val q = Option(quant).getOrElse("")
        val reluctant = q.endsWith("??") ||
          (q.endsWith("?") && q.length > 1 && q != "??")
        val core = q.stripSuffix("?") match {
          case "" | "?" => (if (q.startsWith("?")) 0 else 1, Some(1))
          case "+" => (1, None)
          case "*" => (0, None)
          case b if b.startsWith("{") =>
            val body = b.stripPrefix("{").stripSuffix("}")
            body.split(",", -1) match {
              case Array(n) => (n.toInt, Some(n.toInt))
              case Array(n, "") => (n.toInt, None)
              case Array(n, m) => (n.toInt, Some(m.toInt))
              case _ => throw new IllegalArgumentException(s"bad quantifier $q")
            }
          case other => throw new IllegalArgumentException(s"bad quantifier $other")
        }
        Cep.Step[T](name, pred, minTimes = core._1, maxTimes = core._2,
          strict = !relaxed, greedy = !reluctant)
      case bad => throw new IllegalArgumentException(s"bad pattern term '$bad'")
    }
    // anchor the first step strictly, like Pattern.begin
    Cep.Pattern(steps.updated(0, steps.head.copy(strict = true)), withinMs)
  }

  /** State-retention contract of the SQL layer. The raw [[Cep.run]]
    * keeps its flexible `ttlMs: Option[Long]` (a power user may know
    * the key space is small), but a SQL MATCH_RECOGNIZE user gets no
    * such context — a silently-unbounded default here is the classic
    * slow state leak (see the contract note on [[Cep.run]]: an idle key
    * retains at minimum its sequence counter forever). So the SQL layer
    * demands an explicit choice:
    *  - [[StateRetention.Auto]] (default): derive TTL = 2 x the
    *    pattern's `within` window — a partial cannot complete beyond
    *    `within`, so twice that is a conservative idle-eviction bound;
    *    REFUSES (IllegalArgumentException) when the pattern has no
    *    `within`, because nothing bounds a safe TTL.
    *  - [[StateRetention.Ttl]]: explicit idle-key eviction.
    *  - [[StateRetention.Unbounded]]: explicit opt-in to keeping every
    *    key's state forever (bounded key spaces only). */
  sealed trait StateRetention
  object StateRetention {
    case object Auto extends StateRetention
    final case class Ttl(ms: Long) extends StateRetention {
      require(ms > 0, "TTL must be positive")
    }
    case object Unbounded extends StateRetention
  }

  private[graft] def resolveTtl(retention: StateRetention,
      withinMs: Option[Long]): Option[Long] = retention match {
    case StateRetention.Ttl(ms) => Some(ms)
    case StateRetention.Unbounded => None
    case StateRetention.Auto => withinMs match {
      case Some(w) => Some(math.max(2 * w, w)) // overflow-safe: 2w>=w
      case None => throw new IllegalArgumentException(
        "MATCH_RECOGNIZE state retention: the pattern has no `within` " +
          "window, so no TTL can be derived. Pass StateRetention.Ttl(ms) " +
          "to bound state on an unbounded key space, or " +
          "StateRetention.Unbounded to explicitly keep per-key state " +
          "forever (bounded key spaces only).")
    }
  }

  /** One-call MATCH_RECOGNIZE: PARTITION BY `key`, ORDER BY arrival
    * (compose with EventTimeSort for rowtime order), PATTERN + DEFINE
    * via `compile`, AFTER MATCH `skip`, state retention per
    * [[StateRetention]] (explicit-or-derived — never silently
    * unbounded). */
  def apply[K: Encoder, T: Encoder](ds: Dataset[T], patternStr: String,
      defs: Map[String, T => Boolean],
      skip: Cep.SkipStrategy = Cep.SkipStrategy.SkipPastLastEvent,
      withinMs: Option[Long] = None,
      retention: StateRetention = StateRetention.Auto,
      relaxed: Boolean = false)(
      key: T => K, tsMillis: T => Long): Dataset[Cep.Match[K, T]] =
    Cep.run(ds, compile(patternStr, defs, withinMs, relaxed), skip,
      resolveTtl(retention, withinMs))(key, tsMillis)

  /** One matched event under ALL ROWS PER MATCH: tagged with the match
    * identity (the match's first/last per-key sequence numbers), its
    * position inside the match, and CLASSIFIER() — the step name that
    * matched it. */
  case class ClassifiedRow[K, T](key: K, match_start: Long, match_end: Long,
      pos: Int, classifier: String, event: T)

  /** ALL ROWS PER MATCH + CLASSIFIER() output mode (SQL MATCH_RECOGNIZE;
    * reference CommonExecMatch MEASURES/output lowering): explode each
    * match into one row per matched event, in match order (steps in
    * pattern order, loop events in arrival order — advancement never
    * goes backwards, so this IS temporal order). ONE ROW PER MATCH
    * measures (FIRST/LAST/counts per step) need no helper: read
    * `match.steps(name).head/.last/.size` directly. */
  def allRowsPerMatch[K, T](ms: Dataset[Cep.Match[K, T]],
      stepOrder: Seq[String]): Dataset[ClassifiedRow[K, T]] = {
    implicit val enc: Encoder[ClassifiedRow[K, T]] =
      Encoders.kryo[ClassifiedRow[K, T]]
    ms.flatMap { m =>
      val evs = stepOrder.flatMap(s =>
        m.steps.getOrElse(s, Seq.empty).map(e => (s, e)))
      evs.zipWithIndex.map { case ((s, e), i) =>
        ClassifiedRow(m.key, m.start_seq, m.end_seq, i, s, e) }
    }
  }

  /** [[allRowsPerMatch]] with the step order taken from the pattern.
    * A name used by several pattern positions (e.g. `"a b a"`) appears
    * once, at its first position: `Match.steps` already merges all its
    * events under that name, so listing it per position would emit
    * duplicates. */
  def allRowsPerMatch[K, T](ms: Dataset[Cep.Match[K, T]],
      pattern: Cep.Pattern[T]): Dataset[ClassifiedRow[K, T]] =
    allRowsPerMatch(ms, pattern.steps.map(_.name).distinct)
}
