package graft

import graft.streaming.Cep
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

case class Tick(symbol: String, price: Double, ts: Timestamp)

/** Serializable event-kind predicates for the notNext ports
  * (price-range encoding: a=1x, b=2x, c=3x, d=4x, filler=9x). */
object CepSpecKinds extends Serializable {
  val kindA: Tick => Boolean = t => t.price >= 10 && t.price < 20
  val kindB: Tick => Boolean = t => t.price >= 20 && t.price < 30
  val kindC: Tick => Boolean = t => t.price >= 30 && t.price < 40
  val kindD: Tick => Boolean = t => t.price >= 40 && t.price < 50
}

/** CEP-lite tests mirroring Flink's rise-then-fall MATCH_RECOGNIZE
  * ITCases (reference MatchRecognizeITCase.scala, NFAITCase.java). */
class CepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  def ts(sec: Int): Timestamp = new Timestamp(1700000000000L + sec * 1000L)

  private var qn = 0
  def run(ticks: Seq[Tick], pattern: Cep.Pattern[Tick],
      skip: Cep.SkipStrategy = Cep.SkipStrategy.SkipPastLastEvent)
      : Seq[Cep.Match[String, Tick]] = {
    qn += 1
    val name = s"cep_out_$qn"
    val in = MemoryStream[Tick]
    val q = Cep.run(in.toDS(), pattern, skip)(_.symbol, _.ts.getTime)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    in.addData(ticks: _*)
    q.processAllAvailable()
    q.stop()
    spark.table(name).as[Cep.Match[String, Tick]](
      org.apache.spark.sql.Encoders.kryo[Cep.Match[String, Tick]])
      .collect().toSeq
  }

  val riseFall: Cep.Pattern[Tick] =
    Cep.Pattern.begin[Tick]("low", _.price < 100)
      .nextOneOrMore("high", _.price >= 100)
      .next("drop", _.price < 100)

  test("rise-then-fall matches with greedy oneOrMore") {
    val ms = run(Seq(
      Tick("A", 90, ts(0)), Tick("A", 110, ts(1)), Tick("A", 120, ts(2)),
      Tick("A", 95, ts(3))), riseFall)
    assert(ms.size == 1)
    val m = ms.head
    assert(m.key == "A")
    assert(m.steps("low").map(_.price) == Seq(90.0))
    assert(m.steps("high").map(_.price) == Seq(110.0, 120.0))
    assert(m.steps("drop").map(_.price) == Seq(95.0))
  }

  test("strict contiguity: gap event kills the partial") {
    // 'low' then immediately a non-high, non-low event (price<100 matches
    // low again though) — use a sequence where high never starts
    val ms = run(Seq(
      Tick("B", 90, ts(0)), Tick("B", 80, ts(1)), Tick("B", 70, ts(2))),
      riseFall)
    assert(ms.isEmpty)
  }

  test("after-match skip-past-last: non-overlapping matches") {
    val ms = run(Seq(
      Tick("C", 90, ts(0)), Tick("C", 110, ts(1)), Tick("C", 95, ts(2)),
      Tick("C", 120, ts(3)), Tick("C", 80, ts(4))), riseFall)
    // first match consumes 90,110,95; then 95? skipped past last -> new
    // match must start fresh: 95 was consumed, so next low is... 80 has
    // no high after -> only one match
    assert(ms.size == 1)
  }

  test("two sequential matches on one key") {
    val ms = run(Seq(
      Tick("D", 90, ts(0)), Tick("D", 110, ts(1)), Tick("D", 95, ts(2)),
      Tick("D", 85, ts(3)), Tick("D", 130, ts(4)), Tick("D", 70, ts(5))),
      riseFall)
    assert(ms.size == 2)
    assert(ms.map(_.steps("drop").head.price).toSet == Set(95.0, 70.0))
  }

  test("within bound expires old partials") {
    val p = riseFall.within(2000) // 2 seconds
    val ms = run(Seq(
      Tick("E", 90, ts(0)), Tick("E", 110, ts(1)),
      Tick("E", 120, ts(10)), // 10s later: partial expired
      Tick("E", 95, ts(11))), p)
    assert(ms.isEmpty)
  }

  test("nextTimes(n): exactly n strict repetitions") {
    val p = Cep.Pattern.begin[Tick]("low", _.price < 100)
      .nextTimes("high", _.price >= 100, 2)
      .next("drop", _.price < 100)
    // two highs -> match; one high -> no match
    val ok = run(Seq(
      Tick("T", 90, ts(0)), Tick("T", 110, ts(1)), Tick("T", 120, ts(2)),
      Tick("T", 95, ts(3))), p)
    assert(ok.size == 1)
    assert(ok.head.steps("high").map(_.price) == Seq(110.0, 120.0))
    val short = run(Seq(
      Tick("U", 90, ts(0)), Tick("U", 110, ts(1)), Tick("U", 95, ts(2))), p)
    assert(short.isEmpty)
  }

  test("followedByOneOrMore tolerates gap events (relaxed contiguity)") {
    val p = Cep.Pattern.begin[Tick]("low", _.price < 100)
      .followedByOneOrMore("spike", _.price >= 150)
      .next("calm", t => t.price >= 100 && t.price < 150)
    // 90 (low), 160 (spike), 200 (spike), 120 (calm) -> match even though
    // relaxed steps could have had non-matching gaps
    val ms = run(Seq(
      Tick("R", 90, ts(0)), Tick("R", 160, ts(1)), Tick("R", 200, ts(2)),
      Tick("R", 120, ts(3))), p)
    assert(ms.size == 1)
    assert(ms.head.steps("spike").map(_.price) == Seq(160.0, 200.0))
  }

  test("partial matches survive across micro-batches (NFA state persistence)") {
    val in = MemoryStream[Tick]
    qn += 1
    val name = s"cep_out_$qn"
    val q = Cep.run(in.toDS(), riseFall)(_.symbol, _.ts.getTime)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    in.addData(Tick("S", 90, ts(0)), Tick("S", 110, ts(1))) // partial: low+high
    q.processAllAvailable()
    assert(spark.table(name).count() == 0) // not yet complete
    in.addData(Tick("S", 80, ts(2))) // drop arrives in a later trigger
    q.processAllAvailable()
    q.stop()
    assert(spark.table(name).count() == 1)
  }

  test("trailing oneOrMore: the closing event can start the next match") {
    // Flink SKIP_PAST_LAST resumes AFTER the match's last row; an event
    // that merely CLOSES a trailing b+ (and is not part of the match)
    // must still be able to begin the next match.
    val p = Cep.Pattern.begin[Tick]("low", _.price < 100)
      .followedByOneOrMore("high", _.price >= 100)
    val ms = run(Seq(
      Tick("V", 90, ts(0)), Tick("V", 110, ts(1)), Tick("V", 95, ts(2)),
      Tick("V", 120, ts(3)), Tick("V", 85, ts(4))), p)
    assert(ms.size == 2)
    assert(ms.map(_.steps("low").head.price).toSet == Set(90.0, 95.0))
    assert(ms.map(_.steps("high").map(_.price)).toSet ==
      Set(Seq(110.0), Seq(120.0)))
  }

  test("keys are independent") {
    val ms = run(Seq(
      Tick("X", 90, ts(0)), Tick("Y", 110, ts(1)),
      Tick("X", 110, ts(2)), Tick("X", 95, ts(3))), riseFall)
    assert(ms.size == 1 && ms.head.key == "X")
  }

  // ---- ports of flink-cep NFAITCase / AfterMatchSkipStrategy cases ----

  test("optional step can be skipped or taken (NFAITCase testOptional)") {
    val p = Cep.Pattern.begin[Tick]("a", _.price < 100)
      .followedBy("b", t => t.price >= 100 && t.price < 150).optional
      .followedBy("c", _.price >= 150)
    val skipped = run(Seq(Tick("O1", 90, ts(0)), Tick("O1", 160, ts(1))), p)
    assert(skipped.size == 1)
    assert(skipped.head.steps("b").isEmpty)
    assert(skipped.head.steps("c").map(_.price) == Seq(160.0))
    val taken = run(Seq(
      Tick("O2", 90, ts(0)), Tick("O2", 120, ts(1)), Tick("O2", 160, ts(2))), p)
    assert(taken.size == 1)
    assert(taken.head.steps("b").map(_.price) == Seq(120.0))
  }

  test("times(from,to) range quantifier (NFAITCase testTimesRange)") {
    val p = Cep.Pattern.begin[Tick]("a", _.price < 100)
      .followedBy("b", t => t.price >= 100 && t.price < 150).times(2, 3)
      .followedBy("c", _.price >= 150)
    val two = run(Seq(
      Tick("T2", 90, ts(0)), Tick("T2", 110, ts(1)), Tick("T2", 120, ts(2)),
      Tick("T2", 160, ts(3))), p)
    assert(two.size == 1)
    assert(two.head.steps("b").map(_.price) == Seq(110.0, 120.0))
    val three = run(Seq(
      Tick("T3", 90, ts(0)), Tick("T3", 110, ts(1)), Tick("T3", 120, ts(2)),
      Tick("T3", 130, ts(3)), Tick("T3", 160, ts(4))), p)
    assert(three.size == 1)
    assert(three.head.steps("b").map(_.price) == Seq(110.0, 120.0, 130.0))
    val tooFew = run(Seq(
      Tick("T1", 90, ts(0)), Tick("T1", 110, ts(1)), Tick("T1", 160, ts(2))), p)
    assert(tooFew.isEmpty)
  }

  test("reluctant loop emits each completion as it grows (greedy emits maximal only)") {
    val rel = Cep.Pattern.begin[Tick]("low", _.price < 100)
      .followedByOneOrMore("high", _.price >= 100).reluctant
    val ms = run(Seq(
      Tick("RL", 90, ts(0)), Tick("RL", 110, ts(1)), Tick("RL", 120, ts(2))),
      rel, Cep.SkipStrategy.NoSkip)
    assert(ms.map(_.steps("high").map(_.price)).toSet ==
      Set(Seq(110.0), Seq(110.0, 120.0)))
  }

  test("until stops a greedy loop from absorbing further events") {
    val p = Cep.Pattern.begin[Tick]("low", _.price < 100)
      .followedByOneOrMore("high", _.price >= 100).until(_.price >= 200)
    val ms = run(Seq(
      Tick("UN", 90, ts(0)), Tick("UN", 110, ts(1)), Tick("UN", 120, ts(2)),
      Tick("UN", 210, ts(3))), p)
    assert(ms.size == 1)
    assert(ms.head.steps("high").map(_.price) == Seq(110.0, 120.0))
  }

  // Flink AfterMatchSkipStrategy doc example: pattern a+ b over
  // a1 a2 a3 b. NO_SKIP -> {a1a2a3 b, a2a3 b, a3 b};
  // SKIP_PAST_LAST_EVENT -> {a1a2a3 b}; SKIP_TO_LAST(a) -> {a1a2a3 b, a3 b}.
  val aPlusB: Cep.Pattern[Tick] =
    Cep.Pattern.begin[Tick]("a", _.price < 100).timesOrMore(1)
      .followedBy("b", _.price >= 100)
  val aaab = Seq(
    Tick("K", 90, ts(0)), Tick("K", 91, ts(1)), Tick("K", 92, ts(2)),
    Tick("K", 110, ts(3)))

  test("NO_SKIP emits all overlapping matches") {
    val ms = run(aaab, aPlusB, Cep.SkipStrategy.NoSkip)
    assert(ms.map(_.steps("a").map(_.price)).toSet ==
      Set(Seq(90.0, 91.0, 92.0), Seq(91.0, 92.0), Seq(92.0)))
  }

  test("SKIP_PAST_LAST_EVENT keeps only the earliest match") {
    val ms = run(aaab, aPlusB, Cep.SkipStrategy.SkipPastLastEvent)
    assert(ms.map(_.steps("a").map(_.price)) == Seq(Seq(90.0, 91.0, 92.0)))
  }

  test("SKIP_TO_LAST(a) resumes at the last a of the emitted match") {
    val ms = run(aaab, aPlusB, Cep.SkipStrategy.SkipToLast("a"))
    assert(ms.map(_.steps("a").map(_.price)).toSet ==
      Set(Seq(90.0, 91.0, 92.0), Seq(92.0)))
  }

  test("SKIP_TO_FIRST(a) keeps matches starting at or after the first a") {
    val ms = run(aaab, aPlusB, Cep.SkipStrategy.SkipToFirst("a"))
    assert(ms.size == 3) // first a is the stream head: nothing pruned
  }

  test("within-expired partials surface as timed-out matches (absence detection)") {
    val p = Cep.Pattern.begin[Tick]("low", _.price < 100)
      .followedBy("high", _.price >= 100).within(2000)
    qn += 1
    val name = s"cep_out_$qn"
    val in = MemoryStream[Tick]
    val q = Cep.runWithTimeouts(in.toDS(), p)(_.symbol, _.ts.getTime)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    // 90 starts a partial; no 'high' arrives within 2s -> the event at
    // t=10s expires it and must surface it as a timed-out partial
    in.addData(Tick("W", 90, ts(0)), Tick("W", 95, ts(10)))
    q.processAllAvailable()
    q.stop()
    val rs = spark.table(name).as[Cep.MatchResult[String, Tick]](
      org.apache.spark.sql.Encoders.kryo[Cep.MatchResult[String, Tick]])
      .collect().toSeq
    assert(rs.size == 1 && rs.head.timed_out)
    assert(rs.head.steps("low").map(_.price) == Seq(90.0))
    assert(rs.head.steps("high").isEmpty)
  }

  test("iterative condition sees the partial match so far (IterativeCondition)") {
    // strictly-increasing run: each 'up' must beat the previous 'up'.
    // A context-rejected event closes the greedy loop exactly like a
    // pred-rejected one (Flink: IterativeCondition false == not met).
    val p = Cep.Pattern.begin[Tick]("first", _.price < 100)
      .followedByOneOrMore("up", _.price >= 100)
      .whereCtx((t, ctx) => ctx("up").lastOption.forall(_.price < t.price))
    val ms = run(Seq(
      Tick("I", 90, ts(0)), Tick("I", 110, ts(1)), Tick("I", 120, ts(2)),
      Tick("I", 115, ts(3)), Tick("I", 80, ts(4))), p)
    // 115 >= 100 would extend a context-free b+ — the iterative
    // condition (115 < 120 fails) is what stops the run at [110, 120]
    assert(ms.size == 1)
    assert(ms.head.steps("up").map(_.price) == Seq(110.0, 120.0))
  }

  test("notFollowedBy guard kills the waiting partial (negative pattern)") {
    val p = Cep.Pattern.begin[Tick]("low",
        t => t.price >= 50 && t.price < 100)
      .notFollowedBy("crash", _.price < 50)
      .followedBy("high", _.price >= 100)
    val ok = run(Seq(Tick("N1", 90, ts(0)), Tick("N1", 110, ts(1))), p)
    assert(ok.size == 1)
    // a crash event between low and high poisons the partial
    val bad = run(Seq(
      Tick("N2", 90, ts(0)), Tick("N2", 40, ts(1)), Tick("N2", 110, ts(2))), p)
    assert(bad.isEmpty)
    // a non-crash gap event is fine under relaxed contiguity
    val gap = run(Seq(
      Tick("N3", 90, ts(0)), Tick("N3", 60, ts(1)), Tick("N3", 110, ts(2))), p)
    assert(gap.size == 1)
    assert(gap.head.steps("low").map(_.price) == Seq(90.0))
  }

  test("MATCH_RECOGNIZE quantifier grammar compiles to the step algebra") {
    import graft.streaming.MatchRecognize
    val defs = Map[String, Tick => Boolean](
      "a" -> (_ => true), "b" -> (_ => true), "c" -> (_ => true))
    val p = MatchRecognize.compile[Tick]("a{2,3} b* c??", defs)
    assert(p.steps(0).minTimes == 2 && p.steps(0).maxTimes.contains(3))
    assert(p.steps(0).strict) // first term anchors like begin
    assert(p.steps(1).minTimes == 0 && p.steps(1).maxTimes.isEmpty)
    assert(p.steps(2).minTimes == 0 && p.steps(2).maxTimes.contains(1))
    assert(!p.steps(2).greedy) // ?? = reluctant optional
    val pn = MatchRecognize.compile[Tick]("a{4} b+ c{1,}", defs)
    assert(pn.steps(0).minTimes == 4 && pn.steps(0).maxTimes.contains(4))
    assert(pn.steps(1).minTimes == 1 && pn.steps(1).maxTimes.isEmpty)
    assert(pn.steps(2).minTimes == 1 && pn.steps(2).maxTimes.isEmpty)
  }

  test("MATCH_RECOGNIZE '!name' term compiles to a negative guard") {
    import graft.streaming.MatchRecognize
    val defs = Map[String, Tick => Boolean](
      "low" -> ((t: Tick) => t.price >= 50 && t.price < 100),
      "crash" -> ((t: Tick) => t.price < 50),
      "high" -> ((t: Tick) => t.price >= 100))
    val p = MatchRecognize.compile[Tick]("low !crash high", defs)
    assert(p.steps(1).negated)
    val ok = run(Seq(Tick("G1", 90, ts(0)), Tick("G1", 110, ts(1))), p)
    assert(ok.size == 1)
    val bad = run(Seq(
      Tick("G2", 90, ts(0)), Tick("G2", 40, ts(1)), Tick("G2", 110, ts(2))), p)
    assert(bad.isEmpty)
  }

  test("MATCH_RECOGNIZE terms are strict-contiguous like SQL; relaxed opts out") {
    import graft.streaming.MatchRecognize
    val defs = Map[String, Tick => Boolean](
      "low" -> ((t: Tick) => t.price >= 50 && t.price < 100),
      "high" -> ((t: Tick) => t.price >= 100))
    val strict = MatchRecognize.compile[Tick]("low high", defs)
    // SQL PATTERN (low high) is strict over the partition: a gap event
    // matching neither step breaks the match (CommonExecMatch.java:365
    // chains terms with previousPattern.next)
    def gap(sym: String) = Seq(
      Tick(sym, 90, ts(0)), Tick(sym, 40, ts(1)), Tick(sym, 110, ts(2)))
    assert(run(gap("S1"), strict).isEmpty)
    assert(run(Seq(Tick("S2", 90, ts(0)), Tick("S2", 110, ts(1))),
      strict).size == 1)
    // relaxed = true -> Flink-CEP followedBy (skip over gaps)
    val rel = MatchRecognize.compile[Tick]("low high", defs, relaxed = true)
    assert(run(gap("S3"), rel).size == 1)
  }

  test("within expiry emits the deferred greedy maximal match, not a timeout") {
    // a b+ within 10s: the greedy loop defers emission waiting for more
    // b's; when the window expires the deferred (a, b, b) is a COMPLETE
    // maximal match and must be emitted as one — not silently dropped
    // as a timed-out partial.
    val p = Cep.Pattern.begin[Tick]("a", _.price < 100)
      .followedByOneOrMore("b", _.price >= 100)
      .within(10000)
    val ms = run(Seq(
      Tick("W2", 90, ts(0)), Tick("W2", 110, ts(1)), Tick("W2", 120, ts(2)),
      Tick("W2", 200, ts(20))), p) // 20s: expires the partial
    assert(ms.size == 1)
    assert(ms.head.steps("a").map(_.price) == Seq(90.0))
    assert(ms.head.steps("b").map(_.price) == Seq(110.0, 120.0))
  }

  test("match identity start_seq does not reset across matches of a key") {
    val p = Cep.Pattern.begin[Tick]("a", _.price < 100)
      .next("b", _.price >= 100)
    val ms = run(Seq(
      Tick("I2", 90, ts(0)), Tick("I2", 110, ts(1)),
      Tick("I2", 80, ts(2)), Tick("I2", 120, ts(3))), p)
    assert(ms.size == 2)
    // two matches on one key must have DISTINCT identities even though
    // the first match emptied the partial set in between
    assert(ms.map(_.start_seq).distinct.size == 2)
  }

  test("a strict next step binds only once the relaxed loop has filled") {
    // s, then a relaxed a{2}, then STRICT b. The gap (47) arrives while
    // the a-loop is still below minTimes: the loop's relaxed contiguity
    // owns that gap — b's strictness must not kill the partial yet.
    val p = Cep.Pattern.begin[Tick]("s", _.price < 45)
      .followedBy("a", t => t.price >= 50 && t.price < 100).times(2, 2)
      .next("b", _.price >= 100)
    val ms = run(Seq(
      Tick("F", 40, ts(0)), Tick("F", 60, ts(1)), Tick("F", 47, ts(2)),
      Tick("F", 70, ts(3)), Tick("F", 110, ts(4))), p)
    assert(ms.size == 1)
    assert(ms.head.steps("a").map(_.price) == Seq(60.0, 70.0))
    assert(ms.head.steps("b").map(_.price) == Seq(110.0))
    // but once the loop HAS filled, a gap before the strict b kills it
    val killed = run(Seq(
      Tick("G", 40, ts(0)), Tick("G", 60, ts(1)), Tick("G", 70, ts(2)),
      Tick("G", 47, ts(3)), Tick("G", 110, ts(4))), p)
    assert(killed.isEmpty)
  }

  test("ALL ROWS PER MATCH emits classifier-tagged rows in match order") {
    import graft.streaming.MatchRecognize
    val defs = Map[String, Tick => Boolean](
      "low" -> ((t: Tick) => t.price < 100),
      "high" -> ((t: Tick) => t.price >= 100))
    val p = MatchRecognize.compile[Tick]("low high+", defs)
    // two disjoint matches on one key: (90,110) and (80,120,130)
    val ms = run(Seq(
      Tick("R", 90, ts(0)), Tick("R", 110, ts(1)),
      Tick("R", 80, ts(3)), Tick("R", 120, ts(4)), Tick("R", 130, ts(5)),
      Tick("R", 10, ts(6))), p) // trailing low closes the greedy loop
    assert(ms.size == 2)
    val rows = MatchRecognize.allRowsPerMatch(
      spark.createDataset(ms)(
        org.apache.spark.sql.Encoders.kryo[Cep.Match[String, Tick]]), p)
      .collect().toSeq
    // match identity separates the two matches; classifier tags steps
    val byMatch = rows.groupBy(_.match_start).toSeq.sortBy(_._1)
    assert(byMatch.size == 2)
    val first = byMatch.head._2.sortBy(_.pos)
    assert(first.map(_.classifier) == Seq("low", "high"))
    assert(first.map(_.event.price) == Seq(90.0, 110.0))
    val second = byMatch(1)._2.sortBy(_.pos)
    assert(second.map(_.classifier) == Seq("low", "high", "high"))
    assert(second.map(_.event.price) == Seq(80.0, 120.0, 130.0))
    // ONE ROW PER MATCH measures read directly off the grouped steps
    val m2 = ms.maxBy(_.start_seq)
    assert(m2.steps("high").head.price == 120.0) // FIRST(high)
    assert(m2.steps("high").last.price == 130.0) // LAST(high)
  }

  test("MATCH_RECOGNIZE front end runs the rise-then-fall pattern") {
    import graft.streaming.MatchRecognize
    val defs = Map[String, Tick => Boolean](
      "low" -> ((t: Tick) => t.price < 100),
      "high" -> ((t: Tick) => t.price >= 100),
      "drop" -> ((t: Tick) => t.price < 100))
    val p = MatchRecognize.compile[Tick]("low high+ drop", defs)
    val ms = run(Seq(
      Tick("M", 90, ts(0)), Tick("M", 110, ts(1)), Tick("M", 120, ts(2)),
      Tick("M", 95, ts(3))), p)
    assert(ms.size == 1)
    assert(ms.head.steps("high").map(_.price) == Seq(110.0, 120.0))
    assert(ms.head.steps("drop").map(_.price) == Seq(95.0))
  }

  // ---- NFAITCase ports pinning the two documented NFA deviations ----
  // Event encoding for the Flink c / a / d / b alphabet:
  //   c (start) = price < 20, a (middle) = 50..99, d (gap) = 150,
  //   b (end)   = price >= 200. d matches NOTHING.
  def cadb(sym: String, prices: Double*): Seq[Tick] =
    prices.zipWithIndex.map { case (p, i) => Tick(sym, p, ts(i)) }
  val isC: Tick => Boolean = _.price < 20
  val isA: Tick => Boolean = t => t.price >= 50 && t.price < 100
  val isB: Tick => Boolean = _.price >= 200
  // testOneOrMore input (NFAITCase.java:2971): c d a1 a2 a3 d a4 b
  def oneOrMoreInput(sym: String): Seq[Tick] =
    cadb(sym, 10, 150, 51, 52, 53, 150, 54, 200)

  test("NFAITCase testStrictOneOrMore (2858): consecutive loop closes on gap, " +
      "still reaches a relaxed end") {
    // Flink (non-greedy) emits the prefix set {c a1 b, c a1a2 b, c a1a2a3 b};
    // our greedy loop emits exactly Flink's MAXIMAL match. The d gap after
    // a3 breaks consecutiveness — the loop must CLOSE (never extend to a4)
    // but survive to take the relaxed end, not die. (Input adapted: our
    // strict loop also binds entry contiguity — nextOneOrMore — so the
    // reference's leading d gap is dropped; the gap under test is the
    // one INSIDE the loop.)
    val p = Cep.Pattern.begin[Tick]("start", isC)
      .nextOneOrMore("middle", isA)
      .followedBy("end", isB)
    val ms = run(cadb("SO", 10, 51, 52, 53, 150, 54, 200), p,
      Cep.SkipStrategy.NoSkip)
    assert(ms.size == 1, s"greedy consecutive loop emits the maximal only: $ms")
    assert(ms.head.steps("middle").map(_.price) == Seq(51.0, 52.0, 53.0),
      "a4 must NOT join: consecutiveness broke at the d gap")
    assert(ms.head.steps("end").map(_.price) == Seq(200.0))
  }

  test("NFAITCase testSkipTillNextOneOrMore (2882): relaxed loop skips gaps; " +
      "greedy emits Flink's maximal, not the prefix set") {
    // Flink default (eager, non-greedy) emits 4 prefix matches
    // {c a1 b, c a1a2 b, c a1a2a3 b, c a1a2a3a4 b}; deviation 1 (no
    // skip-this-event/proceed branch) means our greedy loop emits only
    // the maximal — pinned here with the reference-derived expectation.
    val p = Cep.Pattern.begin[Tick]("start", isC)
      .followedByOneOrMore("middle", isA)
      .followedBy("end", isB)
    val ms = run(oneOrMoreInput("SN"), p, Cep.SkipStrategy.NoSkip)
    assert(ms.size == 1)
    assert(ms.head.steps("middle").map(_.price) == Seq(51.0, 52.0, 53.0, 54.0),
      "relaxed loop skips BOTH d gaps and takes a4")
  }

  test("NFAITCase testSkipTillAnyOneOrMore (2914): default flags stay " +
      "maximal-only — subsets need the opt-in allowCombinations") {
    // Flink SKIP_TILL_ANY emits all 8 subsets containing a1 — the
    // `.allowCombinations` port below reproduces that exactly. This
    // test pins the DEFAULT (eager, bounded-state) behavior: without
    // the opt-in, the single maximal match stands in for the family.
    val p = Cep.Pattern.begin[Tick]("start", isC)
      .followedByOneOrMore("middle", isA)
      .followedBy("end", isB)
    val ms = run(oneOrMoreInput("SA"), p, Cep.SkipStrategy.NoSkip)
    assert(ms.map(_.steps("middle").map(_.price)) ==
      Seq(Seq(51.0, 52.0, 53.0, 54.0)),
      "subsets like (a1,a3) must NOT appear — and neither may duplicates")
  }

  test("NFAITCase testEagerZeroOrMore (1014): optional loop taken maximally; " +
      "the skip-the-loop branch is not enumerated") {
    // input c a1 a2 d a3 b; Flink emits {c a1a2a3 b, c a1a2 b, c a1 b, c b}.
    // Ours: the maximal {c a1a2a3 b}. The {c b} variant (loop skipped
    // entirely) is part of the same proceed-branch family (deviation 1).
    val p = Cep.Pattern.begin[Tick]("start", isC)
      .followedByOneOrMore("middle", isA).optional
      .followedBy("end", isB)
    val ms = run(cadb("EZ", 10, 51, 52, 150, 53, 200), p,
      Cep.SkipStrategy.NoSkip)
    assert(ms.size == 1)
    assert(ms.head.steps("middle").map(_.price) == Seq(51.0, 52.0, 53.0))
    // but when NO loop event exists, the optional loop IS skipped:
    val skipped = run(cadb("EZ2", 10, 150, 200), p, Cep.SkipStrategy.NoSkip)
    assert(skipped.size == 1 && skipped.head.steps("middle").isEmpty)
  }

  test("NFAITCase testEndWithOneOrMore (2317): reluctant trailing loop " +
      "reproduces Flink's eager prefix emission exactly") {
    // input c a1 a2 a3; Flink (eager oneOrMore) emits {c a1},
    // {c a1 a2}, {c a1 a2 a3}. A trailing loop grows at the stream
    // head, so our RELUCTANT mode emits completions as it grows —
    // identical output to the reference here (no deviation).
    val p = Cep.Pattern.begin[Tick]("start", isC)
      .followedByOneOrMore("middle", isA).reluctant
    val ms = run(cadb("EO", 10, 51, 52, 53), p, Cep.SkipStrategy.NoSkip)
    assert(ms.map(_.steps("middle").map(_.price)).toSet ==
      Set(Seq(51.0), Seq(51.0, 52.0), Seq(51.0, 52.0, 53.0)))
  }

  test("within-expiry applies the after-match skip strategy to expired " +
      "greedy completables (a+ within w)") {
    // a1 a2 then a much-later event: partials [a1,a2] and [a2] expire
    // together. SkipPastLastEvent must emit ONLY [a1,a2]; the
    // overlapping suffix [a2] is skipped (it surfaces as a timed-out
    // partial, not a match).
    val p = Cep.Pattern.begin[Tick]("a", isA).timesOrMore(1).within(5000)
    val late = Seq(Tick("WX", 51, ts(0)), Tick("WX", 52, ts(1)),
      Tick("WX", 300, ts(60)))
    val ms = run(late, p, Cep.SkipStrategy.SkipPastLastEvent)
    assert(ms.map(_.steps("a").map(_.price)) == Seq(Seq(51.0, 52.0)),
      s"suffix [a2] must be pruned by SkipPastLastEvent, got $ms")
    // NoSkip keeps both expired matches
    val both = run(Seq(Tick("WY", 51, ts(0)), Tick("WY", 52, ts(1)),
      Tick("WY", 300, ts(60))), p, Cep.SkipStrategy.NoSkip)
    assert(both.map(_.steps("a").map(_.price)).toSet ==
      Set(Seq(51.0, 52.0), Seq(52.0)))
    // and runWithTimeouts surfaces the pruned suffix as timed-out
    qn += 1
    val name = s"cep_out_$qn"
    val in = MemoryStream[Tick]
    val q = Cep.runWithTimeouts(in.toDS(), p,
        Cep.SkipStrategy.SkipPastLastEvent)(_.symbol, _.ts.getTime)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    in.addData(Tick("WZ", 51, ts(0)), Tick("WZ", 52, ts(1)),
      Tick("WZ", 300, ts(60)))
    q.processAllAvailable()
    q.stop()
    val rs = spark.table(name).as[Cep.MatchResult[String, Tick]](
      org.apache.spark.sql.Encoders.kryo[Cep.MatchResult[String, Tick]])
      .collect().toSeq
    val (timedOut, matched) = rs.partition(_.timed_out)
    assert(matched.map(_.steps("a").map(_.price)) == Seq(Seq(51.0, 52.0)))
    assert(timedOut.map(_.steps("a").map(_.price)) == Seq(Seq(52.0)))
  }

  test("allowCombinations: loop subsets match Flink SKIP_TILL_ANY " +
      "(NFAITCase testSkipTillAnyOneOrMore:2914, reference-exact)") {
    import CepSpecKinds._
    // c d a1 a2 a3 d a4 b with start(c).followedBy(a+ combinations)
    // .followedBy(b): every subset of the loop events containing a1
    // (loop entry stays eager) — the reference's 8 matches exactly.
    val p = Cep.Pattern.begin[Tick]("start", kindC)
      .followedByOneOrMore("middle", kindA).allowCombinations
      .followedBy("end", kindB)
    val ms = run(Seq(Tick("AC", 31, ts(0)), Tick("AC", 91, ts(1)),
      Tick("AC", 11, ts(2)), Tick("AC", 12, ts(3)), Tick("AC", 13, ts(4)),
      Tick("AC", 92, ts(5)), Tick("AC", 14, ts(6)), Tick("AC", 21, ts(7))),
      p, Cep.SkipStrategy.NoSkip)
    val mids = ms.map(_.steps("middle").map(_.price)).toSet
    assert(mids == Set(
      Seq(11.0), Seq(11.0, 12.0), Seq(11.0, 13.0), Seq(11.0, 14.0),
      Seq(11.0, 12.0, 13.0), Seq(11.0, 12.0, 14.0), Seq(11.0, 13.0, 14.0),
      Seq(11.0, 12.0, 13.0, 14.0)))
    assert(ms.size == 8)
  }

  test("followedByAny binds every later alternative " +
      "(NotPatternITCase testNotNext:46, reference-exact)") {
    import CepSpecKinds._
    // With the any-contiguity middle the reference's SECOND match
    // {a, c2, d} — previously unreachable (deviation 1) — is emitted.
    val p = Cep.Pattern.begin[Tick]("a", kindA)
      .notNext("nb", kindB).followedByAny("c", kindC).followedBy("d", kindD)
    val ms = run(Seq(Tick("FA", 11, ts(0)), Tick("FA", 31, ts(1)),
      Tick("FA", 21, ts(2)), Tick("FA", 32, ts(3)), Tick("FA", 41, ts(4))), p,
      Cep.SkipStrategy.NoSkip)
    assert(ms.map(m =>
      (m.steps("c").map(_.price), m.steps("d").map(_.price))).toSet ==
      Set((Seq(31.0), Seq(41.0)), (Seq(32.0), Seq(41.0))))
  }

  test("NFA state survives a query restart from checkpoint") {
    // run 1 builds a partial match (low + high), the query goes down,
    // the completing drop arrives, and run 2 — restarted from the SAME
    // checkpoint — must finish the match from the RESTORED kryo NFA
    // state (partials + sequence counter through the state store), the
    // contract Flink's CepOperator keeps via its keyed state backend.
    val inDir = java.nio.file.Files.createTempDirectory("graft_cep_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cep_ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_cep_out").toString
    def feed(rows: Tick*): Unit =
      rows.toSeq.toDF().coalesce(1).write.mode("append").parquet(inDir)
    def hop(): Unit = {
      val src = spark.readStream
        .schema("symbol STRING, price DOUBLE, ts TIMESTAMP").parquet(inDir)
        .as[Tick]
      val q = Cep.run(src, riseFall)(_.symbol, _.ts.getTime)
        .map(m => (m.key, m.steps("low").head.price,
          m.steps("high").map(_.price).sum, m.steps("drop").head.price))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(30000); q.stop()
    }
    feed(Tick("RS", 90, ts(0)), Tick("RS", 110, ts(1)))
    hop() // partial match parked in the checkpointed state store
    feed(Tick("RS", 120, ts(2)), Tick("RS", 95, ts(3)))
    hop() // restart: the restored partial absorbs 120 and closes on 95
    val out = spark.read.parquet(outDir)
      .as[(String, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("RS", 90.0, 230.0, 95.0)),
      s"restored partial must carry both highs (110+120), got $out")
  }

  // ---- notNext (strict negation, NotPatternITCase.java ports) ----
  import CepSpecKinds._

  test("notNext: only the immediately-next event can kill " +
      "(NotPatternITCase testNotNext:46)") {
    // a.notNext(b).followedBy(c).followedBy(d) over a c1 b c2 d:
    // c1 (immediate after a) discharges the guard AND binds c; the
    // later b is transparent to the discharged notNext. Reference
    // followedByAny also emits the c2 binding — unreachable here
    // (deviation 1, no skip-this-event branch); the first binding
    // {a, c1, d} is reproduced exactly.
    val p = Cep.Pattern.begin[Tick]("a", kindA)
      .notNext("nb", kindB).followedBy("c", kindC).followedBy("d", kindD)
    val ms = run(Seq(Tick("NN", 11, ts(0)), Tick("NN", 31, ts(1)),
      Tick("NN", 21, ts(2)), Tick("NN", 32, ts(3)), Tick("NN", 41, ts(4))), p)
    assert(ms.map(m => (m.steps("a").map(_.price), m.steps("c").map(_.price),
      m.steps("d").map(_.price))) == Seq((Seq(11.0), Seq(31.0), Seq(41.0))))
  }

  test("notNext kills on the immediate event; notFollowedBy on any gap event " +
      "(NotPatternITCase testNotNextNoMatches:118)") {
    val events = Seq(Tick("NK", 11, ts(0)), Tick("NK", 21, ts(1)),
      Tick("NK", 31, ts(2))) // a b c: b is immediately after a
    val pNext = Cep.Pattern.begin[Tick]("a", kindA)
      .notNext("nb", kindB).followedBy("c", kindC)
    assert(run(events, pNext).isEmpty)
    // gap variant a x b c: notNext discharged by x -> match {a, c};
    // notFollowedBy stays armed -> the later b still kills
    val gap = Seq(Tick("NG", 11, ts(0)), Tick("NG", 91, ts(1)),
      Tick("NG", 21, ts(2)), Tick("NG", 31, ts(3)))
    val viaNext = run(gap, pNext)
    assert(viaNext.map(m => (m.steps("a").map(_.price),
      m.steps("c").map(_.price))) == Seq((Seq(11.0), Seq(31.0))))
    val pFollowed = Cep.Pattern.begin[Tick]("a", kindA)
      .notFollowedBy("nb", kindB).followedBy("c", kindC)
    assert(run(gap, pFollowed).isEmpty)
  }

  test("notNext after oneOrMore: loop's next event is guarded " +
      "(NotPatternITCase testNotNextAfterOneOrMoreSkipTillNext:831)") {
    // a.followedBy(b+).notNext(c).followedBy(d) over a b1 c b2 d:
    // c immediately follows the loop's last event -> the only live
    // interpretation dies; reference expects zero matches for the
    // skip-till-next (eager) variant, which this engine reproduces.
    val p = Cep.Pattern.begin[Tick]("a", kindA)
      .followedByOneOrMore("b", kindB).notNext("nc", kindC).followedBy("d", kindD)
    val ms = run(Seq(Tick("NL", 11, ts(0)), Tick("NL", 21, ts(1)),
      Tick("NL", 31, ts(2)), Tick("NL", 22, ts(3)), Tick("NL", 41, ts(4))), p)
    assert(ms.isEmpty)
    // control: without the c interloper the same shape matches
    val ok = run(Seq(Tick("NM", 11, ts(0)), Tick("NM", 21, ts(1)),
      Tick("NM", 22, ts(3)), Tick("NM", 41, ts(4))), p)
    assert(ok.map(m => (m.steps("b").map(_.price), m.steps("d").map(_.price)))
      == Seq((Seq(21.0, 22.0), Seq(41.0))))
  }

  test("MATCH_RECOGNIZE state retention is explicit-or-derived, never " +
      "silently unbounded (raw Cep.run stays Option-flexible)") {
    import graft.streaming.MatchRecognize
    import graft.streaming.MatchRecognize.StateRetention
    // Auto + within: TTL derived as 2x the window
    assert(MatchRecognize.resolveTtl(StateRetention.Auto, Some(10000L))
      == Some(20000L))
    // Auto without within: REFUSED — nothing bounds a safe TTL
    val e = intercept[IllegalArgumentException] {
      MatchRecognize.resolveTtl(StateRetention.Auto, None)
    }
    assert(e.getMessage.contains("StateRetention"))
    // explicit choices pass through
    assert(MatchRecognize.resolveTtl(StateRetention.Ttl(5000L), None)
      == Some(5000L))
    assert(MatchRecognize.resolveTtl(StateRetention.Unbounded, None).isEmpty)
    // end-to-end: the one-call form with a within window runs under the
    // derived TTL and still matches. The derived TTL arms
    // ProcessingTimeTimeout, which makes shouldRunAnotherBatch
    // always-true — processAllAvailable() would livelock (see the
    // StreamingSpec TTL test) — so drive one AvailableNow hop instead.
    val defs = Map[String, Tick => Boolean](
      "low" -> ((t: Tick) => t.price < 100),
      "high" -> ((t: Tick) => t.price >= 100))
    val in = MemoryStream[Tick]
    in.addData(Tick("MR", 90, ts(0)), Tick("MR", 110, ts(1)))
    val matched = scala.collection.mutable.ArrayBuffer[String]()
    val q = MatchRecognize(in.toDS(), "low high", defs,
        withinMs = Some(60000L))(_.symbol, _.ts.getTime)
      .map(_.key)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[String], _: Long) =>
        matched.synchronized { matched ++= df.collect() }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    q.awaitTermination(60000)
    q.stop()
    assert(matched.toSeq == Seq("MR"))
    // and the one-call form WITHOUT a within window refuses Auto
    intercept[IllegalArgumentException] {
      MatchRecognize(in.toDS(), "low high", defs)(_.symbol, _.ts.getTime)
    }
  }

  test("runBatch materializes ORDER BY per key: a shuffled batch input " +
      "yields the same matches as the time-ordered stream") {
    // events deliberately out of ts order AND interleaved across keys;
    // the batch engine must sort per key before the NFA pass (the
    // batch Match node's explicit sort), sharing the exact engine the
    // streaming tests above pin
    val ordered = Seq(
      Tick("A", 90, ts(0)), Tick("A", 95, ts(1)), Tick("A", 120, ts(2)),
      Tick("A", 80, ts(3)), Tick("B", 85, ts(0)), Tick("B", 130, ts(1)),
      Tick("B", 70, ts(2)), Tick("B", 75, ts(3)), Tick("B", 150, ts(4)))
    val shuffled = Seq(4, 8, 0, 6, 2, 7, 1, 5, 3).map(ordered)
    val pat = Cep.Pattern.begin[Tick]("low", _.price < 100)
      .nextOneOrMore("low", _.price < 100) // low{2,} strict
      .next("high", _.price >= 100)
    val got = Cep.runBatch(shuffled.toDS(), pat)(
        _.symbol, _.ts.getTime, _.price.toLong)
      .collect().map(m => (m.key,
        m.steps("low").map(_.price), m.steps("high").map(_.price)))
      .sortBy(_._1).toSeq
    // A: lows 90,95 then 120; B: only the 70,75 run reaches 150 (the
    // 85 run is broken by 130 arriving after ONE low — min 2 not met)
    assert(got == Seq(
      ("A", Seq(90.0, 95.0), Seq(120.0)),
      ("B", Seq(70.0, 75.0), Seq(150.0))))
  }

  test("runBatch end-of-input flush: a trailing GREEDY loop still open " +
      "at the end of the partition emits its maximal match") {
    // PATTERN (a b+) with greedy b+ on input ending in b's: the loop is
    // deferring (waiting for more b's) when the input ends — SQL batch
    // MATCH_RECOGNIZE emits the maximal match at end-of-input. Before
    // the r13 flush fix this returned nothing (ADVICE r12).
    import CepSpecKinds._
    val in = Seq(Tick("A", 10, ts(0)), Tick("A", 20, ts(1)),
      Tick("A", 21, ts(2)), Tick("A", 22, ts(3)))
    val pat = Cep.Pattern.begin[Tick]("a", kindA)
      .followedByOneOrMore("b", kindB)
    val got = Cep.runBatch(in.toDS(), pat)(_.symbol, _.ts.getTime)
      .collect().map(m => (m.steps("a").map(_.price),
        m.steps("b").map(_.price))).toSeq
    assert(got == Seq((Seq(10.0), Seq(20.0, 21.0, 22.0))))
    // the flush applies the after-match skip strategy across the
    // flushed set: `b+` alone under SkipPastLastEvent emits only the
    // earliest maximal run, suffix partials are pruned not emitted
    val pat2 = Cep.Pattern.begin[Tick]("b", kindB)
      .copy(steps = Vector(Cep.Step[Tick]("b", kindB, maxTimes = None)))
    val got2 = Cep.runBatch(in.toDS(), pat2)(_.symbol, _.ts.getTime)
      .collect().map(_.steps("b").map(_.price)).toSeq
    assert(got2 == Seq(Seq(20.0, 21.0, 22.0)))
    // reluctant form is unaffected by the flush (it already emitted
    // every completion as the loop grew; under the default skip the
    // first completion prunes its own continuation, so use NoSkip to
    // observe all three)
    val gotRel = Cep.runBatch(in.toDS(), pat.reluctant,
        Cep.SkipStrategy.NoSkip)(_.symbol, _.ts.getTime)
      .collect().map(_.steps("b").map(_.price)).sortBy(_.length).toSeq
    assert(gotRel == Seq(Seq(20.0), Seq(20.0, 21.0), Seq(20.0, 21.0, 22.0)))
  }
}
