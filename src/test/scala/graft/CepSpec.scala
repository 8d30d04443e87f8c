package graft

import graft.streaming.Cep
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

case class Tick(symbol: String, price: Double, ts: Timestamp)

/** CEP-lite tests mirroring Flink's rise-then-fall MATCH_RECOGNIZE
  * ITCases (reference MatchRecognizeITCase.scala, NFAITCase.java). */
class CepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  def ts(sec: Int): Timestamp = new Timestamp(1700000000000L + sec * 1000L)

  private var qn = 0
  def run(ticks: Seq[Tick], pattern: Cep.Pattern[Tick]): Seq[Cep.Match[String, Tick]] = {
    qn += 1
    val name = s"cep_out_$qn"
    val in = MemoryStream[Tick]
    val q = Cep.run(in.toDS(), pattern)(_.symbol, _.ts.getTime)
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
}
