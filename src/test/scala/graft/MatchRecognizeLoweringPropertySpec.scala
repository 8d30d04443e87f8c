package graft

import graft.streaming.{Cep, MatchRecognize}
import org.scalatest.funsuite.AnyFunSuite

/** Differential property test for the MATCH_RECOGNIZE pattern-string
  * lowering (streaming/MatchRecognize.scala `compile` — reference
  * CommonExecMatch.java:365, the Calcite-RexNode→Pattern translation).
  * The CEP engine underneath is already differentially verified on
  * ARBITRARY Step vectors (CepPropertySpec's brute-force oracle), so
  * the one link the randomized program hadn't covered is the parser:
  * quantifier-string munging (`+?` vs `??` vs `{n,}?`), negation,
  * first-step anchoring, relaxed chaining.
  *
  * Property: generate the pattern AST first (random per-term
  * quantifier semantics as (min, max, greedy) plus negation), RENDER
  * it to the grammar's surface syntax, and `compile` must return
  * exactly the Step vector the documented lowering rules prescribe —
  * i.e. compile ∘ render = id over the AST space. The expected vector
  * is built directly from the AST fields (no string handling), so the
  * two sides share no code: a parser bug (e.g. `{2}?` read as greedy,
  * or `??` read as reluctant ONE-or-more) breaks equality. Step
  * equality is structural; predicate fields compare by reference and
  * both sides draw the same function instances from `defs`, so the
  * comparison is exact, not vacuous.
  */
class MatchRecognizeLoweringPropertySpec extends AnyFunSuite {

  private case class Ev(c: String)

  /** Shared predicate instances — reference equality across both sides. */
  private val names = Vector("a", "b", "cc", "d_2", "Up1")
  private val defs: Map[String, Ev => Boolean] =
    names.map(n => n -> ((e: Ev) => e.c == n)).toMap

  /** One term of the AST: semantics first, syntax derived. */
  private case class Term(name: String, min: Int, max: Option[Int],
      greedy: Boolean, negated: Boolean)

  private def genTerm(rnd: scala.util.Random): Term = {
    val name = names(rnd.nextInt(names.length))
    if (rnd.nextInt(100) < 15) Term(name, 0, Some(0), greedy = true,
      negated = true)
    else {
      val greedy = rnd.nextBoolean()
      rnd.nextInt(7) match {
        case 0 => Term(name, 1, Some(1), greedy = true, negated = false)
        case 1 => Term(name, 0, Some(1), greedy, negated = false)
        case 2 => Term(name, 1, None, greedy, negated = false)
        case 3 => Term(name, 0, None, greedy, negated = false)
        case 4 => val n = rnd.nextInt(4)
          // (1,1) renders as a bare name, which cannot spell reluctant
          Term(name, n, Some(n), greedy = greedy || n == 1, negated = false)
        case 5 => val n = rnd.nextInt(4)
          Term(name, n, None, greedy, negated = false)
        case _ => val n = rnd.nextInt(3); val m = n + 1 + rnd.nextInt(3)
          Term(name, n, Some(m), greedy, negated = false)
      }
    }
  }

  /** Surface syntax for a term, per the grammar in the scaladoc. */
  private def render(t: Term): String =
    if (t.negated) s"!${t.name}"
    else {
      val quant = (t.min, t.max) match {
        case (1, Some(1)) => ""
        case (0, Some(1)) => "?"
        case (1, None) => "+"
        case (0, None) => "*"
        case (n, Some(m)) if n == m => s"{$n}"
        case (n, None) => s"{$n,}"
        case (n, Some(m)) => s"{$n,$m}"
      }
      // reluctant suffix only where a quantifier exists to modify
      t.name + quant + (if (!t.greedy && quant.nonEmpty) "?" else "")
    }

  /** The documented lowering, straight from the AST (no strings). */
  private def expected(ast: Vector[Term], relaxed: Boolean,
      withinMs: Option[Long]): Cep.Pattern[Ev] = {
    val steps = ast.map { t =>
      if (t.negated)
        Cep.Step[Ev](t.name, defs(t.name), minTimes = 0, maxTimes = Some(0),
          negated = true)
      else
        Cep.Step[Ev](t.name, defs(t.name), minTimes = t.min, maxTimes = t.max,
          strict = !relaxed, greedy = t.greedy)
    }
    Cep.Pattern(steps.updated(0, steps.head.copy(strict = true)), withinMs)
  }

  test("round-trip: compile(render(ast)) == documented lowering for " +
      "300 random ASTs, strict and relaxed, with and without within") {
    val seen = scala.collection.mutable.Set[String]()
    var reluctant = 0; var negated = 0; var braces = 0
    (1 to 300).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val ast = Vector.fill(1 + rnd.nextInt(6))(genTerm(rnd))
      val relaxed = rnd.nextBoolean()
      val withinMs = if (rnd.nextBoolean()) Some(1000L + rnd.nextInt(9000))
        else None
      // random 1..2-space separators: the splitter must not care
      val str = ast.map(render).mkString(" " * (1 + rnd.nextInt(2)))
      val got = MatchRecognize.compile[Ev](str, defs, withinMs, relaxed)
      assert(got == expected(ast, relaxed, withinMs),
        s"seed=$seed pattern='$str' relaxed=$relaxed\n" +
          s"got=${got.steps}\nwant=${expected(ast, relaxed, withinMs).steps}")
      seen += str
      reluctant += ast.count(t => !t.greedy && !t.negated &&
        (t.min, t.max) != ((1, Some(1))))
      negated += ast.count(_.negated)
      braces += ast.count(t => !t.negated && render(t).contains("{"))
    }
    // the draw space actually exercised the hard corners
    assert(seen.size >= 250, s"only ${seen.size} distinct patterns")
    assert(reluctant >= 100, s"only $reluctant reluctant terms")
    assert(negated >= 100, s"only $negated negated terms")
    assert(braces >= 100, s"only $braces brace quantifiers")
  }

  test("the grammar's near-miss strings are rejected, not misparsed") {
    def bad(p: String): Unit =
      intercept[IllegalArgumentException] {
        MatchRecognize.compile[Ev](p, defs); ()
      }
    bad("a undefined_name b") // DEFINE missing → error, not silent skip
    bad("a b{2,1x}")          // malformed brace body
    bad("a 1bad")             // name can't start with a digit
    bad("")                   // empty pattern
  }

  test("reluctant-vs-optional disambiguation pins: '?' '??' '+?' " +
      "'{2}?' mean what SQL says") {
    def one(p: String): Cep.Step[Ev] =
      MatchRecognize.compile[Ev](s"a $p", defs).steps(1)
    assert(one("b?") == Cep.Step[Ev]("b", defs("b"), 0, Some(1),
      strict = true, greedy = true), "b? is GREEDY optional")
    assert(one("b??") == Cep.Step[Ev]("b", defs("b"), 0, Some(1),
      strict = true, greedy = false), "b?? is RELUCTANT optional")
    assert(one("b+?") == Cep.Step[Ev]("b", defs("b"), 1, None,
      strict = true, greedy = false), "b+? is RELUCTANT one-or-more")
    assert(one("b{2}?") == Cep.Step[Ev]("b", defs("b"), 2, Some(2),
      strict = true, greedy = false), "b{2}? parses (exact count)")
  }
}
