package graft

import graft.ext.Iterate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential property tests for the generic iteration machinery
  * (ext/Iterate.scala — reference IterativeDataSet.java bulk
  * iteration). The GRAPH ALGORITHMS built on it are differentially
  * verified elsewhere (ConnectedComponents vs union-find, r13); what
  * had no randomized adversary is the loop DRIVER itself — the
  * pin/release cycle and the `pinEvery` stride composition, where a
  * bug would be silent and global (every iterative query walks
  * through this code):
  *
  *  - loop: for a round-number-sensitive arithmetic step,
  *    loop(init, rounds, pinEvery) must equal the plain Scala fold of
  *    the same step for EVERY stride — a stride that mis-numbers
  *    rounds (passing the wrong r to a composed step), drops a round
  *    at the rounds/pinEvery remainder boundary, or a pin that alters
  *    results, all break equality; rounds = 0 must return init.
  *  - loopUntil: min-label propagation over a random functional graph
  *    must stop at EXACTLY the first round that changes nothing
  *    (fixpoint round + 1, when the bound allows), return the Scala
  *    fixpoint, and report converged=false (with the bound-th
  *    iterate's exact value) when maxRounds is too small.
  */
class IteratePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = 1000003L

  test("differential: loop(init, rounds, pinEvery) equals the plain " +
      "fold for every stride, round count, and random init") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val init = Vector.fill(40)(
        (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
        .zipWithIndex.map { case ((_, v), id) => (id.toLong, v) }
      val df = init.toDF("id", "v")
      def foldOracle(rounds: Int): Map[Long, Long] =
        (1 to rounds).foldLeft(init.toMap) { (m, r) =>
          m.map { case (id, v) => id -> ((v * 2 + r + id) % P) }
        }
      for (rounds <- Seq(0, 1, 5, 7); pinEvery <- Seq(1, 2, 3)) {
        val out = Iterate.loop(df, rounds, pinEvery) { (pr, r) =>
          pr.select($"id", (($"v" * 2 + lit(r) + $"id") % P).as("v"))
        }
        val got = out.as[(Long, Long)].collect().toMap
        assert(got == foldOracle(rounds),
          s"seed=$seed rounds=$rounds pinEvery=$pinEvery")
        graft.ext.Materialize.release(out)
      }
    }
  }

  test("differential: loopUntil stops at the first unchanged round, " +
      "returns the Scala fixpoint, and reports a too-small bound " +
      "honestly") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 30
      val next = Vector.tabulate(n)(i => rnd.nextInt(n)) // functional graph
      val labels0 = Vector.tabulate(n)(i => (i.toLong, i.toLong))
      val mapDf = next.zipWithIndex
        .map { case (nx, i) => (i.toLong, nx.toLong) }.toDF("id", "nx")
      val df = labels0.toDF("id", "lbl")
      // Scala fold to the fixpoint: lbl' = min(lbl, lbl(next))
      def stepOracle(m: Map[Long, Long]): Map[Long, Long] =
        m.map { case (id, l) => id -> math.min(l, m(next(id.toInt))) }
      var cur = labels0.toMap
      var roundsToFix = 0
      var done = false
      while (!done) {
        val nxt = stepOracle(cur)
        roundsToFix += 1 // the round that OBSERVES no change also runs
        if (nxt == cur) done = true else cur = nxt
      }
      def step(pr: org.apache.spark.sql.DataFrame, r: Int) =
        pr.as("p")
          .join(mapDf.as("m"), col("p.id") === col("m.id"))
          .join(pr.as("q"), col("m.nx") === col("q.id"))
          .select(col("p.id").as("id"),
            least(col("p.lbl"), col("q.lbl")).as("lbl"))
      def conv(a: org.apache.spark.sql.DataFrame,
          b: org.apache.spark.sql.DataFrame) =
        b.exceptAll(a).isEmpty
      val (res, ran, converged) = Iterate.loopUntil(df, 50)(step)(conv)
      assert(converged, s"seed=$seed: 50 rounds must suffice for n=30")
      assert(ran == roundsToFix,
        s"seed=$seed: ran $ran rounds, fixpoint observed at $roundsToFix")
      assert(res.as[(Long, Long)].collect().toMap == cur, s"seed=$seed")
      graft.ext.Materialize.release(res)
      // a bound one short of the fixpoint round must report false and
      // return exactly the bound-th iterate
      if (roundsToFix > 1) {
        val shortBound = roundsToFix - 1
        val (res2, ran2, conv2) = Iterate.loopUntil(df, shortBound)(step)(conv)
        val wantShort = (1 to shortBound)
          .foldLeft(labels0.toMap)((m, _) => stepOracle(m))
        assert(!conv2 && ran2 == shortBound, s"seed=$seed short bound")
        assert(res2.as[(Long, Long)].collect().toMap == wantShort,
          s"seed=$seed short-bound iterate value")
        graft.ext.Materialize.release(res2)
      }
    }
  }
}
