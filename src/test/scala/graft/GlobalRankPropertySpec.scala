package graft

import graft.ext.GlobalRank
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Differential property test for the two-phase distributed global
  * ranking (ext/GlobalRank.scala — the scale-safe form of
  * `rank() OVER (ORDER BY key)`; reference analog
  * BinaryExternalSorter.java:69 range-partition + sequential scan).
  * The operator is golden-plan-pinned and oracle-gated on the star
  * (`q_global_rank`, `q_global_rank_ties`), but those fix one data
  * shape; this differential drives random tie-heavy inputs through
  * random (k, partitions) configurations against the definitional
  * oracle computed by counting in plain Scala:
  *
  *   rank_g(v)       = 1 + #{v' < v}              (tie-exact)
  *   dense_rank_g(v) = 1 + #{distinct v' < v}     (tie-exact)
  *   cume_dist_e6(v) = #{v' ≤ v} * 1e6 div total
  *   percent_rank_e6 = (rank_g - 1) * 1e6 div (total - 1), 0 if n ≤ 1
  *
  * and, for the documented tie-UNSTABLE outputs, their invariants
  * rather than values: rn must be a permutation of 1..n that never
  * inverts the key order (key-sorted ⇒ rn-sorted), and ntile_k must
  * equal the exact SQL bucket formula applied to the emitted rn
  * (first total%k buckets take ceil(total/k) rows). Partition counts
  * 3 and 8 force key groups near range boundaries across draws — the
  * tie-exactness claim under test is precisely that a key group never
  * straddles one. */
class GlobalRankPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("differential: rank/dense/cume/pct match the counting oracle " +
      "and rn/ntile satisfy their invariants across random tie-heavy " +
      "draws x (k, partitions) configs") {
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 60 + rnd.nextInt(140)
      val vs = Vector.fill(n)(rnd.nextInt(20).toLong)
      val k = 1 + rnd.nextInt(7)
      val parts = Seq(0, 3, 8)(rnd.nextInt(3))
      val df = vs.zipWithIndex.map { case (v, id) => (id.toLong, v) }
        .toDF("id", "v")
      val got = GlobalRank.rank(spark, df, col("v"), k, parts)
        .select($"id", $"v", $"rn", $"rank_g", $"dense_rank_g",
          $"ntile_k", $"cume_dist_e6", $"percent_rank_e6")
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toVector
      assert(got.size == n, s"seed=$seed: lost rows")
      val sorted = vs.sorted
      val distinctSorted = vs.distinct.sorted
      val total = n.toLong
      got.foreach { case (id, v, rn, rk, dr, nt, cd, pr) =>
        val below = sorted.count(_ < v).toLong
        val atOrBelow = sorted.count(_ <= v).toLong
        assert(rk == below + 1, s"seed=$seed id=$id rank_g")
        assert(dr == distinctSorted.count(_ < v) + 1,
          s"seed=$seed id=$id dense_rank_g")
        assert(cd == atOrBelow * 1000000L / total,
          s"seed=$seed id=$id cume_dist_e6")
        assert(pr == (if (total <= 1) 0L
          else (rk - 1) * 1000000L / (total - 1)),
          s"seed=$seed id=$id percent_rank_e6")
        // exact SQL ntile over the emitted rn
        val q = total / k; val m = total % k
        val want =
          if (q == 0) rn
          else if (rn - 1 < (q + 1) * m) (rn - 1) / (q + 1) + 1
          else (rn - 1 - m) / q + 1
        assert(nt == want, s"seed=$seed id=$id ntile_k")
      }
      // rn: a permutation of 1..n that respects the key order
      val byRn = got.sortBy(_._3)
      assert(byRn.map(_._3) == (1L to total).toVector,
        s"seed=$seed rn is not a permutation of 1..$n")
      assert(byRn.map(_._2) == sorted,
        s"seed=$seed rn order inverts the key order somewhere")
    }
  }
}
