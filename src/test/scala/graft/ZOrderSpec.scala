package graft

import graft.ext.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout (ext/ZOrder.scala): bit-level correctness of the
  * Morton interleave and the property the operator exists for —
  * contiguous z-ranges are small RECTANGLES in (a, b) space, so a
  * range-partitioned-by-z layout prunes on BOTH filter columns. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mortonRef(a: Int, b: Int): Long = {
    // bit-by-bit reference implementation, independent of the
    // mask-shift cascade under test
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((a >> i) & 1).toLong << (2 * i)
      z |= ((b >> i) & 1).toLong << (2 * i + 1)
    }
    z
  }

  test("interleave16 matches the bit-by-bit reference on boundary and " +
      "random values") {
    val rnd = new scala.util.Random(42)
    val cases = Seq((0, 0), (65535, 65535), (65535, 0), (0, 65535),
      (1, 2), (21845, 43690)) ++
      Seq.fill(50)((rnd.nextInt(65536), rnd.nextInt(65536)))
    val got = cases.toDF("a", "b")
      .select($"a", $"b",
        ZOrder.interleave16($"a".cast("long"), $"b".cast("long")).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) == mortonRef(a, b), s"($a, $b)")
    }
  }

  test("quantize: monotone, hits both endpoints, degenerate range -> 0") {
    val df = Seq(0L, 250L, 500L, 750L, 1000L).toDF("x")
    val q = df.select(ZOrder.quantize($"x", lit(0L), lit(1000L)).as("q"))
      .as[Long].collect().toSeq
    assert(q == q.sorted, s"not monotone: $q")
    assert(q.head == 0L && q.last == 65535L, q.toString)
    val degenerate = df
      .select(ZOrder.quantize($"x", lit(7L), lit(7L)).as("q"))
      .as[Long].collect().toSet
    assert(degenerate == Set(0L))
  }

  test("cluster: contiguous z-partitions are rectangles — a 2-dim box " +
      "filter touches few partitions, vs ALL partitions under the " +
      "unclustered layout (the pruning the operator exists for)") {
    val n = 20000
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(n)((rnd.nextInt(100000).toLong,
      rnd.nextInt(100000).toLong)).toDF("a", "b")
    val parts = 16
    def touched(df: org.apache.spark.sql.DataFrame): Long = df
      .select(spark_partition_id().as("pid"), $"a", $"b")
      .groupBy($"pid")
      .agg(min($"a").as("amin"), max($"a").as("amax"),
        min($"b").as("bmin"), max($"b").as("bmax"))
      // the query box: a in [40k, 50k) AND b in [40k, 50k) — a
      // partition whose (min,max) rectangle intersects it must be read
      .filter($"amax" >= 40000L && $"amin" < 50000L &&
        $"bmax" >= 40000L && $"bmin" < 50000L)
      .count()
    val clustered = touched(ZOrder.cluster(pts, "a", "b", parts))
    val unclustered = touched(pts.repartition(parts)) // round-robin
    assert(unclustered == parts.toLong,
      s"round-robin layout should straddle the box in every partition, " +
        s"got $unclustered/$parts")
    // a 10% x 10% box covers ~1% of the z-curve; with 16 coarse
    // partitions the curve passes through the box in at most a few
    // contiguous runs — 4 of 16 is already a 4x scan cut, typical
    // observed is 1-3
    assert(clustered <= 4,
      s"z-clustered layout should touch <=4/$parts partitions, " +
        s"got $clustered")
  }

  test("q_zorder plans shuffle-free: bounds broadcast as a single-row " +
      "join, z-value is per-row arithmetic on the fact scan") {
    val p = SparkEntry.queries("q_zorder")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"),
      s"bounds must broadcast as one row:\n$p")
    // the z-value computation must never REQUIRE a shuffle: the only
    // admissible hash exchange is the deliberate, size-gated scan
    // fan-out (REPARTITION_BY_NUM — graft.ext.FanOut, r16), which
    // vanishes at scale and under its kill switch. A hash exchange the
    // PLANNER inserted (ENSURE_REQUIREMENTS) would mean the per-row
    // arithmetic regressed into a keyed operation.
    assert("Exchange hashpartitioning[^\\n]*ENSURE_REQUIREMENTS".r
        .findAllIn(p).isEmpty,
      s"per-row z-value must not hash-shuffle the fact:\n$p")
    spark.conf.set(graft.ext.FanOut.EnabledConf, "false")
    try {
      val unfanned = SparkEntry.queries("q_zorder")(spark, TestSpark.sf)
        .queryExecution.executedPlan.toString
      assert("Exchange hash".r.findAllIn(unfanned).isEmpty,
        s"fan-out off: the plan must be hash-shuffle-free:\n$unfanned")
    } finally spark.conf.unset(graft.ext.FanOut.EnabledConf)
  }
}
