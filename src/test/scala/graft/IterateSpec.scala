package graft

import graft.ext.Iterate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.ext.Iterate — the bounded-iteration operator behind
  * q_pagerank / q_bfs_levels (reference IterativeStream.java /
  * IterativeDataSet.java; SURVEY §2.13 iterations row).
  */
class IterateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("loop runs exactly N rounds and threads the round number") {
    val sp = spark
    import sp.implicits._
    val init = Seq((1L, 0L), (2L, 0L)).toDF("id", "acc")
    // acc += round each round: after 12 rounds acc = 1+2+...+12 = 78.
    // 12 rounds is past the plan-doubling blowup point an unpinned
    // self-referencing loop hits (~round 10) — completing at all is
    // the lineage-cut guarantee.
    val out = Iterate.loop(init, 12) { (df, r) =>
      df.select($"id", ($"acc" + r).as("acc"))
    }
    assert(out.orderBy("id").collect().map(_.getLong(1)).toSeq ==
      Seq(78L, 78L))
  }

  test("q_bfs_levels: no per-round convergence scan — convergence is " +
      "read off the pin job's Observation (one action per round, the " +
      "ConnectedComponents contract)") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val extraActions = new java.util.concurrent.atomic.AtomicInteger
    val listener = new QueryExecutionListener {
      // the pre-r8 BFS ran an isEmpty join scan per round; any isEmpty
      // (or stray collect) during the query is the regression
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        if (funcName == "isEmpty" || funcName == "collect")
          extraActions.incrementAndGet(): Unit
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val n = SparkEntry.queries("q_bfs_levels")(spark, TestSpark.sf).count()
      assert(n > 0)
      var prev = -1; var cur = extraActions.get()
      while (cur != prev) { prev = cur; Thread.sleep(200); cur = extraActions.get() }
      assert(cur == 0,
        s"BFS ran $cur isEmpty/collect actions — per-round convergence " +
          "scans crept back in")
    } finally spark.listenerManager.unregister(listener)
  }

  test("loop with 0 rounds returns the (pinned) init unchanged") {
    val sp = spark
    import sp.implicits._
    val init = Seq(5L).toDF("v")
    assert(Iterate.loop(init, 0)((df, _) => df.limit(0)).count() == 1)
  }

  test("loopUntil stops at the fixpoint round with converged=true") {
    val sp = spark
    import sp.implicits._
    // v -> min(v+1, 5): fixpoint 5 reached from 1 after 4 improving
    // rounds; detected on the 5th (no change), well under the bound.
    val init = Seq(1L).toDF("v")
    val (out, rounds, converged) = Iterate.loopUntil(init, 50) { (df, _) =>
      df.select(least($"v" + 1L, lit(5L)).as("v"))
    } { (prev, next) =>
      next.as("n").join(prev.as("p"), lit(true))
        .filter($"n.v" =!= $"p.v").isEmpty
    }
    assert(converged)
    assert(rounds == 5, s"expected detection on round 5, got $rounds")
    assert(out.head.getLong(0) == 5L)
  }

  test("superseded rounds release their blocks: only the final pin " +
      "remains registered") {
    val sp = spark
    import sp.implicits._
    val before = sp.sparkContext.getPersistentRDDs.keySet
    val out = Iterate.loop(Seq(1L).toDF("v"), 6) { (df, _) =>
      df.select(($"v" + 1L).as("v"))
    }
    val added = sp.sparkContext.getPersistentRDDs.keySet -- before
    // init pin + 6 round pins ran; 6 were superseded and released
    assert(added.size == 1,
      s"expected exactly the final round's RDD to stay pinned, " +
        s"found ${added.size}")
    assert(out.head.getLong(0) == 7L)
  }

  test("smallSide: broadcast under the threshold, shuffle_hash above " +
      "it (the iterative-join size switch)") {
    val sp = spark
    import sp.implicits._
    val a = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    val b = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "w")
    def planOf(small: org.apache.spark.sql.DataFrame) =
      small.join(b, "id").queryExecution.executedPlan.toString
    // 2 rows × 64 B is far under the default 10 MB threshold
    val smallPlan = planOf(Iterate.smallSide(a, 2))
    assert(smallPlan.contains("BroadcastHashJoin"), smallPlan)
    // an estimate that cannot fit any threshold must switch the hint
    val bigPlan = planOf(Iterate.smallSide(a, Long.MaxValue / 128))
    assert(bigPlan.contains("ShuffledHashJoin"), bigPlan)
    assert(!bigPlan.contains("BroadcastHashJoin"), bigPlan)
    // broadcast disabled entirely (-1) must also take the shuffle path
    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = sp.conf.get(thrKey)
    try {
      sp.conf.set(thrKey, "-1")
      val offPlan = planOf(Iterate.smallSide(a, 2))
      assert(offPlan.contains("ShuffledHashJoin"), offPlan)
    } finally sp.conf.set(thrKey, saved)
  }

  test("q_pagerank is bit-identical under the shuffle_hash regime " +
      "(broadcast disabled): the size switch changes the plan, " +
      "never the answer") {
    val sp = spark
    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = sp.conf.get(thrKey)
    val broadcastRun = SparkEntry.queries("q_pagerank")(sp, TestSpark.sf)
      .collect().map(_.toString).sorted
    val shuffleRun = try {
      sp.conf.set(thrKey, "-1")
      SparkEntry.queries("q_pagerank")(sp, TestSpark.sf)
        .collect().map(_.toString).sorted
    } finally sp.conf.set(thrKey, saved)
    assert(broadcastRun.length > 0)
    assert(broadcastRun.toSeq == shuffleRun.toSeq,
      "rank table differs between broadcast and shuffle_hash regimes")
  }

  test("loopUntil reports converged=false when the bound cuts it off") {
    val sp = spark
    import sp.implicits._
    val init = Seq(0L).toDF("v")
    val (out, rounds, converged) = Iterate.loopUntil(init, 3) { (df, _) =>
      df.select(($"v" + 1L).as("v"))
    } { (_, _) => false }
    assert(!converged && rounds == 3 && out.head.getLong(0) == 3L)
  }
}
