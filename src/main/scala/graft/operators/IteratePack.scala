package graft.operators

import graft.{QueryPack, Tables => T}
import graft.ext.{Iterate, Materialize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative dataflow (SURVEY.md §2.13 iterations row; reference
  * flink-streaming-java .../api/datastream/IterativeStream.java,
  * flink-java .../operators/IterativeDataSet.java — previously the one
  * declared-out-of-scope §2.13 row; graft.ext.Iterate closes it).
  *
  * Both queries run on the bipartite part<->supplier graph read
  * straight off lineitem (suppliers offset by +100000 so the id
  * spaces cannot collide), symmetrized so every node has in- and
  * out-edges — one scan, one distinct, no join, so the per-run cost
  * is the iteration itself, not graph construction. All iteration
  * arithmetic is INTEGER (micro-rank units, floor division) so Spark
  * and the DuckDB recursive-CTE oracle agree bit-for-bit — float
  * PageRank would hash-diverge on summation order.
  *
  * Scale shape — the big side never moves: the edge table is built
  * and pinned ONCE, and each round hints the rank/distance table as
  * the SMALL join side via [[Iterate.smallSide]] (rank rows = one per
  * node, orders of magnitude smaller than edges): while the node
  * count × 64 B fits `spark.sql.autoBroadcastJoinThreshold` it is
  * BROADCAST, so the edges are streamed in place with map-side
  * partial aggregation and the only per-round shuffle is the reduced
  * per-node contribution table — the algorithm's intrinsic data
  * movement. (A pinned frame re-enters the plan as a bare RDD scan
  * with NO partitioning metadata, so a co-partitioned shuffle join
  * would re-exchange the full edge table every round — measured, not
  * guessed: the broadcast form cuts per-round cost ~3x.) On a graph
  * whose NODE table outgrows the threshold (billions of nodes) the
  * hint switches AUTOMATICALLY to shuffle_hash — per-round edge
  * exchange instead of a driver OOM, the same regime the reference
  * runs bulk iterations in (IterativeDataSet.java solves on the
  * shuffle plane). The node count is computed once per query and is
  * a constant (PageRank) or conservative (BFS frontier ≤ nodes)
  * upper bound for every round.
  */
object IteratePack extends QueryPack {

  /** One bound for BOTH the Spark loopUntil and the oracle's recursive
    * CTE — a graph whose seed eccentricity exceeds it fails the Spark
    * convergence require() loudly instead of silently diverging from a
    * shorter-bounded oracle walk. */
  private val MaxHops = 20

  /** Symmetric (src, dst) edges, distinct, pinned; both endpoints
    * BIGINT. */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val fwd = Materialize.pin(T.lineitem(s, d)
      .select(col("l_partkey").as("src"),
        (col("l_suppkey") + 100000L).as("dst"))
      .distinct())
    // directions live in disjoint id ranges, so the union stays distinct
    val sym = Materialize.pin(
      fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst"))))
    Materialize.release(fwd) // folded into sym; never evaluated again
    sym
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Integer PageRank, 10 fixed power-iteration rounds (damping 0.85
    // as the exact rational 17/20). rank'(v) = 150000 +
    // (17 * sum_{u->v} (rank(u) div deg(u))) div 20, all BIGINT.
    "q_pagerank" -> ((s, d) => {
      val e = edges(s, d)
      val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
      // out-degree fused onto each edge once, so rounds never join deg
      val ewd = Materialize.pin(e.join(deg, "src"))
      val nodes = e.select(col("src").as("id")).distinct()
      // one count job; constant across rounds (rank rows = nodes)
      val nNodes = nodes.count()
      val init = nodes.withColumn("rank_micro", lit(1000000L))
      // pinEvery=2: each materialization job covers two power-iteration
      // steps (the rank frame enters each step once, so plan depth is
      // linear in the stride) — half the pin-job overhead. Stride 5
      // was A/B-probed r16 (2.76 vs 2.85 s clean mins, within the
      // run-to-run noise band): pin-job latency is NOT the remaining
      // bottleneck, so the shallower, easier-to-debug plan stays.
      // alias-qualified join: with pinEvery>1 a later composed step
      // re-joins ewd against a frame already derived from ewd, which
      // dataset-id column references would flag as an ambiguous
      // self-join
      val out = Iterate.loop(init, 10, pinEvery = 2) { (pr, _) =>
        Iterate.smallSide(pr.as("p"), nNodes)
          .join(ewd.as("w"), col("p.id") === col("w.src"))
          .select(col("w.dst").as("id"),
            expr("p.rank_micro div w.d").as("c"))
          .groupBy("id").agg(sum("c").as("contrib"))
          .select(col("id"),
            (lit(150000L) + expr("(17 * contrib) div 20"))
              .as("rank_micro"))
      }
      // every round already ran eagerly; the returned frame is a
      // self-contained pin, so the graph scaffolding can go now
      Materialize.release(e); Materialize.release(ewd)
      out
    }),

    // BFS hop levels from the minimum node id, run to CONVERGENCE via
    // loopUntil (the DataSet-iteration convergence-criterion path):
    // a round that improves no distance ends the loop. Convergence is
    // observed DURING the round's pin job via Dataset.observe — the
    // same one-action-per-round contract as ConnectedComponents (the
    // pre-r8 prev-vs-next join scan doubled per-round job count).
    "q_bfs_levels" -> ((s, d) => {
      val e = edges(s, d)
      val nodes = e.select(col("src").as("id")).distinct()
      val nNodes = nodes.count() // frontier ≤ nodes every round
      val seed = nodes.agg(min("id").as("seed_id"))
      val init = nodes
        .join(broadcast(seed), nodes("id") === seed("seed_id"), "left")
        .select(col("id"),
          when(col("seed_id").isNotNull, 0L).cast("long").as("dist"))
      var obs: org.apache.spark.sql.Observation = null
      val (out, _, converged) = Iterate.loopUntil(init, MaxHops) { (cur, r) =>
        val prop = Iterate
          .smallSide(cur.filter(col("dist").isNotNull), nNodes)
          .join(e, cur("id") === e("src"))
          .select(e("dst").as("id"), (col("dist") + 1L).as("nd"))
          .groupBy("id").agg(min("nd").as("nd"))
        obs = org.apache.spark.sql.Observation(s"bfs_round_$r")
        cur.join(prop, Seq("id"), "left")
          .select(col("id"), col("dist").as("prev_dist"),
            least(col("dist"), col("nd")).as("dist"))
          .observe(obs, coalesce(
            sum(when(!(col("dist") <=> col("prev_dist")), 1L)
              .otherwise(0L)), lit(0L)).as("improved"))
          .select(col("id"), col("dist"))
      } { (_, _) =>
        obs.get("improved").asInstanceOf[Long] == 0L
      }
      require(converged, "BFS did not converge within the round bound")
      Materialize.release(e)
      out
    })
  )

  def oracle: Map[String, String] = Map(
    "q_pagerank" ->
      """WITH RECURSIVE
         fwd AS (
           SELECT DISTINCT l_partkey AS src, l_suppkey + 100000 AS dst
           FROM lineitem),
         edges AS (
           SELECT src, dst FROM fwd
           UNION ALL SELECT dst, src FROM fwd),
         deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
         nodes AS (SELECT DISTINCT src AS id FROM edges),
         pr AS (
           SELECT 0 AS iter, id, CAST(1000000 AS BIGINT) AS rank_micro
           FROM nodes
           UNION ALL
           SELECT pr.iter + 1, e.dst AS id,
                  CAST(150000 + (17 * SUM(pr.rank_micro // d.d)) // 20
                       AS BIGINT)
           FROM pr JOIN edges e ON pr.id = e.src
                   JOIN deg d ON d.src = pr.id
           WHERE pr.iter < 10
           GROUP BY pr.iter, e.dst)
         SELECT id, rank_micro FROM pr WHERE iter = 10""",
    "q_bfs_levels" ->
      s"""WITH RECURSIVE
         fwd AS (
           SELECT DISTINCT l_partkey AS src, l_suppkey + 100000 AS dst
           FROM lineitem),
         edges AS (
           SELECT src, dst FROM fwd
           UNION ALL SELECT dst, src FROM fwd),
         nodes AS (SELECT DISTINCT src AS id FROM edges),
         walk AS (
           SELECT id, CAST(0 AS BIGINT) AS dist
           FROM (SELECT MIN(id) AS id FROM nodes)
           UNION
           SELECT e.dst AS id, w.dist + 1 AS dist
           FROM walk w JOIN edges e ON w.id = e.src
           WHERE w.dist < $MaxHops)
         SELECT n.id, MIN(w.dist) AS dist
         FROM nodes n LEFT JOIN walk w ON n.id = w.id
         GROUP BY n.id"""
  )
}
