package graft.operators

import graft.{QueryPack, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rank / Top-N / deduplication specialties (SURVEY.md §2.7):
  * per-key Top-N, keep-first/keep-last dedup, window Top-N, window dedup.
  *
  * Reference: StreamExecRank.java:83 + AppendOnlyTopNFunction.java:52,
  * StreamExecDeduplicate.java:85 + ProcTimeDeduplicateKeep*RowFunction,
  * StreamExecWindowRank.java:77, StreamExecWindowDeduplicate.java:69.
  *
  * Batch form = the ROW_NUMBER()=1/<=N pattern those exec nodes are
  * planner-recognized from; Catalyst 4.x turns the filter into
  * WindowGroupLimit (per-map-task top-N before shuffle) — the property
  * that keeps these viable at 100 TB.
  */
object RankDedupPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Top-3 suppliers per nation by balance.
    "q_topn" -> ((s, d) => {
      import s.implicits._
      TopN(T.supplier(s, d), Seq($"s_nationkey"),
          Seq($"s_acctbal".desc, $"s_suppkey".asc), 3)
        .select($"s_nationkey", $"s_suppkey", $"s_acctbal", $"rank_no")
    }),

    // Keep-first dedup: earliest event per user.
    "q_dedup_first" -> ((s, d) => {
      import s.implicits._
      Dedup.keepFirst(T.events(s, d), Seq($"user_id"), Seq($"ts", $"event_id"))
        .select($"user_id", $"event_id", $"event_type", $"value")
    }),

    // Keep-last dedup: latest event per user.
    "q_dedup_last" -> ((s, d) => {
      import s.implicits._
      Dedup.keepLast(T.events(s, d), Seq($"user_id"), Seq($"ts", $"event_id"))
        .select($"user_id", $"event_id", $"event_type", $"value")
    }),

    // Window Top-N: top-2 users by event volume within each 1h window.
    "q_window_topn" -> ((s, d) => {
      import s.implicits._
      val perUser = WindowOps.tumble(T.events(s, d), $"ts", "1 hour")
        .groupBy($"window_start", $"user_id")
        .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      TopN(perUser, Seq($"window_start"),
          Seq($"n".desc, $"sum_value".desc, $"user_id".asc), 2)
        .select($"window_start", $"user_id", $"n", $"sum_value", $"rank_no")
    }),

    // Window dedup: first event per (user, 1h window).
    "q_window_dedup" -> ((s, d) => {
      import s.implicits._
      Dedup.keepFirst(WindowOps.tumble(T.events(s, d), $"ts", "1 hour"),
          Seq($"user_id", $"window_start"), Seq($"ts", $"event_id"))
        .select($"user_id", $"window_start", $"event_id", $"event_type")
    })
  )

  def oracle: Map[String, String] = Map(
    "q_topn" ->
      """SELECT s_nationkey, s_suppkey, s_acctbal, rank_no FROM (
           SELECT s_nationkey, s_suppkey, s_acctbal,
                  row_number() OVER (PARTITION BY s_nationkey
                    ORDER BY s_acctbal DESC, s_suppkey ASC) AS rank_no
           FROM supplier) WHERE rank_no <= 3""",
    "q_dedup_first" ->
      """SELECT user_id, event_id, event_type, value FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY ts ASC, event_id ASC) AS rn
           FROM events) WHERE rn = 1""",
    "q_dedup_last" ->
      """SELECT user_id, event_id, event_type, value FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1""",
    "q_window_topn" ->
      """WITH per_user AS (
           SELECT make_timestamp(CAST(floor(epoch(ts)/3600)*3600 AS BIGINT)*1000000) AS window_start,
                  user_id, count(*) AS n, sum(value) AS sum_value
           FROM events GROUP BY 1, 2
         )
         SELECT window_start, user_id, n, sum_value, rank_no FROM (
           SELECT *, row_number() OVER (PARTITION BY window_start
                    ORDER BY n DESC, sum_value DESC, user_id ASC) AS rank_no
           FROM per_user) WHERE rank_no <= 2""",
    "q_window_dedup" ->
      """SELECT user_id, window_start, event_id, event_type FROM (
           SELECT user_id,
                  make_timestamp(CAST(floor(epoch(ts)/3600)*3600 AS BIGINT)*1000000) AS window_start,
                  event_id, event_type,
                  row_number() OVER (PARTITION BY user_id,
                    make_timestamp(CAST(floor(epoch(ts)/3600)*3600 AS BIGINT)*1000000)
                    ORDER BY ts ASC, event_id ASC) AS rn
           FROM events) WHERE rn = 1"""
  )
}
