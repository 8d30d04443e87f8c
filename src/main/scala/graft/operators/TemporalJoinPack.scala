package graft.operators

import graft.{QueryPack, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-conditioned joins (SURVEY.md §2.3): interval join, temporal
  * as-of join, lookup join.
  *
  * Reference: StreamExecIntervalJoin.java:82 / TimeIntervalJoin.java,
  * StreamExecTemporalJoin.java:77 / TemporalRowTimeJoinOperator.java:78,
  * StreamExecLookupJoin.java:56.
  *
  * Batch forms here (oracle-checked); the streaming interval join uses
  * the identical condition in a stream-stream join (see graft.streaming).
  * The as-of join goes through the union-merge AsOfJoin operator — one
  * shuffle, no range explosion (see AsOfJoin scaladoc).
  */
object TemporalJoinPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Interval join: clicks within 30 min before each purchase, per user.
    "q_interval_join" -> ((s, d) => {
      import s.implicits._
      val e = T.events(s, d)
      val p = e.filter($"event_type" === "purchase").select(
        $"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id".as("purchase_id"))
      val c = e.filter($"event_type" === "click").select(
        $"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("click_id"))
      p.join(c, $"p_user" === $"c_user" &&
          $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES") &&
          $"c_ts" <= $"p_ts")
        .select($"purchase_id", $"click_id")
    }),

    // Temporal as-of join: the latest view before each purchase, per user.
    "q_asof_join" -> ((s, d) => {
      import s.implicits._
      val e = T.events(s, d)
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id".as("purchase_id"))
      val views = e.filter($"event_type" === "view")
        .select($"user_id", $"ts".as("v_ts"),
          $"event_id".as("view_id"), $"value".as("view_value"))
      AsOfJoin(purchases, views, "user_id", "ts", "v_ts",
          Seq("view_id", "view_value"))
        .select($"purchase_id", $"user_id", $"view_id", $"view_value")
    }),

    // Lookup join: per-row dimension enrichment — the dim side is
    // broadcast so the fact table never shuffles (Flink's cached lookup
    // join degenerates to exactly this on a static dim table).
    "q_lookup_join" -> ((s, d) => {
      import s.implicits._
      T.orders(s, d)
        .join(broadcast(T.customer(s, d)), $"o_custkey" === $"c_custkey", "left")
        .select($"o_orderkey", $"c_name", $"c_mktsegment")
    })
  )

  def oracle: Map[String, String] = Map(
    "q_interval_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
         FROM events p JOIN events c
           ON p.user_id = c.user_id
          AND p.event_type = 'purchase' AND c.event_type = 'click'
          AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts""",
    "q_asof_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id AS user_id,
                v.event_id AS view_id, v.value AS view_value
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
           ON p.user_id = v.user_id AND v.ts <= p.ts""",
    "q_lookup_join" ->
      """SELECT o_orderkey, c_name, c_mktsegment
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey"""
  )
}
