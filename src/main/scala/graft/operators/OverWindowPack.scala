package graft.operators

import graft.{QueryPack, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OVER-clause window functions (SURVEY.md §2.6): ranking functions,
  * offset functions (LEAD/LAG), running/sliding ROWS frames, RANGE
  * frames, FIRST/LAST/NTH_VALUE, NTILE/CUME_DIST/PERCENT_RANK.
  *
  * Reference: BatchExecOverAggregate.java:79 with frames in
  * OP/over/frame/ (RowSlidingOverFrame, RangeSlidingOverFrame,
  * UnboundedOverWindowFrame, OffsetOverFrame, InsensitiveOverFrame).
  *
  * All ORDER BYs carry a unique tie-break column so results are
  * deterministic across engines. At scale each query is a single
  * shuffle on the partition key; Spark's WindowExec streams each
  * partition group through the frame buffer (spilling if needed),
  * the same design as Flink's BufferDataOverWindowOperator.
  */
object OverWindowPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // RANK / DENSE_RANK / ROW_NUMBER (InsensitiveOverFrame).
    "q_over_rank" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"s_nationkey")
        .orderBy($"s_acctbal".desc, $"s_suppkey".asc)
      T.supplier(s, d).select(
        $"s_nationkey", $"s_suppkey", $"s_acctbal",
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        row_number().over(w).cast("long").as("rn"))
    }),

    // Running aggregate: ROWS UNBOUNDED PRECEDING .. CURRENT ROW.
    "q_over_running" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".asc, $"event_id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.events(s, d).select(
        $"user_id", $"event_id",
        sum($"value").over(w).as("running_sum"),
        count(lit(1)).over(w).as("running_n"))
    }),

    // LEAD/LAG (OffsetOverFrame).
    "q_over_leadlag" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      T.events(s, d).select(
        $"user_id", $"event_id", $"value",
        lag($"value", 1).over(w).as("prev_value"),
        lead($"value", 1).over(w).as("next_value"),
        lag($"value", 2, -1.0).over(w).as("prev2_value"))
    }),

    // NTILE / CUME_DIST / PERCENT_RANK over a global ordering — the
    // window-function SEMANTICS demo (single-partition by nature, fine
    // at test SF). The 100-TB execution of the same statistics is
    // [[graft.ext.GlobalRank]] (q_global_rank): range partition +
    // per-partition row numbers + broadcast prefix offsets, no
    // single-partition exchange anywhere.
    "q_over_ntile" -> ((s, d) => {
      import s.implicits._
      val w = Window.orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      T.orders(s, d).select(
        $"o_orderkey",
        ntile(4).over(w).cast("int").as("quartile"),
        cume_dist().over(w).as("cd"),
        percent_rank().over(w).as("pr"))
    }),

    // RANGE frame with numeric bounds (RangeSlidingOverFrame).
    "q_over_range" -> ((s, d) => {
      T.supplier(s, d).selectExpr(
        "s_nationkey", "s_suppkey", "s_acctbal",
        """sum(s_acctbal) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal
           RANGE BETWEEN 500.0 PRECEDING AND CURRENT ROW) AS nearby_sum""")
    }),

    // Time-interval RANGE frame (Flink's RANGE INTERVAL OVER,
    // StreamExecOverAggregate's rowtime-range frames): rolling 28-day
    // revenue per supplier keyed by ship DATE — the frame bound is an
    // INTERVAL on the time axis, a different physical frame evaluator
    // than the numeric-range q_over_range (dates spaced unevenly ⇒
    // varying row counts per frame). Cents sum: exact BIGINT in both
    // engines. Per-day pre-aggregation first, so the window input is
    // |supplier × active days|, not |lineitem| — at 100 TB the sort is
    // over the collapsed daily series.
    "q_over_range_interval" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .groupBy($"l_suppkey", date_trunc("day", $"l_shipdate").as("day"))
        .agg(sum(round($"l_extendedprice" * 100).cast("long"))
          .as("day_cents"))
        .selectExpr(
          "l_suppkey", "day", "day_cents",
          """sum(day_cents) OVER (PARTITION BY l_suppkey ORDER BY day
             RANGE BETWEEN INTERVAL '27' DAY PRECEDING AND CURRENT ROW)
             AS rolling28_cents""")
    }),

    // Sliding ROWS frame (RowSlidingOverFrame): 3-row moving average.
    "q_over_rows_sliding" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
        .rowsBetween(-2, Window.currentRow)
      T.orders(s, d).select(
        $"o_custkey", $"o_orderkey",
        avg($"o_totalprice").over(w).as("mov_avg"),
        max($"o_totalprice").over(w).as("mov_max"))
    }),

    // FIRST_VALUE / LAST_VALUE / NTH_VALUE over full-partition frame
    // (UnboundedOverWindowFrame).
    "q_over_first_last" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"s_nationkey")
        .orderBy($"s_acctbal".desc, $"s_suppkey".asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.supplier(s, d).select(
        $"s_nationkey", $"s_suppkey",
        first($"s_name").over(w).as("richest"),
        last($"s_name").over(w).as("poorest"),
        nth_value($"s_name", 2).over(w).as("second"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q_over_rank" ->
      """SELECT s_nationkey, s_suppkey, s_acctbal,
         rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
         row_number() OVER w AS rn
         FROM supplier
         WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ASC)""",
    "q_over_running" ->
      """SELECT user_id, event_id,
         sum(value) OVER w AS running_sum,
         count(*) OVER w AS running_n
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "q_over_leadlag" ->
      """SELECT user_id, event_id, value,
         lag(value, 1) OVER w AS prev_value,
         lead(value, 1) OVER w AS next_value,
         lag(value, 2, -1.0) OVER w AS prev2_value
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""",
    "q_over_ntile" ->
      """SELECT o_orderkey,
         CAST(ntile(4) OVER w AS INT) AS quartile,
         cume_dist() OVER w AS cd,
         percent_rank() OVER w AS pr
         FROM orders
         WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey ASC)""",
    "q_over_range" ->
      """SELECT s_nationkey, s_suppkey, s_acctbal,
         sum(s_acctbal) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal
           RANGE BETWEEN 500.0 PRECEDING AND CURRENT ROW) AS nearby_sum
         FROM supplier""",
    "q_over_range_interval" ->
      """WITH daily AS (
           SELECT l_suppkey,
                  CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS day,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                       AS BIGINT) AS day_cents
           FROM lineitem GROUP BY 1, 2)
         SELECT l_suppkey, day, day_cents,
                CAST(sum(day_cents) OVER (PARTITION BY l_suppkey
                  ORDER BY day RANGE BETWEEN INTERVAL 27 DAYS PRECEDING
                  AND CURRENT ROW) AS BIGINT) AS rolling28_cents
         FROM daily""",
    "q_over_rows_sliding" ->
      """SELECT o_custkey, o_orderkey,
         avg(o_totalprice) OVER w AS mov_avg,
         max(o_totalprice) OVER w AS mov_max
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
    "q_over_first_last" ->
      """SELECT s_nationkey, s_suppkey,
         first_value(s_name) OVER w AS richest,
         last_value(s_name) OVER w AS poorest,
         nth_value(s_name, 2) OVER w AS second
         FROM supplier
         WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""
  )
}
