package graft.operators

import graft.{QueryPack, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-window aggregations (SURVEY.md §2.5): TUMBLE, HOP, SESSION,
  * CUMULATE — here in batch form so the DuckDB oracle can check them;
  * the same WindowOps helpers drive the streaming versions (see
  * graft.streaming + StreamingSpec), giving Flink's bounded-stream
  * equivalence: batch result == replayed-stream result.
  *
  * Reference: WindowOperator.java:97, SliceAssigners.java,
  * SessionWindowAssigner.java:36, CUMULATE in FlinkSqlOperatorTable.
  *
  * Oracles express windows via epoch arithmetic (floor(epoch/size)*size),
  * which is exactly Spark's epoch-aligned `window()` start computation.
  */
object TimeWindowPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tumble_agg" -> ((s, d) => {
      import s.implicits._
      WindowOps.tumble(T.events(s, d), $"ts", "1 hour")
        .groupBy($"window_start", $"window_end", $"event_type")
        .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
    }),

    // Tumbling window on a shifted grid (Flink TUMBLE offset /
    // WindowAssigner.of(size, offset)): hour windows starting at :15.
    "q_tumble_offset" -> ((s, d) => {
      import s.implicits._
      WindowOps.tumbleOffset(T.events(s, d), $"ts", "1 hour", "15 minutes")
        .groupBy($"window_start", $"window_end", $"event_type")
        .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
    }),

    "q_hop_agg" -> ((s, d) => {
      import s.implicits._
      WindowOps.hop(T.events(s, d), $"ts", "1 hour", "30 minutes")
        .groupBy($"window_start", $"window_end")
        .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
    }),

    "q_session_agg" -> ((s, d) => {
      import s.implicits._
      WindowOps.sessionAgg(T.events(s, d), $"ts", "10 minutes",
          Seq($"user_id"),
          Seq(count(lit(1)).as("n_events"), sum($"value").as("sum_value")))
        .select($"user_id", $"window_start", $"window_end",
          $"n_events", $"sum_value")
    }),

    // Dynamic-gap session windows (Flink SessionWindowAssigner with
    // dynamic gap extractor): errors close sessions faster.
    "q_session_dynamic" -> ((s, d) => {
      import s.implicits._
      // session_window's dynamic gap requires CalendarIntervalType
      // (make_interval), not the ANSI DayTimeIntervalType literals
      val mins = (m: Int) => make_interval(
        lit(0), lit(0), lit(0), lit(0), lit(0), lit(m), lit(0))
      val gap = when($"event_type" === "error", mins(5)).otherwise(mins(10))
      T.events(s, d)
        .groupBy(session_window($"ts", gap), $"user_id")
        .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
        .select($"user_id",
          $"session_window.start".cast("timestamp_ntz").as("window_start"),
          $"session_window.end".cast("timestamp_ntz").as("window_end"),
          $"n", $"sum_value")
    }),

    "q_cumulate_agg" -> ((s, d) => {
      import s.implicits._
      WindowOps.cumulate(T.events(s, d), $"ts", 900L, 3600L)
        .groupBy($"window_start", $"window_end")
        .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
    }),

    // Count windows, batch form (Flink countWindow(N): tumbling windows
    // of N events per key in time order; the streaming twin is
    // CountWindows.tumbling). The window partitions on user_id — high
    // cardinality, so the per-key sort parallelizes across keys; no
    // single-task global sort.
    "q_count_window" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      T.events(s, d)
        .withColumn("win_no",
          floor((row_number().over(w) - 1) / 10).cast("long"))
        .groupBy($"user_id", $"win_no")
        .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"),
          min($"event_id").as("first_event"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q_tumble_agg" ->
      """SELECT make_timestamp(CAST(floor(epoch(ts)/3600)*3600 AS BIGINT)*1000000) AS window_start,
                make_timestamp((CAST(floor(epoch(ts)/3600)*3600 AS BIGINT)+3600)*1000000) AS window_end,
                event_type, count(*) AS n, sum(value) AS sum_value
         FROM events
         GROUP BY 1, 2, 3""",
    "q_count_window" ->
      """WITH rn AS (
           SELECT user_id, value, event_id,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS r
           FROM events)
         SELECT user_id, (r - 1) // 10 AS win_no,
                count(*) AS n, sum(value) AS sum_value,
                min(event_id) AS first_event
         FROM rn GROUP BY 1, 2""",
    "q_tumble_offset" ->
      """SELECT make_timestamp((CAST(floor((epoch(ts)-900)/3600)*3600 AS BIGINT)+900)*1000000) AS window_start,
                make_timestamp((CAST(floor((epoch(ts)-900)/3600)*3600 AS BIGINT)+900+3600)*1000000) AS window_end,
                event_type, count(*) AS n, sum(value) AS sum_value
         FROM events
         GROUP BY 1, 2, 3""",
    "q_hop_agg" ->
      """WITH exp AS (
           SELECT make_timestamp((CAST(floor(epoch(ts)/1800)*1800 AS BIGINT) - k*1800)*1000000) AS window_start,
                  value
           FROM events CROSS JOIN (SELECT unnest([0,1]) AS k)
         )
         SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
                count(*) AS n, sum(value) AS sum_value
         FROM exp GROUP BY 1, 2""",
    "q_session_agg" ->
      """WITH lagd AS (
           SELECT user_id, ts, value,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events
         ), flagd AS (
           SELECT *, CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 10 MINUTE
                          THEN 1 ELSE 0 END AS new_s
           FROM lagd
         ), sess AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
           FROM flagd
         )
         SELECT user_id, min(ts) AS window_start,
                max(ts) + INTERVAL 10 MINUTE AS window_end,
                count(*) AS n_events, sum(value) AS sum_value
         FROM sess GROUP BY user_id, sid""",
    "q_session_dynamic" ->
      """WITH e AS (
           SELECT user_id, ts, value, event_id,
                  CASE WHEN event_type = 'error' THEN 300 ELSE 600 END AS gap
           FROM events
         ), w AS (
           SELECT *, max(epoch(ts) + gap) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
           FROM e
         ), f AS (
           SELECT *, CASE WHEN prev_end IS NULL OR epoch(ts) > prev_end
                          THEN 1 ELSE 0 END AS new_s
           FROM w
         ), sess AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
           FROM f
         )
         SELECT user_id, min(ts) AS window_start,
                max(ts + gap * INTERVAL 1 SECOND) AS window_end,
                count(*) AS n, sum(value) AS sum_value
         FROM sess GROUP BY user_id, sid""",
    "q_cumulate_agg" ->
      """WITH exp AS (
           SELECT make_timestamp(CAST(floor(epoch(ts)/3600)*3600 AS BIGINT)*1000000) AS window_start,
                  make_timestamp((CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) + k*900)*1000000) AS window_end,
                  ts, value
           FROM events CROSS JOIN (SELECT unnest([1,2,3,4]) AS k)
         )
         SELECT window_start, window_end, count(*) AS n, sum(value) AS sum_value
         FROM exp WHERE window_end > ts GROUP BY 1, 2"""
  )
}
