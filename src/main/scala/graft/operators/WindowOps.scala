package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-window assignment helpers re-expressing Flink's window TVFs
  * (SURVEY.md §2.5; reference FlinkSqlOperatorTable TUMBLE/HOP/CUMULATE,
  * StreamExecWindowTableFunction / SliceAssigners).
  *
  * TUMBLE/HOP map directly onto Spark's `window()`; SESSION onto
  * `session_window()`. CUMULATE has no Spark built-in: we append the
  * per-row list of slice ends and explode — each input row lands in
  * size/step windows that share window_start. This is a narrow (no
  * shuffle) transformation; the downstream groupBy is the only exchange,
  * exactly like Spark's own hop-window expansion, so it scales the same
  * way at 100 TB.
  */
object WindowOps {

  /** Tumbling window: appends window_start / window_end. */
  def tumble(df: DataFrame, ts: Column, size: String): DataFrame =
    df.withColumn("w", window(ts, size))
      .withColumn("window_start", col("w.start").cast("timestamp_ntz"))
      .withColumn("window_end", col("w.end").cast("timestamp_ntz"))
      .drop("w")

  /** Tumbling window whose grid is shifted by `offset` (Flink's
    * TUMBLE(..., offset) / WindowAssigner offset parameter — e.g.
    * day windows aligned to a non-UTC timezone boundary). Spark's
    * window() takes the shift as its startTime parameter. */
  def tumbleOffset(df: DataFrame, ts: Column, size: String,
      offset: String): DataFrame =
    df.withColumn("w", window(ts, size, size, offset))
      .withColumn("window_start", col("w.start").cast("timestamp_ntz"))
      .withColumn("window_end", col("w.end").cast("timestamp_ntz"))
      .drop("w")

  /** Hopping (sliding) window: one output row per covering window. */
  def hop(df: DataFrame, ts: Column, size: String, slide: String): DataFrame =
    df.withColumn("w", window(ts, size, slide))
      .withColumn("window_start", col("w.start").cast("timestamp_ntz"))
      .withColumn("window_end", col("w.end").cast("timestamp_ntz"))
      .drop("w")

  /** Cumulating window (Flink CUMULATE TVF,
    * reference .../runtime/operators/window/slicing/SliceAssigners.java):
    * windows [start, start+step), [start, start+2*step) ... [start, start+size)
    * where start is the max-size boundary; a row joins every window whose
    * end is after its timestamp. stepSec must divide sizeSec.
    */
  def cumulate(df: DataFrame, ts: Column, stepSec: Long, sizeSec: Long): DataFrame = {
    require(sizeSec % stepSec == 0, "size must be a multiple of step")
    val start = timestamp_seconds(
      floor(unix_timestamp(ts.cast("timestamp")) / sizeSec) * sizeSec)
      .cast("timestamp_ntz")
    df.withColumn("window_start", start)
      .withColumn("window_end",
        explode(sequence(
          col("window_start") + expr(s"INTERVAL $stepSec SECOND"),
          col("window_start") + expr(s"INTERVAL $sizeSec SECOND"),
          expr(s"INTERVAL $stepSec SECOND"))))
      .filter(col("window_end") > ts)
  }

  /** Session window (gap-merged): appends window_start / window_end after
    * grouping — returns the per-key aggregated frame, since session
    * windows only exist post-merge. */
  def sessionAgg(df: DataFrame, ts: Column, gap: String, keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(ts, gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("session_window.start").cast("timestamp_ntz"))
      .withColumn("window_end", col("session_window.end").cast("timestamp_ntz"))
      .drop("session_window")
}

/** Deduplication (Flink StreamExecDeduplicate /
  * ProcTimeDeduplicateKeepFirst/LastRowFunction — SURVEY.md §2.7),
  * expressed as the ROW_NUMBER()=1 pattern so Catalyst can optimize it
  * (WindowGroupLimit pushes the limit into the sort at scale).
  */
object Dedup {
  def keepFirst(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    keepN(df, keys, order, 1)

  def keepLast(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    keepN(df, keys, order.map(_.desc), 1)

  private def keepN(df: DataFrame, keys: Seq[Column], order: Seq[Column], n: Int): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(keys: _*).orderBy(order: _*)))
      .filter(col("__rn") <= n)
      .drop("__rn")
}

/** Per-key Top-N (Flink StreamExecRank / AppendOnlyTopNFunction —
  * SURVEY.md §2.7). RankType mirrors OP/rank/RankType.java. */
object TopN {
  sealed trait RankType
  case object RowNumber extends RankType
  case object Rank extends RankType
  case object DenseRank extends RankType

  /** Keep rows ranking <= n within each key group. The rank column is kept
    * (named `rank_no`). Catalyst 4.x rewrites this filter-over-window to
    * WindowGroupLimit: each map task keeps only n rows per key before the
    * shuffle, which is what makes this viable on 100 TB inputs. */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], n: Int,
      rankType: RankType = RowNumber): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("rank_no", rankCol(rankType).over(w).cast("long"))
      .filter(col("rank_no") <= n)
  }

  /** Variable rank range (Flink OP/rank/VariableRankRange.java): the
    * per-key N comes from a column instead of a constant (e.g. a
    * per-tenant quota). No WindowGroupLimit (N unknown statically), so
    * this shuffles the full group — use the constant form when N is
    * fixed. */
  def variable(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      nCol: Column, rankType: RankType = RowNumber): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("rank_no", rankCol(rankType).over(w).cast("long"))
      .filter(col("rank_no") <= nCol)
  }

  private def rankCol(rankType: RankType) = rankType match {
    case RowNumber => row_number()
    case Rank => rank()
    case DenseRank => dense_rank()
  }
}
