package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / as-of join (SURVEY.md §2.3): for each left ("probe") row,
  * the latest right ("version") row with rightTime <= leftTime on equal
  * keys — Flink's `FOR SYSTEM_TIME AS OF` /
  * TemporalRowTimeJoinOperator.java:78 in batch form.
  *
  * Implementation is the union-merge pattern, NOT a range join:
  * tag both sides, sort by (key, time, tag) within key partitions, and
  * carry the last non-null right payload forward with
  * last_value(IGNORE NULLS). One shuffle on the key, linear work,
  * no candidate-pair explosion — the property that keeps an as-of join
  * of two 100 TB tables feasible where a range-condition join would
  * quadratically blow up on hot keys.
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry onto matching left rows
    *                     (exposed as-is; rename beforehand to avoid
    *                     clashes with left columns)
    * @note two right rows with identical (key, time) are an undefined
    *       order (same as Flink's version state) — include a tiebreak
    *       in rightTime (e.g. a composite sort key) if that matters */
  def apply(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("__tag"), "reserved column name __tag")
    require(!leftCols.contains("__ver"), "reserved column name __ver")

    // The whole right payload travels as ONE struct per version row:
    // per-column last(ignoreNulls) would both skip legitimately-NULL
    // payload values (reading a stale older version) and mix fields from
    // different versions in a single output row. A version row is atomic.
    val verType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c)))

    val taggedLeft = left
      .withColumn("__time", col(leftTime))
      .withColumn("__tag", lit(1))
      .select(Seq(col(key), col("__time"), col("__tag")) ++
        leftCols.filterNot(_ == key).map(col) :+
        lit(null).cast(verType).as("__ver"): _*)

    val taggedRight = right
      .withColumn("__time", col(rightTime))
      .withColumn("__tag", lit(0))
      .select(Seq(col(key), col("__time"), col("__tag")) ++
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(col): _*).as("__ver"): _*)

    // Right rows sort before left rows at equal timestamps (tag 0 < 1):
    // a version taking effect at t is visible to a probe at the same t.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__time").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = taggedLeft.unionByName(taggedRight)
      .withColumn("__ver", last(col("__ver"), ignoreNulls = true).over(w))
    val expanded = rightPayload.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col("__ver").getField(c))
    }
    expanded.filter(col("__tag") === 1).drop("__time", "__tag", "__ver")
  }
}
