package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Scalar/aggregate function surface filling Flink built-ins that Spark
  * lacks (SURVEY.md §2.10/§2.11, §7.2-M1). Everything here composes
  * codegen'd `org.apache.spark.sql.functions` where possible; custom
  * Aggregators only where semantics demand state.
  */
object GraftFunctions {

  // ---------------------------------------------------------------------
  // SINGLE_VALUE (reference: flink-table-planner
  // .../functions/aggfunctions/SingleValueAggFunction.java) — returns the
  // group's only value, errors if the group has more than one row.
  // NOT `private`: Scala private emits ACC_PRIVATE on the inner class,
  // and janino then refuses the generated accessor calls ("No applicable
  // constructor/method found ... candidates are: public double sv()"),
  // silently dropping the whole agg stage to interpreted mode.
  case class SVBuf(var sv: Double, var n: Long)

  private object SingleValueAgg extends Aggregator[Double, SVBuf, Double] {
    def zero: SVBuf = SVBuf(0.0, 0L)
    def reduce(b: SVBuf, a: Double): SVBuf = {
      if (b.n >= 1) throw new IllegalStateException(
        "SINGLE_VALUE: group has more than one row")
      b.sv = a; b.n += 1; b
    }
    def merge(x: SVBuf, y: SVBuf): SVBuf = {
      val n = x.n + y.n
      if (n > 1) throw new IllegalStateException(
        "SINGLE_VALUE: group has more than one row")
      if (y.n > 0) { x.sv = y.sv }
      x.n = n; x
    }
    def finish(b: SVBuf): Double = b.sv
    def bufferEncoder: Encoder[SVBuf] = Encoders.product[SVBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** SINGLE_VALUE aggregate over a double column. */
  def single_value(c: Column): Column = udaf(SingleValueAgg).apply(c)

  // ---------------------------------------------------------------------
  // Scalar helpers (Flink built-ins missing from Spark's function set).

  /** Flink SPLIT_INDEX(str, sep, idx) — null when out of range. */
  def split_index(str: Column, sep: String, idx: Int): Column =
    get(split(str, java.util.regex.Pattern.quote(sep)), lit(idx))

  /** Flink IS_DECIMAL: parseable as a number. */
  def is_decimal(c: Column): Column =
    c.rlike("^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$")

  /** Flink IS_DIGIT: all characters decimal digits. */
  def is_digit(c: Column): Column = c.rlike("^[0-9]+$")

  /** Flink IS_ALPHA: all characters letters. */
  def is_alpha(c: Column): Column = c.rlike("^[A-Za-z]+$")

  /** Flink HASH_CODE(str): Java String.hashCode semantics
    * (s[0]*31^(n-1) + ...), evaluated distributively via aggregate(). */
  def hash_code(c: Column): Column = {
    // Accumulate in Long, wrap to int32 once at the end — congruent mod
    // 2^32 with Java's per-step int wrap; ANSI-safe for <=12-char input.
    val codes = transform(sequence(lit(1), length(c)),
      i => ascii(c.substr(i, lit(1))).cast("long"))
    val acc = aggregate(codes, lit(0L), (a, x) => a * 31 + x)
    (((acc % 4294967296L) + 4294967296L + 2147483648L) % 4294967296L
      - 2147483648L).cast("int")
  }

  /** Flink TRUNCATE(x, n): truncate toward zero at n decimal places. */
  def truncate(c: Column, n: Int): Column = {
    val f = math.pow(10, n)
    (floor(abs(c) * f) / f) * signum(c)
  }

  /** Register the Flink-only scalars for SQL use as Spark 4 SQL UDFs
    * (`CREATE TEMPORARY FUNCTION ... RETURN <expr>`). SQL UDFs are
    * inlined into the plan at analysis time, so they stay inside
    * whole-stage codegen — unlike Scala UDFs. */
  def registerSqlFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION split_index(s STRING, sep STRING, i INT)
      RETURNS STRING RETURN get(split(s, sep), i)""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION is_digit(s STRING)
      RETURNS BOOLEAN RETURN s rlike '^[0-9]+$'""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION is_alpha(s STRING)
      RETURNS BOOLEAN RETURN s rlike '^[A-Za-z]+$'""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION is_decimal(s STRING)
      RETURNS BOOLEAN RETURN s rlike '^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$'""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION truncate_n(x DOUBLE, n INT)
      RETURNS DOUBLE RETURN floor(abs(x) * power(10, n)) / power(10, n) * sign(x)""")
  }
}
