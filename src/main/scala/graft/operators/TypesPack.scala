package graft.operators

import graft.{QueryPack, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Type-system coverage (SURVEY.md §1.2 / §2.10 collection ops):
  * ARRAY construction + CARDINALITY/CONTAINS/ELEMENT/FLATTEN and
  * friends, DECIMAL(p,s) exact arithmetic, YEAR-TO-MONTH and
  * DAY-TO-SECOND interval arithmetic, the OVERLAPS predicate.
  */
object TypesPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_array_funcs" -> ((s, d) => {
      import s.implicits._
      val words = split($"p_name", " ")
      T.part(s, d).select(
        $"p_partkey",
        size(words).as("card"),
        array_contains(words, "small").as("has_small"),
        element_at(words, 1).as("w1"),
        element_at(words, -1).as("wlast"),
        // Array-valued results are canonically joined to a scalar string:
        // the driver's sort-before-hash comparator can't order raw arrays.
        array_join(flatten(array(words, array($"p_brand"))), ",").as("flat"),
        array_join(sort_array(words), ",").as("sorted"),
        array_join(reverse(words), ",").as("rev"),
        array_join(slice(words, 1, 1), ",").as("sl"),
        array_position(words, "ring").cast("int").as("pos_ring"))
    }),

    // DECIMAL(p,s) exact arithmetic: per-row products and group sums
    // computed in decimal, cast to fixed (p,s) on both engines.
    "q_decimal_agg" -> ((s, d) => {
      import s.implicits._
      val dp = $"l_extendedprice".cast("decimal(12,2)")
      val dt = $"l_tax".cast("decimal(8,4)")
      T.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          sum(dp).cast("decimal(18,2)").as("sum_dec"),
          max(dp).cast("decimal(18,2)").as("max_dec"),
          sum((dp * dt).cast("decimal(18,4)")).cast("decimal(18,4)").as("sum_tax_amt"),
          count(dp).as("n"))
    }),

    "q_interval_arith" -> ((s, d) => {
      import s.implicits._
      val pStart = $"o_orderdate"
      val pEnd = $"o_orderdate" + expr("INTERVAL 30 DAYS")
      val qStart = lit("1997-01-01").cast("timestamp_ntz")
      val qEnd = lit("1997-06-30").cast("timestamp_ntz")
      T.orders(s, d).select(
        $"o_orderkey",
        ($"o_orderdate" + expr("INTERVAL '1-2' YEAR TO MONTH")).as("plus_ym"),
        ($"o_orderdate" + expr("INTERVAL '3 04:05:06' DAY TO SECOND")).as("plus_dts"),
        // OVERLAPS predicate (Flink/SQL:2016) as the canonical rewrite
        (pStart <= qEnd && qStart <= pEnd).as("ovl"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q_array_funcs" ->
      """SELECT p_partkey,
         CAST(len(string_split(p_name, ' ')) AS INT) AS card,
         list_contains(string_split(p_name, ' '), 'small') AS has_small,
         string_split(p_name, ' ')[1] AS w1,
         string_split(p_name, ' ')[-1] AS wlast,
         array_to_string(flatten([string_split(p_name, ' '), [p_brand]]), ',') AS flat,
         array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted,
         array_to_string(list_reverse(string_split(p_name, ' ')), ',') AS rev,
         array_to_string(string_split(p_name, ' ')[1:1], ',') AS sl,
         CAST(list_position(string_split(p_name, ' '), 'ring') AS INT) AS pos_ring
         FROM part""",
    "q_decimal_agg" ->
      """SELECT l_returnflag,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_dec,
         CAST(max(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS max_dec,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(l_tax AS DECIMAL(8,4)) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_tax_amt,
         count(l_extendedprice) AS n
         FROM lineitem GROUP BY l_returnflag""",
    "q_interval_arith" ->
      """SELECT o_orderkey,
         o_orderdate + INTERVAL 14 MONTH AS plus_ym,
         o_orderdate + INTERVAL '3 days 4 hours 5 minutes 6 seconds' AS plus_dts,
         (o_orderdate <= TIMESTAMP '1997-06-30 00:00:00'
          AND TIMESTAMP '1997-01-01 00:00:00' <= o_orderdate + INTERVAL 30 DAYS) AS ovl
         FROM orders"""
  )
}
