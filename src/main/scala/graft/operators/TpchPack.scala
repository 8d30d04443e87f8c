package graft.operators

import graft.{QueryPack, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-style end-to-end battery (SURVEY §5: the reference validates
  * with a TPC-DS/TPC-H harness; this is the same style on the driver's
  * star schema, adapted to its columns). Q1/Q3/Q5 analogs live in
  * RelationalPack (q1_agg, q_join_inner, q_multiway_join); here are the
  * Q4/Q6/Q13/Q18 analogs — semi-join-with-exists, selective scan agg,
  * outer-join histogram, and having-filtered large-volume join.
  */
object TpchPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q4 analog: priority count of orders with a late shipment
    // (l_shipdate > o_orderdate + 30 days) — EXISTS -> left_semi.
    "q_tpch_q4" -> ((s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      val late = T.lineitem(s, d).as("l")
      o.join(late,
          $"o_orderkey" === $"l_orderkey" &&
            $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    }),

    // Q6: forecast revenue change — tightly selective scan aggregate
    // (filters must reach the parquet scan).
    "q_tpch_q6" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
          $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .agg(sum($"l_extendedprice" * $"l_discount").as("revenue"))
    }),

    // Q13: customer distribution — histogram of per-customer order
    // counts including zero (left outer + double aggregation).
    "q_tpch_q13" -> ((s, d) => {
      import s.implicits._
      T.customer(s, d)
        .join(T.orders(s, d).filter($"o_orderpriority" =!= "1-URGENT"),
          $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
    }),

    // Q18: large-volume customers — HAVING on a grouped fact feeding a
    // multi-way join.
    "q_tpch_q18" -> ((s, d) => {
      import s.implicits._
      val big = T.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity").as("total_qty"))
        .filter($"total_qty" > 250.0)
      big.join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .select($"c_name", $"o_orderkey", $"o_totalprice", $"total_qty")
    })
  )

  def oracle: Map[String, String] = Map(
    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
         GROUP BY o_orderpriority""",
    "q_tpch_q6" ->
      """SELECT sum(l_extendedprice * l_discount) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey)
         GROUP BY c_count""",
    "q_tpch_q18" ->
      """SELECT c_name, o_orderkey, o_totalprice, total_qty FROM (
           SELECT l_orderkey, sum(l_quantity) AS total_qty
           FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250.0) big
         JOIN orders ON big.l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey"""
  )
}
