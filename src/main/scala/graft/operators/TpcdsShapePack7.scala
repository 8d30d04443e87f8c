package graft.operators

import graft.{QueryPack, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-DS shape battery, seventh wave (SURVEY §5): the "simple star"
  * closure. Waves 1-6 gave every COMPLEX reference shape its own row;
  * the star-topology queries (q3, q7/q26, q15, q19/q42/q52/q55, q43,
  * q96) were mapped to TPC-H battery analogs. These rows give that
  * family dedicated coverage too, so every one of the reference's 103
  * validated queries now has a same-shape battery row on this schema.
  * Each is a filter + dim-join + group-agg star with the family's
  * distinguishing wrinkle kept:
  *
  *   - q3: date-ranged brand revenue by year — the fact filter rides
  *     the date column, the dim filter the part type.
  *   - q7/q26: demographic-sliced averages — one customer-segment dim
  *     gate + one order-attribute gate, averages emitted as exact
  *     (sum, count) pairs.
  *   - q15: per-quarter geographic revenue with a threshold gate on
  *     the dim attribute (acctbal), quarter from integer month
  *     arithmetic.
  *   - q19/q42/q52/q55: the brand leaderboard for ONE month — group
  *     by brand inside a single month slice.
  *   - q43: weekday x nation revenue matrix — weekday from anchored
  *     integer day arithmetic (never engine week()/dayofweek(), whose
  *     numbering conventions differ).
  *   - q96: the bare gated COUNT through three narrow dim gates.
  *
  * Money in integer cents, every sum CAST to BIGINT in the oracle
  * (typesweep-gated).
  */
object TpcdsShapePack7 extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q3 shape: brand-year revenue for one part type, date-bounded.
    "q_tpcds_star_datefilter" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .filter($"l_shipdate" >= "1995-01-01" && $"l_shipdate" < "1997-01-01")
        .join(T.part(s, d).filter($"p_type".isin("PROMO", "ECONOMY")),
          $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", year($"l_shipdate").cast("long").as("yr"))
        .agg(sum(round($"l_extendedprice" * 100).cast("long"))
          .as("rev_cents"))
    }),

    // q7/q26 shape: demographic-sliced star — a customer-segment gate
    // and an order-priority gate, averages as exact (sum, count).
    "q_tpcds_star_segment" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .join(T.orders(s, d).filter($"o_orderpriority" === "3-MEDIUM"),
          $"l_orderkey" === $"o_orderkey")
        .join(T.customer(s, d).filter($"c_mktsegment" === "AUTOMOBILE"),
          $"o_custkey" === $"c_custkey")
        .join(T.part(s, d), $"l_partkey" === $"p_partkey")
        .groupBy($"p_type")
        .agg(sum($"l_quantity".cast("long")).as("qty_sum"),
          sum(round($"l_extendedprice" * 100).cast("long")).as("price_cents"),
          sum(round($"l_discount" * 10000).cast("long")).as("disc_bp"),
          count(lit(1)).as("n_lines"))
    }),

    // q15 shape: per-quarter geographic revenue, dim-attribute gate.
    "q_tpcds_star_quarter" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(T.customer(s, d).filter($"c_acctbal" > 1000),
          $"o_custkey" === $"c_custkey")
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name",
          year($"o_orderdate").cast("long").as("yr"),
          ((month($"o_orderdate") - 1) / lit(3)).cast("long").as("qtr"))
        .agg(sum(round($"l_extendedprice" * 100).cast("long"))
          .as("rev_cents"))
    }),

    // q19/q42/q52/q55 shape: single-month brand leaderboard.
    "q_tpcds_star_brandmonth" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .join(T.orders(s, d)
          .filter(year($"o_orderdate") === 1995 &&
            month($"o_orderdate") === 6),
          $"l_orderkey" === $"o_orderkey")
        .join(T.part(s, d), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(sum(round($"l_extendedprice" * 100).cast("long"))
          .as("rev_cents"), count(lit(1)).as("n_lines"))
    }),

    // q43 shape: weekday x nation matrix; weekday = anchored integer
    // day arithmetic off Monday 1995-01-02 (engine-neutral numbering).
    "q_tpcds_star_weekday" -> ((s, d) => {
      import s.implicits._
      val anchor = to_date(lit("1995-01-02"))
      T.lineitem(s, d)
        .filter($"l_shipdate" >= "1995-01-02")
        .join(T.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .join(T.nation(s, d), $"s_nationkey" === $"n_nationkey")
        .withColumn("dow",
          (datediff($"l_shipdate", anchor) % 7).cast("long"))
        .groupBy($"n_name", $"dow")
        .agg(sum(round($"l_extendedprice" * 100).cast("long"))
          .as("rev_cents"))
    }),

    // q96 shape: the bare gated count through three narrow dim gates.
    "q_tpcds_star_narrowcount" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .filter($"l_quantity" >= 25)
        .join(T.orders(s, d).filter($"o_orderpriority" === "1-URGENT"),
          $"l_orderkey" === $"o_orderkey")
        .join(T.customer(s, d).filter($"c_mktsegment" === "BUILDING"),
          $"o_custkey" === $"c_custkey")
        .agg(count(lit(1)).as("n_lines"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q_tpcds_star_datefilter" ->
      """SELECT p_brand, CAST(year(l_shipdate) AS BIGINT) AS yr,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1997-01-01'
           AND p_type IN ('PROMO', 'ECONOMY')
         GROUP BY p_brand, year(l_shipdate)""",
    "q_tpcds_star_segment" ->
      """SELECT p_type,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS price_cents,
                CAST(sum(CAST(round(l_discount * 10000) AS BIGINT))
                  AS BIGINT) AS disc_bp,
                count(*) AS n_lines
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN part     ON l_partkey = p_partkey
         WHERE o_orderpriority = '3-MEDIUM'
           AND c_mktsegment = 'AUTOMOBILE'
         GROUP BY p_type""",
    "q_tpcds_star_quarter" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
                CAST((month(o_orderdate) - 1) // 3 AS BIGINT) AS qtr,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         WHERE c_acctbal > 1000
         GROUP BY n_name, year(o_orderdate), (month(o_orderdate) - 1) // 3""",
    "q_tpcds_star_brandmonth" ->
      """SELECT p_brand,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents,
                count(*) AS n_lines
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN part   ON l_partkey = p_partkey
         WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 6
         GROUP BY p_brand""",
    "q_tpcds_star_weekday" ->
      """SELECT n_name,
                CAST(datediff('day', DATE '1995-01-02',
                     CAST(l_shipdate AS DATE)) % 7 AS BIGINT) AS dow,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation   ON s_nationkey = n_nationkey
         WHERE l_shipdate >= '1995-01-02'
         GROUP BY n_name, datediff('day', DATE '1995-01-02',
                                   CAST(l_shipdate AS DATE)) % 7""",
    "q_tpcds_star_narrowcount" ->
      """SELECT count(*) AS n_lines
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE l_quantity >= 25
           AND o_orderpriority = '1-URGENT'
           AND c_mktsegment = 'BUILDING'"""
  )
}
