package graft.operators

import graft.{QueryPack, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-DS shape battery, fifth wave (SURVEY §5; the reference validates
  * 103 queries — flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/,
  * TpcdsTestProgram.java:137). Waves 1-4 left three reference queries
  * mapped only to shared analogs; these give each its own dedicated
  * battery row:
  *
  *   - q84: the pure multi-hop DIMENSION CHAIN — customer resolved
  *     through current_addr → household_demographics → income_band and
  *     emitted as a concatenated identification string, gated by an
  *     activity semi join on the returns fact. No aggregation at all:
  *     the whole plan is chained broadcast hash joins + one semi join,
  *     and at 100 TB every hop must stay on the broadcast side.
  *   - q24a/b: a grouped CTE whose HAVING threshold is a SCALAR
  *     aggregate over the SAME CTE (sum > 0.05 * avg(sum) over all
  *     groups) — the aggregate subtree is consumed twice, once rowwise
  *     and once collapsed to a scalar; expressed over ONE pinned
  *     grouped frame so the fact star is scanned once.
  *   - q41: a correlated EXISTS against the SAME dimension table the
  *     outer query scans (item i1 WHERE EXISTS item i2 with matching
  *     manufacturer and a different attribute profile) — a dimension
  *     SELF semi join, not a fact-to-dim membership test.
  */
object TpcdsShapePack5 extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q84 shape: customer identification through a chained dim walk
    // (customer → nation → region here; the reference walks
    // customer_address → household_demographics → income_band), an
    // acctbal band standing in for the income-band range, and a semi
    // join on orders standing in for the store_returns activity gate.
    // Zero aggregation — the output is the resolved identification
    // string per qualifying customer.
    "q_tpcds_dimchain" -> ((s, d) => {
      import s.implicits._
      val cust = T.customer(s, d)
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .join(T.region(s, d), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name" === "EUROPE" &&
          $"c_acctbal" >= 1000 && $"c_acctbal" <= 6000)
      cust.join(T.orders(s, d).select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey",
          concat_ws(":", $"c_name", $"n_name", $"r_name").as("ident"))
    }),

    // q24 shape: grouped CTE reused against its own scalar collapse
    // (the reference gates on sales > 0.05 * avg(sales); the shape is
    // identical at any multiple — 3x keeps the output a selective
    // high-spender list on this generator's flatter distribution).
    // The avg comparison is cross-multiplied into BIGINT
    // (sales * n_groups > 3 * total) so no float division can flip a
    // boundary row. The SQL CTE form (the oracle keeps it) plans the
    // grouped subtree THREE times — Catalyst merges the two scalar
    // gates into one mergedValue subquery but neither ReusedSubquery
    // nor ReusedExchange fires physically (the rowwise consumer prunes
    // different columns), so the fact star is scanned 3x. The
    // Spark-first form pins the grouped frame once
    // (Materialize.pin — the same multiply-consumed-frame tool the
    // iterative ops use) and derives both the rowwise side and the
    // 1-row stats from the pin: ONE fact pass at any scale, plus a
    // cheap pass over the grouped rows. The pin's blocks are
    // reclaimed by session cache clearing (bench isolates per query).
    "q_tpcds_cte_scalar" -> ((s, d) => {
      import s.implicits._
      val grouped = T.lineitem(s, d)
        .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(T.part(s, d), $"l_partkey" === $"p_partkey")
        .groupBy($"c_custkey", $"p_brand")
        .agg(sum(round($"l_extendedprice" * 100).cast("long"))
          .as("sales_cents"))
      val sPinned = graft.ext.Materialize.pin(grouped)
      val stats = sPinned.agg(count(lit(1)).as("n_groups"),
        sum($"sales_cents").cast("long").as("tot"))
      sPinned.crossJoin(broadcast(stats))
        .filter($"sales_cents" * $"n_groups" > lit(3) * $"tot")
        .select($"c_custkey", $"p_brand", $"sales_cents")
    }),

    // q41 shape: dimension self semi join — brands whose catalog holds
    // at least one small PROMO-typed part, counted over the mid-size
    // slice of the same table. The EXISTS correlates on p_brand back
    // into part itself.
    "q_tpcds_dimself" -> ((s, d) => {
      import s.implicits._
      T.part(s, d).createOrReplaceTempView("t5_part_self")
      s.sql("""
        SELECT p_brand, count(*) AS n_parts
        FROM t5_part_self p1
        WHERE p_size BETWEEN 10 AND 20
          AND EXISTS (
            SELECT 1 FROM t5_part_self p2
            WHERE p2.p_brand = p1.p_brand
              AND p2.p_type LIKE '%PROMO%'
              AND p2.p_size < 5)
        GROUP BY p_brand""")
    })
  )

  def oracle: Map[String, String] = Map(
    "q_tpcds_dimchain" ->
      """SELECT c_custkey,
                concat_ws(':', c_name, n_name, r_name) AS ident
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'EUROPE'
           AND c_acctbal >= 1000 AND c_acctbal <= 6000
           AND c_custkey IN (SELECT o_custkey FROM orders)""",
    "q_tpcds_cte_scalar" ->
      """WITH s AS (
           SELECT c_custkey, p_brand,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS sales_cents
           FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN part     ON l_partkey = p_partkey
           GROUP BY c_custkey, p_brand)
         SELECT c_custkey, p_brand, sales_cents
         FROM s
         WHERE sales_cents * (SELECT count(*) FROM s)
               > 3 * (SELECT CAST(sum(sales_cents) AS BIGINT) FROM s)""",
    "q_tpcds_dimself" ->
      """SELECT p_brand, count(*) AS n_parts
         FROM part p1
         WHERE p_size BETWEEN 10 AND 20
           AND EXISTS (
             SELECT 1 FROM part p2
             WHERE p2.p_brand = p1.p_brand
               AND p2.p_type LIKE '%PROMO%'
               AND p2.p_size < 5)
         GROUP BY p_brand"""
  )
}
