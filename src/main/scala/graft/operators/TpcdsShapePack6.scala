package graft.operators

import graft.{QueryPack, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-DS shape battery, sixth wave (SURVEY §5; the reference validates
  * 103 queries — flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/
  * query/, TpcdsTestProgram.java:137). Waves 1-5 mapped every reference
  * query to at least a shared analog; this wave gives dedicated rows to
  * the sub-shapes that were still only covered BY those shared analogs:
  *
  *   - q30/q81: correlated per-STATE average threshold where the output
  *     is customer DETAIL rows, not aggregates — the grouped CTE is
  *     consumed twice (rowwise + per-state collapse) and then joined
  *     back to the dimension for a detail projection gated on a
  *     DIFFERENT attribute of the correlation column.
  *   - q65: the BELOW-average direction — per-(store,item) revenue
  *     <= 0.1 x the store's average item revenue. The reference plans
  *     the same grouped subquery twice; here the per-store collapse is
  *     a window over ONE grouped pass (one fact scan), dims joined
  *     only after the threshold filter.
  *   - q85: TWO independent multi-arm disjunctions ANDed, where one
  *     disjunction's arms each contain an EQUALITY BETWEEN TWO
  *     DIMENSION INSTANCES (cd1.x = cd2.x in the reference) — a join
  *     predicate trapped inside an OR, so it cannot become an equi-join
  *     key and must evaluate post-join.
  *   - q91: the seven-table snowflake whose GROUP BY carries HIDDEN
  *     keys (grouped on demographic columns that never reach the
  *     output) — the result legitimately holds several rows per
  *     visible key.
  *   - q23b: a CTE chain where one CTE's HAVING threshold is a scalar
  *     aggregate (max) over ANOTHER grouped CTE, the two gates then
  *     applied as IN-subqueries to a two-channel UNION ALL.
  *   - q64 (full form): the cross-YEAR self-pair — per-(item, year)
  *     aggregates paired with the same item's next year under a strict
  *     growth gate. The reference self-joins the grouped CTE on
  *     (item, year+1); here the pair is a LEAD window over one grouped
  *     pass — the Spark-first single-scan form of the same semantics.
  *   - q50: a composite-key fact-to-fact join (ticket AND item AND
  *     customer in the reference; orderkey AND partkey AND suppkey
  *     here) feeding a 5-way latency bucket matrix in one aggregate.
  *
  * All money flows in integer cents; every ratio gate is
  * cross-multiplied into BIGINT so no float division can flip a
  * boundary row (the r5 typesweep lesson).
  */
object TpcdsShapePack6 extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q30/q81 shape: per-(customer, nation) returned revenue, gated by
    // 1.2x the nation's average (cross-multiplied: ret * 10 * n > 12 *
    // tot), output = customer DETAIL columns for one target nation.
    "q_tpcds_state_ret_detail" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d).createOrReplaceTempView("t6_lineitem")
      T.orders(s, d).createOrReplaceTempView("t6_orders")
      T.customer(s, d).createOrReplaceTempView("t6_customer")
      T.nation(s, d).createOrReplaceTempView("t6_nation")
      s.sql("""
        WITH ctr AS (
          SELECT o_custkey AS ctr_cust, c_nationkey AS ctr_nation,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) AS ctr_ret_cents
          FROM t6_lineitem
          JOIN t6_orders   ON l_orderkey = o_orderkey
          JOIN t6_customer ON o_custkey = c_custkey
          WHERE l_returnflag = 'R'
          GROUP BY o_custkey, c_nationkey),
        nat AS (
          SELECT ctr_nation AS nat_key,
                 CAST(sum(ctr_ret_cents) AS BIGINT) AS nat_tot,
                 count(*) AS nat_n
          FROM ctr GROUP BY ctr_nation)
        SELECT c_custkey, c_name, c_mktsegment, ctr_ret_cents
        FROM ctr
        JOIN nat ON ctr_nation = nat_key
        JOIN t6_customer ON ctr_cust = c_custkey
        JOIN t6_nation   ON c_nationkey = n_nationkey
        WHERE ctr_ret_cents * 10 * nat_n > 12 * nat_tot
          AND n_name = 'NATION_2'""")
    }),

    // q65 shape: slow sellers — per-(supplier, part) revenue at or
    // below 0.1x the supplier's average item revenue. The reference
    // (and the oracle SQL) write this as the SAME grouped subquery
    // planned twice and re-joined per supplier — at 100 TB that is a
    // second full fact scan (Catalyst cannot ReusedExchange the two
    // subtrees: their pushed filters differ). The Spark-first form
    // collapses the rejoin into a WINDOW over the single grouped
    // pass: one fact scan, one agg shuffle on (supp, part), one
    // window shuffle on supp. The comparison stays cross-multiplied
    // BIGINT: rev * n * 10 <= tot. Dim names join AFTER the gate.
    "q_tpcds_below_avg" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val sc = T.lineitem(s, d)
        .groupBy($"l_suppkey", $"l_partkey")
        .agg(sum(round($"l_extendedprice" * 100).cast("long")).as("rev_cents"))
      val w = Window.partitionBy($"l_suppkey")
      sc.withColumn("sb_tot", sum($"rev_cents").over(w))
        .withColumn("sb_n", count(lit(1)).over(w))
        .filter($"rev_cents" * $"sb_n" * 10 <= $"sb_tot")
        .join(T.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .join(T.part(s, d), $"l_partkey" === $"p_partkey")
        .select($"s_name", $"p_name", $"rev_cents")
    }),

    // q85 shape: two independent disjunctions ANDed. Arms of the first
    // pair a customer-segment test WITH a cross-dimension equality
    // (customer's nation = supplier's nation) and a price band — the
    // c/s nation equality lives INSIDE the OR so it cannot be an
    // equi-join key; arms of the second are region x profit bands.
    // Output: per-priority averages as exact (sum, count) pairs.
    "q_tpcds_dualdim_disjunct" -> ((s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
      val o = T.orders(s, d)
      val c = T.customer(s, d)
      val su = T.supplier(s, d)
      val n = T.nation(s, d)
      val cents = round($"l_extendedprice" * 100).cast("long")
      val armA =
        ($"c_mktsegment" === "BUILDING" && $"c_nationkey" === $"s_nationkey" &&
          $"l_extendedprice" >= 10000 && $"l_extendedprice" <= 40000) ||
        ($"c_mktsegment" === "MACHINERY" && $"c_nationkey" =!= $"s_nationkey" &&
          $"l_extendedprice" >= 20000 && $"l_extendedprice" <= 60000) ||
        ($"c_mktsegment" === "HOUSEHOLD" && $"c_nationkey" === $"s_nationkey" &&
          $"l_extendedprice" >= 30000 && $"l_extendedprice" <= 80000)
      val armB =
        ($"n_regionkey" === 0 && $"l_quantity" >= 10 && $"l_quantity" <= 30) ||
        ($"n_regionkey" === 1 && $"l_quantity" >= 20 && $"l_quantity" <= 40) ||
        ($"n_regionkey" === 2 && $"l_quantity" >= 5 && $"l_quantity" <= 45)
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .join(su, $"l_suppkey" === $"s_suppkey")
        .join(n, $"c_nationkey" === $"n_nationkey")
        .filter(armA && armB)
        .groupBy($"o_orderpriority")
        .agg(sum($"l_quantity".cast("long")).as("qty_sum"),
          sum(cents).as("price_cents"),
          count(lit(1)).as("n_lines"))
    }),

    // q91 shape: snowflake with HIDDEN group keys — grouped by
    // (s_name, c_mktsegment, o_orderstatus) but only s_name and the
    // loss total reach the output, so a supplier legitimately emits
    // one row per hidden combination it sells into.
    "q_tpcds_hidden_groupkey" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .filter($"l_returnflag" === "R")
        .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(T.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .filter(($"c_mktsegment" === "BUILDING" && $"o_orderstatus" === "F") ||
          ($"c_mktsegment" === "AUTOMOBILE" && $"o_orderstatus" === "O"))
        .filter($"n_regionkey" <= 2)
        .groupBy($"s_name", $"c_mktsegment", $"o_orderstatus")
        .agg(sum(round($"l_extendedprice" * 100).cast("long"))
          .as("loss_cents"))
        .select($"s_name", $"loss_cents")
    }),

    // q23b shape: frequent items (HAVING count > k) + best customers
    // (HAVING sum > 50% of the MAX customer sum — a scalar aggregate
    // over another grouped CTE, cross-multiplied: 2*sales > max),
    // both applied as IN-gates to a two-channel UNION ALL.
    "q_tpcds_freq_max_gate" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d).createOrReplaceTempView("t6f_lineitem")
      T.orders(s, d).createOrReplaceTempView("t6f_orders")
      T.customer(s, d).createOrReplaceTempView("t6f_customer")
      s.sql("""
        WITH freq_items AS (
          SELECT l_partkey FROM t6f_lineitem
          GROUP BY l_partkey HAVING count(*) > 8),
        cust_sales AS (
          SELECT o_custkey,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) AS csales
          FROM t6f_lineitem JOIN t6f_orders ON l_orderkey = o_orderkey
          GROUP BY o_custkey),
        best_cust AS (
          SELECT o_custkey FROM cust_sales
          WHERE 2 * csales > (SELECT max(csales) FROM cust_sales))
        SELECT c_name, channel,
               CAST(sum(cents) AS BIGINT) AS sales_cents
        FROM (
          SELECT o_custkey, 'URGENT' AS channel,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
          FROM t6f_lineitem JOIN t6f_orders ON l_orderkey = o_orderkey
          WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
            AND l_partkey IN (SELECT l_partkey FROM freq_items)
            AND o_custkey IN (SELECT o_custkey FROM best_cust)
          UNION ALL
          SELECT o_custkey, 'ROUTINE' AS channel,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
          FROM t6f_lineitem JOIN t6f_orders ON l_orderkey = o_orderkey
          WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
            AND l_partkey IN (SELECT l_partkey FROM freq_items)
            AND o_custkey IN (SELECT o_custkey FROM best_cust)) u
        JOIN t6f_customer ON u.o_custkey = c_custkey
        GROUP BY c_name, channel""")
    }),

    // q64 full shape: per-(part, year) aggregates paired with the
    // SAME part's next year under a strict growth gate (next year's
    // revenue > this year's). The reference (and the oracle SQL)
    // self-join the grouped CTE on (part, yr+1) — two scans of the
    // aggregate, one extra shuffle. The Spark-first form is a LEAD
    // window over the single grouped pass, partitioned by part and
    // ordered by year, gated on lead(yr) == yr + 1 — one fact scan,
    // one agg shuffle, one window shuffle on part. Exact BIGINT
    // comparison throughout.
    "q_tpcds_crossyear_pair" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val py = T.lineitem(s, d)
        .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_partkey", year($"o_orderdate").cast("long").as("yr"))
        .agg(sum(round($"l_extendedprice" * 100).cast("long")).as("rev_cents"),
          count(lit(1)).as("n_lines"))
      val w = Window.partitionBy($"l_partkey").orderBy($"yr")
      py.withColumn("next_yr", lead($"yr", 1).over(w))
        .withColumn("rev2", lead($"rev_cents", 1).over(w))
        .withColumn("n2", lead($"n_lines", 1).over(w))
        .filter($"next_yr" === $"yr" + 1 && $"rev2" > $"rev_cents")
        .join(T.part(s, d), $"l_partkey" === $"p_partkey")
        .select($"p_brand", $"l_partkey".as("partkey"), $"yr".as("yr1"),
          $"rev_cents".as("rev1"), $"rev2", $"n_lines".as("n1"), $"n2")
    }),

    // q50 shape: composite-key fact-to-fact join — every shipped line
    // matched against the RETURN fact at (orderkey, partkey, suppkey)
    // granularity (the reference matches store_returns to store_sales
    // on (ticket, item, customer) — a composite key that is NOT the
    // sales-side primary key) — feeding a 5-bucket ship-to-order
    // latency matrix in ONE aggregate (conditional sums over day
    // buckets). The return side deduplicates to distinct key tuples
    // first so the join is a genuine 3-column equi join, not a
    // degenerate PK self-match.
    "q_tpcds_latency_matrix" -> ((s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
      val ret = li.filter($"l_returnflag" === "R")
        .select($"l_orderkey".as("r_orderkey"), $"l_partkey".as("r_partkey"),
          $"l_suppkey".as("r_suppkey"))
        .distinct()
      val lag = datediff($"l_shipdate", $"o_orderdate")
      def bucket(cond: org.apache.spark.sql.Column) =
        sum(when(cond, 1L).otherwise(0L))
      li.join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(ret, $"l_orderkey" === $"r_orderkey" &&
          $"l_partkey" === $"r_partkey" && $"l_suppkey" === $"r_suppkey")
        .join(T.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name")
        .agg(bucket(lag <= 30).as("d30"),
          bucket(lag > 30 && lag <= 60).as("d60"),
          bucket(lag > 60 && lag <= 90).as("d90"),
          bucket(lag > 90 && lag <= 120).as("d120"),
          bucket(lag > 120).as("dmore"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q_tpcds_state_ret_detail" ->
      """WITH ctr AS (
           SELECT o_custkey AS ctr_cust, c_nationkey AS ctr_nation,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS ctr_ret_cents
           FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           WHERE l_returnflag = 'R'
           GROUP BY o_custkey, c_nationkey),
         nat AS (
           SELECT ctr_nation AS nat_key,
                  CAST(sum(ctr_ret_cents) AS BIGINT) AS nat_tot,
                  count(*) AS nat_n
           FROM ctr GROUP BY ctr_nation)
         SELECT c_custkey, c_name, c_mktsegment, ctr_ret_cents
         FROM ctr
         JOIN nat ON ctr_nation = nat_key
         JOIN customer ON ctr_cust = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         WHERE ctr_ret_cents * 10 * nat_n > 12 * nat_tot
           AND n_name = 'NATION_2'""",
    "q_tpcds_below_avg" ->
      """WITH sc AS (
           SELECT l_suppkey, l_partkey,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
           FROM lineitem GROUP BY l_suppkey, l_partkey),
         sb AS (
           SELECT l_suppkey AS sb_supp,
                  CAST(sum(rev_cents) AS BIGINT) AS sb_tot,
                  count(*) AS sb_n
           FROM sc GROUP BY l_suppkey)
         SELECT s_name, p_name, rev_cents
         FROM sc
         JOIN sb ON l_suppkey = sb_supp
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN part     ON l_partkey = p_partkey
         WHERE rev_cents * sb_n * 10 <= sb_tot""",
    "q_tpcds_dualdim_disjunct" ->
      """SELECT o_orderpriority,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS price_cents,
                count(*) AS n_lines
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation   ON c_nationkey = n_nationkey
         WHERE ((c_mktsegment = 'BUILDING' AND c_nationkey = s_nationkey
                 AND l_extendedprice BETWEEN 10000 AND 40000)
             OR (c_mktsegment = 'MACHINERY' AND c_nationkey <> s_nationkey
                 AND l_extendedprice BETWEEN 20000 AND 60000)
             OR (c_mktsegment = 'HOUSEHOLD' AND c_nationkey = s_nationkey
                 AND l_extendedprice BETWEEN 30000 AND 80000))
           AND ((n_regionkey = 0 AND l_quantity BETWEEN 10 AND 30)
             OR (n_regionkey = 1 AND l_quantity BETWEEN 20 AND 40)
             OR (n_regionkey = 2 AND l_quantity BETWEEN 5 AND 45))
         GROUP BY o_orderpriority""",
    "q_tpcds_hidden_groupkey" ->
      """SELECT s_name,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS loss_cents
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation   ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND ((c_mktsegment = 'BUILDING' AND o_orderstatus = 'F')
             OR (c_mktsegment = 'AUTOMOBILE' AND o_orderstatus = 'O'))
           AND n_regionkey <= 2
         GROUP BY s_name, c_mktsegment, o_orderstatus""",
    "q_tpcds_freq_max_gate" ->
      """WITH freq_items AS (
           SELECT l_partkey FROM lineitem
           GROUP BY l_partkey HAVING count(*) > 8),
         cust_sales AS (
           SELECT o_custkey,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS csales
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY o_custkey),
         best_cust AS (
           SELECT o_custkey FROM cust_sales
           WHERE 2 * csales > (SELECT max(csales) FROM cust_sales))
         SELECT c_name, channel,
                CAST(sum(cents) AS BIGINT) AS sales_cents
         FROM (
           SELECT o_custkey, 'URGENT' AS channel,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
             AND l_partkey IN (SELECT l_partkey FROM freq_items)
             AND o_custkey IN (SELECT o_custkey FROM best_cust)
           UNION ALL
           SELECT o_custkey, 'ROUTINE' AS channel,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             AND l_partkey IN (SELECT l_partkey FROM freq_items)
             AND o_custkey IN (SELECT o_custkey FROM best_cust)) u
         JOIN customer ON u.o_custkey = c_custkey
         GROUP BY c_name, channel""",
    "q_tpcds_crossyear_pair" ->
      """WITH py AS (
           SELECT l_partkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents,
                  count(*) AS n_lines
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY l_partkey, year(o_orderdate))
         SELECT p_brand, y1.l_partkey AS partkey, y1.yr AS yr1,
                y1.rev_cents AS rev1, y2.rev_cents AS rev2,
                y1.n_lines AS n1, y2.n_lines AS n2
         FROM py y1
         JOIN py y2 ON y1.l_partkey = y2.l_partkey AND y2.yr = y1.yr + 1
         JOIN part ON y1.l_partkey = p_partkey
         WHERE y2.rev_cents > y1.rev_cents""",
    "q_tpcds_latency_matrix" ->
      """SELECT s_name,
                CAST(sum(CASE WHEN lag <= 30 THEN 1 ELSE 0 END) AS BIGINT)
                  AS d30,
                CAST(sum(CASE WHEN lag > 30 AND lag <= 60 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d60,
                CAST(sum(CASE WHEN lag > 60 AND lag <= 90 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d90,
                CAST(sum(CASE WHEN lag > 90 AND lag <= 120 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d120,
                CAST(sum(CASE WHEN lag > 120 THEN 1 ELSE 0 END) AS BIGINT)
                  AS dmore
         FROM (
           SELECT s_name,
                  datediff('day', o_orderdate, l_shipdate) AS lag
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN (SELECT DISTINCT l_orderkey AS r_orderkey,
                        l_partkey AS r_partkey, l_suppkey AS r_suppkey
                 FROM lineitem WHERE l_returnflag = 'R') r
             ON l_orderkey = r_orderkey AND l_partkey = r_partkey
            AND l_suppkey = r_suppkey
           JOIN supplier ON l_suppkey = s_suppkey) t
         GROUP BY s_name"""
  )
}
