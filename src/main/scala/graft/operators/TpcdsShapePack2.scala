package graft.operators

import graft.{QueryPack, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-DS shape battery, second wave (SURVEY §5). The reference
  * validates 103 TPC-DS queries (flink-end-to-end-tests/
  * flink-tpcds-test/tpcds-tool/query/, TpcdsTestProgram.java:137);
  * TpcdsShapePack covers the first 35 distinct plan shapes — this
  * pack adds the families the round-7 review called out as still
  * missing, re-expressed on the driver's star schema:
  *
  *   - q5/q77/q80 full form: multi-channel ROLLUP with per-column
  *     `grouping()` output flags — once as a single-scan derived
  *     channel column (the Spark-first form), once as a genuine
  *     3-frame UNION of per-channel dim chains feeding one rollup,
  *   - q75: 3-channel UNION ALL (each channel with its own dim
  *     chain) + prior-year self-join decline report,
  *   - q68/q73: per-order aggregate profile (line count + DISTINCT
  *     supplier count) re-joined to customers with a windowed
  *     qualifying-order count,
  *   - q89: share-of-whole deviation — monthly brand sales vs the
  *     brand's window average, cross-multiplied in BIGINT,
  *   - q98: item revenue share within its class via a window sum,
  *   - q33/q56/q60: three differently-filtered channel aggregates
  *     UNIONed then re-aggregated per brand,
  *   - q39: coefficient-of-variation self-join across consecutive
  *     months (variance test done entirely in BIGINT moments),
  *   - q21: before/after-pivot quantity ratio bands per
  *     (supplier, part),
  *   - q46/q68: per-order foreign-supplier line counts joined back
  *     to the customer dimension,
  *   - q13/q48: one-scan aggregate under a 3-arm disjunctive
  *     segment x quantity-band predicate,
  *   - q66: 12-month pivoted conditional sums per supplier,
  *   - q58: items whose three channel revenues are mutually
  *     balanced around the 3-channel mean,
  *   - q61: promo-vs-total revenue ratio as a single-scan pair of
  *     conditional sums (TPC-DS phrases it as two scalar
  *     subqueries cross-joined — two scans),
  *   - q37/q82: item availability — price-band parts shipped by at
  *     least two distinct suppliers inside a date window,
  *   - q64-lite: discounted year-1 purchases vs full-price year-2
  *     sales of the same part, unit-price growth cross-multiplied.
  *
  * Money determinism follows TpcdsShapePack: every monetary
  * aggregate quantizes to integer CENTS before summing, ratios are
  * half-up integer ppm (`(1000000*x + tot div 2) div tot`), and
  * every comparison that TPC-DS writes as a float ratio is
  * cross-multiplied in BIGINT so no engine's float rounding can
  * flip a row in or out of the result.
  */
object TpcdsShapePack2 extends QueryPack {

  private def centsCol(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q5/q80 shape, Spark-first form: the three sales channels are a
    // DERIVED column over one fact scan (TPC-DS materializes three
    // channel tables; here priority class plays that role), rolled up
    // with per-column grouping() flags. ONE scan, ONE Expand.
    "q_tpcds_channel_rollup" -> ((s, d) => {
      import s.implicits._
      val sales = sum(centsCol($"l_extendedprice" * (lit(1) - $"l_discount")))
      val returns = sum(when($"l_returnflag" === "R",
        centsCol($"l_extendedprice" * (lit(1) - $"l_discount"))).otherwise(0L))
      T.lineitem(s, d)
        .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(T.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .join(T.nation(s, d), $"s_nationkey" === $"n_nationkey")
        .withColumn("chan",
          when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), "express")
            .when($"o_orderpriority" === "3-MEDIUM", "standard")
            .otherwise("economy"))
        .rollup($"chan", $"n_name")
        .agg(sales.as("sales_cents"),
          returns.as("returns_cents"),
          (sales - returns * 2).as("profit_cents"),
          grouping($"chan").cast("long").as("g_chan"),
          grouping($"n_name").cast("long").as("g_nation"))
    }),

    // q77 shape, full form: three channel frames — each its OWN
    // filtered fact scan joined through its own dim chain — UNION
    // ALL'd at (chan, nation) granularity, then one ROLLUP re-aggregate
    // over the union with grouping() flags. The union members each
    // broadcast their dims; the rollup costs one Expand over the
    // (already tiny) pre-aggregated union.
    "q_tpcds_union_rollup" -> ((s, d) => {
      import s.implicits._
      def channel(prios: Seq[String], name: String) =
        T.lineitem(s, d)
          .join(T.orders(s, d).filter($"o_orderpriority".isin(prios: _*)),
            $"l_orderkey" === $"o_orderkey")
          .join(T.supplier(s, d), $"l_suppkey" === $"s_suppkey")
          .join(T.nation(s, d), $"s_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(sum(centsCol($"l_extendedprice")).as("sales"),
            sum(when($"l_returnflag" === "R", centsCol($"l_extendedprice"))
              .otherwise(0L)).as("rets"))
          .select(lit(name).as("chan"), $"n_name", $"sales", $"rets")
      channel(Seq("1-URGENT", "2-HIGH"), "express")
        .unionAll(channel(Seq("3-MEDIUM"), "standard"))
        .unionAll(channel(Seq("4-NOT SPECIFIED", "5-LOW"), "economy"))
        .rollup($"chan", $"n_name")
        .agg(sum($"sales").as("sales_cents"),
          sum($"rets").as("returns_cents"),
          (sum($"sales") - sum($"rets") * 2).as("profit_cents"),
          grouping($"chan").cast("long").as("g_chan"),
          grouping($"n_name").cast("long").as("g_nation"))
    }),

    // q75 shape: 3-channel UNION ALL (per-channel dim chain to part)
    // at (chan, brand, year), then current-vs-prior-year self-join
    // keeping brands whose quantity DECLINED by more than 10% in a
    // channel (10*qty96 < 9*qty95 — exact BIGINT, no float ratio).
    "q_tpcds_3chan_yoy" -> ((s, d) => {
      import s.implicits._
      def channel(flag: String, name: String) =
        T.lineitem(s, d)
          .filter($"l_returnflag" === flag &&
            year($"l_shipdate").isin(1995, 1996))
          .join(T.part(s, d), $"l_partkey" === $"p_partkey")
          .groupBy($"p_brand", year($"l_shipdate").cast("long").as("yr"))
          .agg(sum($"l_quantity".cast("long")).as("qty"),
            sum(centsCol($"l_extendedprice")).as("amt"))
          .select(lit(name).as("chan"), $"p_brand", $"yr", $"qty", $"amt")
      val all = channel("R", "ret")
        .unionAll(channel("N", "norm"))
        .unionAll(channel("A", "ack"))
      val prev = all.filter($"yr" === 1995)
        .select($"chan", $"p_brand", $"qty".as("qty95"), $"amt".as("amt95"))
      val cur = all.filter($"yr" === 1996)
        .select($"chan", $"p_brand", $"qty".as("qty96"), $"amt".as("amt96"))
      prev.join(cur, Seq("chan", "p_brand"))
        .filter($"qty96" * 10 < $"qty95" * 9)
        .select($"chan", $"p_brand", $"qty95", $"amt95", $"qty96", $"amt96")
    }),

    // q68/q73 shape: per-order profile — line count band (HAVING) plus
    // COUNT(DISTINCT supplier) — joined back through orders to the
    // customer dimension, with a windowed count of qualifying orders
    // per customer gating the output (customers with >= 2 such orders).
    "q_tpcds_order_profile" -> ((s, d) => {
      import s.implicits._
      val profile = T.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("n_lines"),
          countDistinct($"l_suppkey").as("n_supp"),
          sum(centsCol($"l_extendedprice")).as("spend_cents"))
        .filter($"n_lines".between(4, 7))
      profile
        .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .withColumn("n_qual",
          count(lit(1)).over(Window.partitionBy($"c_custkey")))
        .filter($"n_qual" >= 2)
        .select($"c_custkey", $"c_name", $"o_orderkey",
          $"n_lines", $"n_supp", $"spend_cents", $"n_qual")
    }),

    // q89 shape: share-of-whole deviation — monthly 1995 sales per
    // brand vs that brand's across-months mean, keeping months that
    // deviate by more than 30%. |sales - tot/n| > 0.3*(tot/n) is
    // cross-multiplied to 10*|n*sales - tot| > 3*tot: pure BIGINT,
    // so the band edge is exact in both engines.
    "q_tpcds_monthshare" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .filter(year($"l_shipdate") === 1995)
        .join(T.part(s, d), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", month($"l_shipdate").cast("long").as("mon"))
        .agg(sum(centsCol($"l_extendedprice")).as("sales_cents"))
        .withColumn("tot_cents",
          sum($"sales_cents").over(Window.partitionBy($"p_brand")))
        .withColumn("n_months",
          count(lit(1)).over(Window.partitionBy($"p_brand")))
        .filter(abs($"n_months" * $"sales_cents" - $"tot_cents") * 10 >
          $"tot_cents" * 3)
    }),

    // q98 shape: item revenue share within its class — a groupBy to
    // item grain, a window sum to class grain, and a half-up integer
    // ppm share (never a float division).
    "q_tpcds_classshare" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .join(T.part(s, d), $"l_partkey" === $"p_partkey")
        .groupBy($"p_type", $"p_partkey")
        .agg(sum(centsCol($"l_extendedprice")).as("rev_cents"))
        .withColumn("class_cents",
          sum($"rev_cents").over(Window.partitionBy($"p_type")))
        .select($"p_type", $"p_partkey", $"rev_cents", $"class_cents",
          expr("((1000000 * rev_cents) + (class_cents div 2)) div class_cents")
            .as("share_ppm"))
    }),

    // q33/q56/q60 shape: three differently-filtered channel aggregates
    // of the same fact (each with its own part-dimension filter),
    // UNION ALL'd and re-aggregated per brand.
    "q_tpcds_triunion" -> ((s, d) => {
      import s.implicits._
      def slice(p: DataFrame => DataFrame) =
        T.lineitem(s, d)
          .join(p(T.part(s, d)), $"l_partkey" === $"p_partkey")
          .groupBy($"p_brand")
          .agg(sum(centsCol($"l_extendedprice")).as("rev"))
      slice(_.filter($"p_type" === "PROMO"))
        .unionAll(slice(_.filter($"p_size".between(1, 10))))
        .unionAll(slice(_.filter($"p_brand".endsWith("1"))))
        .groupBy($"p_brand")
        .agg(sum($"rev").as("rev_cents"))
    }),

    // q39 shape: coefficient-of-variation self-join. Per (supplier,
    // month-of-1995) the quantity moments n, sum(q), sum(q^2) are exact
    // BIGINTs (quantities are integral); "stdev/mean > 1" — i.e.
    // sample variance > mean^2 — cross-multiplies to
    // n*(n*sxx - sx^2) > (n-1)*sx^2. Consecutive months where BOTH
    // exceed the threshold survive the self-join.
    "q_tpcds_cov" -> ((s, d) => {
      import s.implicits._
      val base = T.lineitem(s, d)
        .filter(year($"l_shipdate") === 1995)
        .groupBy($"l_suppkey", month($"l_shipdate").cast("long").as("mon"))
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity".cast("long")).as("sx"),
          sum(($"l_quantity" * $"l_quantity").cast("long")).as("sxx"))
        .filter($"n" > 1 &&
          $"n" * ($"n" * $"sxx" - $"sx" * $"sx") > ($"n" - 1) * $"sx" * $"sx")
      val m1 = base.select($"l_suppkey", $"mon".as("mon1"),
        $"n".as("n1"), $"sx".as("sx1"), $"sxx".as("sxx1"))
      val m2 = base.select($"l_suppkey", $"mon".as("mon2"),
        $"n".as("n2"), $"sx".as("sx2"), $"sxx".as("sxx2"))
      m1.join(m2, Seq("l_suppkey")).filter($"mon2" === $"mon1" + 1)
        .select($"l_suppkey", $"mon1", $"n1", $"sx1", $"sxx1",
          $"mon2", $"n2", $"sx2", $"sxx2")
    }),

    // q21 shape: before/after-pivot split — 1995 shipped quantity per
    // (supplier, part) on each side of July 1st, kept when the two
    // sides are within a [2/3, 3/2] ratio band (cross-multiplied).
    "q_tpcds_beforeafter" -> ((s, d) => {
      import s.implicits._
      val pivot = to_timestamp(lit("1995-07-01"))
      T.lineitem(s, d)
        .filter(year($"l_shipdate") === 1995)
        .groupBy($"l_suppkey", $"l_partkey")
        .agg(
          sum(when($"l_shipdate" < pivot, $"l_quantity".cast("long"))
            .otherwise(0L)).as("qty_before"),
          sum(when($"l_shipdate" >= pivot, $"l_quantity".cast("long"))
            .otherwise(0L)).as("qty_after"))
        .filter($"qty_before" > 0 && $"qty_after" > 0 &&
          $"qty_after" * 3 >= $"qty_before" * 2 &&
          $"qty_after" * 2 <= $"qty_before" * 3)
    }),

    // q46/q68 trip shape: orders containing lines shipped by a
    // supplier in a DIFFERENT nation than the customer — per-order
    // foreign-line count + spend, joined back to the customer row.
    "q_tpcds_citymismatch" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .join(T.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .groupBy($"c_custkey", $"c_name", $"o_orderkey")
        .agg(
          sum(when($"s_nationkey" =!= $"c_nationkey", 1L).otherwise(0L))
            .as("n_foreign"),
          sum(centsCol($"l_extendedprice")).as("spend_cents"))
        .filter($"n_foreign" > 0)
    }),

    // q13/q48 shape: ONE scan under a 3-arm disjunctive predicate
    // (market segment x quantity band), aggregated without any
    // per-arm rescan. TPC-DS phrases the arms as OR'd conjunctions;
    // Catalyst keeps them one Filter over one join tree.
    "q_tpcds_disjunct" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .filter(
          ($"c_mktsegment" === "BUILDING" && $"l_quantity".between(1, 15)) ||
          ($"c_mktsegment" === "MACHINERY" && $"l_quantity".between(16, 30)) ||
          ($"c_mktsegment" === "AUTOMOBILE" && $"l_quantity".between(31, 50)))
        .agg(count(lit(1)).as("n_rows"),
          sum($"l_quantity".cast("long")).as("qty_sum"),
          sum(centsCol($"l_extendedprice")).as("rev_cents"))
    }),

    // q66 shape: the 12-month pivot — per supplier, one conditional
    // cents sum per 1995 month, ONE scan (TPC-DS writes 12 CASE arms
    // inside two UNIONed channel scans; the single-channel form keeps
    // the shape with one fact pass).
    "q_tpcds_monthpivot" -> ((s, d) => {
      import s.implicits._
      val monthCols = (1 to 12).map { m =>
        sum(when(month($"l_shipdate") === m, centsCol($"l_extendedprice"))
          .otherwise(0L)).as(f"m$m%02d_cents")
      }
      T.lineitem(s, d)
        .filter(year($"l_shipdate") === 1995)
        .join(T.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name")
        .agg(monthCols.head, monthCols.tail: _*)
    }),

    // q58 shape: items whose three channel revenues (return flags
    // R/N/A standing in for store/catalog/web) are mutually balanced:
    // each channel within [0.5x, 1.5x] of the 3-channel mean.
    // ch >= 0.5*avg <=> 6*ch >= (r+n+a); ch <= 1.5*avg <=>
    // 2*ch <= (r+n+a). All BIGINT.
    "q_tpcds_balanced" -> ((s, d) => {
      import s.implicits._
      def chan(f: String) =
        sum(when($"l_returnflag" === f, centsCol($"l_extendedprice"))
          .otherwise(0L))
      T.lineitem(s, d)
        .groupBy($"l_partkey")
        .agg(chan("R").as("amt_r"), chan("N").as("amt_n"),
          chan("A").as("amt_a"))
        .withColumn("tot3", $"amt_r" + $"amt_n" + $"amt_a")
        .filter($"amt_r" > 0 && $"amt_n" > 0 && $"amt_a" > 0 &&
          $"amt_r" * 6 >= $"tot3" && $"amt_r" * 2 <= $"tot3" &&
          $"amt_n" * 6 >= $"tot3" && $"amt_n" * 2 <= $"tot3" &&
          $"amt_a" * 6 >= $"tot3" && $"amt_a" * 2 <= $"tot3")
        .select($"l_partkey", $"amt_r", $"amt_n", $"amt_a")
    }),

    // q61 shape: promo-vs-total revenue ratio. TPC-DS computes the two
    // scalars as separate subqueries cross-joined (two fact scans);
    // the Spark-first form is ONE scan with conditional sums and a
    // half-up integer ppm ratio derived in the projection.
    "q_tpcds_promoratio" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .join(T.orders(s, d).filter(year($"o_orderdate") === 1995),
          $"l_orderkey" === $"o_orderkey")
        .join(T.customer(s, d).filter($"c_mktsegment" === "BUILDING"),
          $"o_custkey" === $"c_custkey")
        .agg(
          sum(when($"l_discount" >= 0.05, centsCol($"l_extendedprice"))
            .otherwise(0L)).as("promo_cents"),
          sum(centsCol($"l_extendedprice")).as("total_cents"))
        .select($"promo_cents", $"total_cents",
          expr("((1000000 * promo_cents) + (total_cents div 2))" +
            " div total_cents").as("promo_ppm"))
    }),

    // q37/q82 shape: item availability — parts in a retail-price band
    // shipped by >= 2 DISTINCT suppliers within a half-year window.
    // The price filter prunes the dimension BEFORE the fact join.
    "q_tpcds_itemavail" -> ((s, d) => {
      import s.implicits._
      val lo = to_timestamp(lit("1995-01-01"))
      val hi = to_timestamp(lit("1995-07-01"))
      T.lineitem(s, d)
        .filter($"l_shipdate" >= lo && $"l_shipdate" < hi)
        .join(T.part(s, d).filter($"p_retailprice".between(905, 915)),
          $"l_partkey" === $"p_partkey")
        .groupBy($"p_partkey", $"p_name")
        .agg(countDistinct($"l_suppkey").as("n_supp"),
          sum($"l_quantity".cast("long")).as("qty_avail"))
        .filter($"n_supp" >= 2)
    }),

    // q64-lite shape: two per-year channel chains over the same part —
    // 1995 deep-discount purchases vs 1996 low-discount sales — joined
    // on the part, kept when the 1996 unit price EXCEEDS the 1995 one
    // (amt96*qty95 > amt95*qty96: the unit-price comparison
    // cross-multiplied so no float division is involved).
    "q_tpcds_salesgap" -> ((s, d) => {
      import s.implicits._
      def yearSlice(y: Int, deep: Boolean, amtOut: String, qtyOut: String) =
        T.lineitem(s, d)
          .filter(year($"l_shipdate") === y &&
            (if (deep) $"l_discount" >= 0.05 else $"l_discount" < 0.05))
          .groupBy($"l_partkey")
          .agg(sum(centsCol($"l_extendedprice")).as(amtOut),
            sum($"l_quantity".cast("long")).as(qtyOut))
      yearSlice(1995, deep = true, "amt95", "qty95")
        .join(yearSlice(1996, deep = false, "amt96", "qty96"),
          Seq("l_partkey"))
        .filter($"amt96" * $"qty95" > $"amt95" * $"qty96")
        .select($"l_partkey", $"amt95", $"qty95", $"amt96", $"qty96")
    })
  )

  def oracle: Map[String, String] = Map(
    "q_tpcds_channel_rollup" ->
      """WITH base AS (
           SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 'express'
                       WHEN o_orderpriority = '3-MEDIUM' THEN 'standard'
                       ELSE 'economy' END AS chan,
                  n_name,
                  CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT) AS net_cents,
                  l_returnflag
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey)
         SELECT chan, n_name,
                CAST(sum(net_cents) AS BIGINT) AS sales_cents,
                CAST(sum(CASE WHEN l_returnflag = 'R' THEN net_cents
                  ELSE 0 END) AS BIGINT) AS returns_cents,
                CAST(sum(net_cents) - 2 * sum(CASE WHEN l_returnflag = 'R'
                  THEN net_cents ELSE 0 END) AS BIGINT) AS profit_cents,
                CAST(GROUPING(chan) AS BIGINT) AS g_chan,
                CAST(GROUPING(n_name) AS BIGINT) AS g_nation
         FROM base
         GROUP BY ROLLUP(chan, n_name)""",
    "q_tpcds_union_rollup" ->
      """WITH chans AS (
           SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 'express'
                       WHEN o_orderpriority = '3-MEDIUM' THEN 'standard'
                       ELSE 'economy' END AS chan,
                  n_name,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS sales,
                  CAST(sum(CASE WHEN l_returnflag = 'R'
                    THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS rets
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           GROUP BY 1, 2)
         SELECT chan, n_name,
                CAST(sum(sales) AS BIGINT) AS sales_cents,
                CAST(sum(rets) AS BIGINT) AS returns_cents,
                CAST(sum(sales) - 2 * sum(rets) AS BIGINT) AS profit_cents,
                CAST(GROUPING(chan) AS BIGINT) AS g_chan,
                CAST(GROUPING(n_name) AS BIGINT) AS g_nation
         FROM chans
         GROUP BY ROLLUP(chan, n_name)""",
    "q_tpcds_3chan_yoy" ->
      """WITH ch AS (
           SELECT CASE l_returnflag WHEN 'R' THEN 'ret'
                    WHEN 'N' THEN 'norm' ELSE 'ack' END AS chan,
                  p_brand,
                  CAST(year(l_shipdate) AS BIGINT) AS yr,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS amt
           FROM lineitem
           JOIN part ON l_partkey = p_partkey
           WHERE year(l_shipdate) IN (1995, 1996)
           GROUP BY 1, 2, 3)
         SELECT p.chan, p.p_brand,
                p.qty AS qty95, p.amt AS amt95,
                c.qty AS qty96, c.amt AS amt96
         FROM (SELECT * FROM ch WHERE yr = 1995) p
         JOIN (SELECT * FROM ch WHERE yr = 1996) c
           ON p.chan = c.chan AND p.p_brand = c.p_brand
         WHERE c.qty * 10 < p.qty * 9""",
    "q_tpcds_order_profile" ->
      """WITH profile AS (
           SELECT l_orderkey,
                  count(*) AS n_lines,
                  count(DISTINCT l_suppkey) AS n_supp,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS spend_cents
           FROM lineitem
           GROUP BY l_orderkey
           HAVING count(*) BETWEEN 4 AND 7),
         joined AS (
           SELECT c_custkey, c_name, o_orderkey,
                  n_lines, n_supp, spend_cents,
                  count(*) OVER (PARTITION BY c_custkey) AS n_qual
           FROM profile
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey)
         SELECT * FROM joined WHERE n_qual >= 2""",
    "q_tpcds_monthshare" ->
      """WITH m AS (
           SELECT p_brand,
                  CAST(month(l_shipdate) AS BIGINT) AS mon,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS sales_cents
           FROM lineitem
           JOIN part ON l_partkey = p_partkey
           WHERE year(l_shipdate) = 1995
           GROUP BY 1, 2),
         w AS (
           SELECT p_brand, mon, sales_cents,
                  CAST(sum(sales_cents) OVER (PARTITION BY p_brand)
                    AS BIGINT) AS tot_cents,
                  count(*) OVER (PARTITION BY p_brand) AS n_months
           FROM m)
         SELECT * FROM w
         WHERE abs(n_months * sales_cents - tot_cents) * 10 > tot_cents * 3""",
    "q_tpcds_classshare" ->
      """WITH item AS (
           SELECT p_type, p_partkey,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
           FROM lineitem
           JOIN part ON l_partkey = p_partkey
           GROUP BY 1, 2),
         w AS (
           SELECT p_type, p_partkey, rev_cents,
                  CAST(sum(rev_cents) OVER (PARTITION BY p_type)
                    AS BIGINT) AS class_cents
           FROM item)
         SELECT p_type, p_partkey, rev_cents, class_cents,
                CAST(((1000000 * rev_cents) + (class_cents // 2))
                  // class_cents AS BIGINT) AS share_ppm
         FROM w""",
    "q_tpcds_triunion" ->
      """WITH u AS (
           SELECT p_brand,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_type = 'PROMO' GROUP BY 1
           UNION ALL
           SELECT p_brand,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_size BETWEEN 1 AND 10 GROUP BY 1
           UNION ALL
           SELECT p_brand,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_brand LIKE '%1' GROUP BY 1)
         SELECT p_brand, CAST(sum(rev) AS BIGINT) AS rev_cents
         FROM u GROUP BY p_brand""",
    "q_tpcds_cov" ->
      """WITH base AS (
           SELECT l_suppkey,
                  CAST(month(l_shipdate) AS BIGINT) AS mon,
                  count(*) AS n,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
                  CAST(sum(CAST(l_quantity * l_quantity AS BIGINT))
                    AS BIGINT) AS sxx
           FROM lineitem
           WHERE year(l_shipdate) = 1995
           GROUP BY 1, 2
           HAVING count(*) > 1
              AND count(*) * (count(*) *
                    CAST(sum(CAST(l_quantity * l_quantity AS BIGINT)) AS BIGINT)
                    - CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                      * CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT))
                  > (count(*) - 1)
                    * CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                    * CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT))
         SELECT m1.l_suppkey,
                m1.mon AS mon1, m1.n AS n1, m1.sx AS sx1, m1.sxx AS sxx1,
                m2.mon AS mon2, m2.n AS n2, m2.sx AS sx2, m2.sxx AS sxx2
         FROM base m1
         JOIN base m2 ON m1.l_suppkey = m2.l_suppkey
                     AND m2.mon = m1.mon + 1""",
    "q_tpcds_beforeafter" ->
      """SELECT l_suppkey, l_partkey,
                CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1995-07-01'
                  THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS qty_before,
                CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1995-07-01'
                  THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS qty_after
         FROM lineitem
         WHERE year(l_shipdate) = 1995
         GROUP BY 1, 2
         HAVING qty_before > 0 AND qty_after > 0
            AND qty_after * 3 >= qty_before * 2
            AND qty_after * 2 <= qty_before * 3""",
    "q_tpcds_citymismatch" ->
      """SELECT c_custkey, c_name, o_orderkey,
                CAST(sum(CASE WHEN s_nationkey <> c_nationkey THEN 1
                  ELSE 0 END) AS BIGINT) AS n_foreign,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS spend_cents
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         GROUP BY 1, 2, 3
         HAVING n_foreign > 0""",
    "q_tpcds_disjunct" ->
      """SELECT count(*) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE (c_mktsegment = 'BUILDING'
                  AND l_quantity BETWEEN 1 AND 15)
            OR (c_mktsegment = 'MACHINERY'
                  AND l_quantity BETWEEN 16 AND 30)
            OR (c_mktsegment = 'AUTOMOBILE'
                  AND l_quantity BETWEEN 31 AND 50)""",
    "q_tpcds_monthpivot" ->
      ("""SELECT s_name, """ +
        (1 to 12).map { m =>
          f"CAST(sum(CASE WHEN month(l_shipdate) = $m THEN " +
            f"CAST(round(l_extendedprice * 100) AS BIGINT) ELSE 0 END) " +
            f"AS BIGINT) AS m$m%02d_cents"
        }.mkString(", ") +
        """ FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           WHERE year(l_shipdate) = 1995
           GROUP BY s_name"""),
    "q_tpcds_balanced" ->
      """WITH ch AS (
           SELECT l_partkey,
                  CAST(sum(CASE WHEN l_returnflag = 'R'
                    THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS amt_r,
                  CAST(sum(CASE WHEN l_returnflag = 'N'
                    THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS amt_n,
                  CAST(sum(CASE WHEN l_returnflag = 'A'
                    THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS amt_a
           FROM lineitem GROUP BY 1)
         SELECT l_partkey, amt_r, amt_n, amt_a FROM ch
         WHERE amt_r > 0 AND amt_n > 0 AND amt_a > 0
           AND amt_r * 6 >= (amt_r + amt_n + amt_a)
           AND amt_r * 2 <= (amt_r + amt_n + amt_a)
           AND amt_n * 6 >= (amt_r + amt_n + amt_a)
           AND amt_n * 2 <= (amt_r + amt_n + amt_a)
           AND amt_a * 6 >= (amt_r + amt_n + amt_a)
           AND amt_a * 2 <= (amt_r + amt_n + amt_a)""",
    "q_tpcds_promoratio" ->
      """WITH agg AS (
           SELECT CAST(sum(CASE WHEN l_discount >= 0.05
                    THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS promo_cents,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           WHERE year(o_orderdate) = 1995
             AND c_mktsegment = 'BUILDING')
         SELECT promo_cents, total_cents,
                CAST(((1000000 * promo_cents) + (total_cents // 2))
                  // total_cents AS BIGINT) AS promo_ppm
         FROM agg""",
    "q_tpcds_itemavail" ->
      """SELECT p_partkey, p_name,
                count(DISTINCT l_suppkey) AS n_supp,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_avail
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           AND l_shipdate < TIMESTAMP '1995-07-01'
           AND p_retailprice BETWEEN 905 AND 915
         GROUP BY 1, 2
         HAVING count(DISTINCT l_suppkey) >= 2""",
    "q_tpcds_salesgap" ->
      """WITH y95 AS (
           SELECT l_partkey,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS amt95,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty95
           FROM lineitem
           WHERE year(l_shipdate) = 1995 AND l_discount >= 0.05
           GROUP BY 1),
         y96 AS (
           SELECT l_partkey,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS amt96,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty96
           FROM lineitem
           WHERE year(l_shipdate) = 1996 AND l_discount < 0.05
           GROUP BY 1)
         SELECT y95.l_partkey, amt95, qty95, amt96, qty96
         FROM y95 JOIN y96 ON y95.l_partkey = y96.l_partkey
         WHERE amt96 * qty95 > amt95 * qty96"""
  )
}
