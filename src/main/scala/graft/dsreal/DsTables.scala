package graft.dsreal

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic TPC-DS star schema DERIVED from the driver's TPC-H
  * tables, so the reference's actual TPC-DS query texts
  * (flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query sql texts,
  * the 103 queries TpcdsTestProgram.java:137 validates against
  * answer_set/) can run with their REAL schema and semantics — not as
  * same-shape analogs — while staying DuckDB-oracle-checkable: every
  * derivation below is mirrored column-for-column by the SQL fragments
  * in [[DsOracle]], so the oracle rebuilds the identical tables from
  * the same parquet inputs.
  *
  * Schema mapping (TPC-DS <- TPC-H):
  *  - date_dim: one row per day 1995-01-01..2001-12-31 (the orders
  *    date range); d_date_sk = days since 1995-01-01; week/month
  *    sequences are exact integer arithmetic on that epoch.
  *  - item <- part: brand id parsed from 'Brand#N'; class = 2nd word
  *    of p_name (8 values); category = p_type (6 values); the id
  *    columns are CASE-mapped so both engines agree exactly.
  *  - customer <- customer: synthetic first/last names (deterministic
  *    mod-N suffixes) since TPC-H has a single c_name.
  *  - store: 10 synthetic rows; s_state cycles 5 US states.
  *  - fact channels <- lineitem x orders, split by l_orderkey % 3 into
  *    store(0)/catalog(1)/web(2) — items and customers appear in all
  *    channels (via different orders), which the cross-channel queries
  *    (q14 INTERSECT, q23, q78) require.
  *  - *_returns <- the channel's rows with l_returnflag = 'R', keyed
  *    exactly like their sale (item_sk + ticket/order number), so
  *    sale<->return joins behave like dsdgen output.
  *  - ALL money columns are integer CENTS (BIGINT, the repo-wide
  *    discipline): ext_sales_price = round(l_extendedprice*100);
  *    sales_price = ext div qty; list = (ext*11) div 10; wholesale =
  *    (ext*(60+item_sk%30)) div 100 (item-varying, so margin queries
  *    don't degenerate to a constant); net_profit = ext - wholesale.
  *    Positive operands
  *    throughout, so Spark `div` and DuckDB `//` agree bit-for-bit.
  *
  * Scale posture: every table is a projection/filter of the base scan
  * (no shuffle added by the derivation itself); the facts inherit
  * lineitem's partitioning and the dims stay broadcast-sized.
  */
object DsTables {

  val Epoch = "1995-01-01"
  val Days = 2557 // 1995-01-01 .. 2001-12-31 inclusive (leap 1996, 2000)

  def dateDim(s: SparkSession): DataFrame = {
    import s.implicits._
    s.range(0, Days).select(
      $"id".as("d_date_sk"),
      date_add(lit(Epoch).cast("date"), $"id".cast("int")).as("d_date"))
      .withColumn("d_year", year($"d_date"))
      .withColumn("d_moy", month($"d_date"))
      .withColumn("d_dom", dayofmonth($"d_date"))
      // `div` (integer), NOT `/` — Spark's `/` on Columns is always
      // double division, which would fragment the quarter into
      // fractional values and silently change every d_qoy grouping
      .withColumn("d_qoy", expr("(month(d_date) - 1) div 3 + 1").cast("int"))
      .withColumn("d_month_seq",
        (($"d_year" - 1995) * 12 + $"d_moy" - 1).cast("long"))
      .withColumn("d_week_seq", expr("d_date_sk div 7"))
      // 1995-01-01 (the epoch) was a Sunday, so weeks [d_week_seq]
      // start on Sunday and d_dow = 0 IS Sunday — both exact integer
      // arithmetic, no engine-specific week/dow numbering involved
      .withColumn("d_dow", expr("d_date_sk % 7").cast("int"))
  }

  def item(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    T.part(s, d).select(
      $"p_partkey".as("i_item_sk"),
      $"p_name".as("i_item_desc"),
      $"p_name".as("i_product_name"),
      $"p_brand".as("i_brand"),
      substring($"p_brand", 7, 10).cast("int").as("i_brand_id"),
      element_at(split($"p_name", " "), 2).as("i_class"),
      element_at(split($"p_name", " "), 2).as("i_class_name"),
      $"p_type".as("i_category"),
      ($"p_partkey" % 50).cast("int").as("i_manufact_id"))
      .withColumn("i_class_id",
        when($"i_class" === "anvil", 1).when($"i_class" === "bolt", 2)
          .when($"i_class" === "gear", 3).when($"i_class" === "gizmo", 4)
          .when($"i_class" === "plate", 5).when($"i_class" === "ring", 6)
          .when($"i_class" === "rod", 7).otherwise(8))
      .withColumn("i_category_id",
        when($"i_category" === "ECONOMY", 1).when($"i_category" === "LARGE", 2)
          .when($"i_category" === "MEDIUM", 3).when($"i_category" === "PROMO", 4)
          .when($"i_category" === "SMALL", 5).otherwise(6))
      .drop("i_class_name")
  }

  def customerDim(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    T.customer(s, d).select(
      $"c_custkey".as("c_customer_sk"),
      $"c_name".as("c_customer_id"),
      concat(lit("First"), ($"c_custkey" % 97).cast("string"))
        .as("c_first_name"),
      concat(lit("Last"), ($"c_custkey" % 89).cast("string"))
        .as("c_last_name"),
      // deterministic first-activity dates inside date_dim's range,
      // for q64's d2/d3 date roles
      ($"c_custkey" % Days).as("c_first_sales_date_sk"),
      (($"c_custkey" * 7) % Days).as("c_first_shipto_date_sk"))
  }

  def store(s: SparkSession): DataFrame = {
    import s.implicits._
    s.range(1, 11).select(
      $"id".as("s_store_sk"),
      concat(lit("S"), $"id".cast("string")).as("s_store_id"),
      concat(lit("Store_"), $"id".cast("string")).as("s_store_name"),
      when($"id" % 5 === 0, "TN").when($"id" % 5 === 1, "CA")
        .when($"id" % 5 === 2, "NY").when($"id" % 5 === 3, "TX")
        .otherwise("WA").as("s_state"),
      concat(lit("Z"), ($"id" % 5).cast("string")).as("s_zip"))
  }

  /** catalog_page / web_site: the catalog and web channels' id dims
    * (the real schema's analogs of store), keyed by the same 1..10
    * surrogate the facts carry in *_store_sk. */
  def catalogPage(s: SparkSession): DataFrame = {
    import s.implicits._
    s.range(1, 11).select(
      $"id".as("cp_catalog_page_sk"),
      concat(lit("CP"), $"id".cast("string")).as("cp_catalog_page_id"))
  }
  def webSite(s: SparkSession): DataFrame = {
    import s.implicits._
    s.range(1, 11).select(
      $"id".as("web_site_sk"),
      concat(lit("WS"), $"id".cast("string")).as("web_site_id"))
  }

  /** lineitem x orders with the channel split key and every derived
    * measure, the single scan all six fact tables project from. */
  private def base(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    T.lineitem(s, d)
      .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .select(
        ($"l_orderkey" % 3).as("chan"),
        datediff(to_date($"o_orderdate"), lit(Epoch).cast("date"))
          .cast("long").as("sold_date_sk"),
        $"l_partkey".as("item_sk"),
        $"o_custkey".as("customer_sk"),
        (lit(1) + $"l_suppkey" % 10).cast("long").as("store_sk"),
        ($"l_orderkey" * 8 + $"l_linenumber").as("ticket"),
        $"l_quantity".cast("long").as("qty"),
        round($"l_extendedprice" * 100).cast("long").as("ext_cents"),
        ($"l_returnflag" === "R").as("returned"))
      .withColumn("sales_price_cents", expr("ext_cents div qty"))
      .withColumn("list_price_cents", expr("(ext_cents * 11) div 10"))
      // wholesale fraction varies 60-89% BY ITEM so margins differ
      // across items (a flat fraction would make every gross-margin
      // query degenerate to a constant)
      .withColumn("wholesale_cost_cents",
        expr("(ext_cents * (60 + item_sk % 30)) div 100"))
      .withColumn("net_profit_cents",
        col("ext_cents") - col("wholesale_cost_cents"))
      .withColumn("ret_qty", expr("(qty + 1) div 2"))
      .withColumn("ret_amt_cents", expr("ext_cents div 2"))
  }

  private def sales(s: SparkSession, d: String, chan: Int, p: String,
      custCol: String, orderCol: String): DataFrame =
    base(s, d).filter(col("chan") === chan).select(
      col("sold_date_sk").as(s"${p}_sold_date_sk"),
      col("item_sk").as(s"${p}_item_sk"),
      col("customer_sk").as(custCol),
      col("store_sk").as(s"${p}_store_sk"),
      col("ticket").as(orderCol),
      col("qty").as(s"${p}_quantity"),
      col("sales_price_cents").as(s"${p}_sales_price_cents"),
      col("list_price_cents").as(s"${p}_list_price_cents"),
      col("ext_cents").as(s"${p}_ext_sales_price_cents"),
      col("wholesale_cost_cents").as(s"${p}_wholesale_cost_cents"),
      col("net_profit_cents").as(s"${p}_net_profit_cents"))

  private def returns(s: SparkSession, d: String, chan: Int, p: String,
      orderCol: String): DataFrame =
    base(s, d).filter(col("chan") === chan && col("returned")).select(
      col("item_sk").as(s"${p}_item_sk"),
      col("ticket").as(orderCol),
      (col("sold_date_sk") + 30).as(s"${p}_returned_date_sk"),
      col("store_sk").as(s"${p}_store_sk"),
      col("ret_qty").as(s"${p}_return_quantity"),
      col("ret_amt_cents").as(s"${p}_return_amt_cents"),
      // q5's net_loss: return-handling cost, a deterministic fraction
      expr("ret_amt_cents div 10").as(s"${p}_net_loss_cents"))

  def storeSales(s: SparkSession, d: String): DataFrame =
    sales(s, d, 0, "ss", "ss_customer_sk", "ss_ticket_number")
  def catalogSales(s: SparkSession, d: String): DataFrame =
    sales(s, d, 1, "cs", "cs_bill_customer_sk", "cs_order_number")
  def webSales(s: SparkSession, d: String): DataFrame =
    sales(s, d, 2, "ws", "ws_bill_customer_sk", "ws_order_number")

  def storeReturns(s: SparkSession, d: String): DataFrame =
    returns(s, d, 0, "sr", "sr_ticket_number")
  def catalogReturns(s: SparkSession, d: String): DataFrame =
    returns(s, d, 1, "cr", "cr_order_number")
  def webReturns(s: SparkSession, d: String): DataFrame =
    returns(s, d, 2, "wr", "wr_order_number")
}
