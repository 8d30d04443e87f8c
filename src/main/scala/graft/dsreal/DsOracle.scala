package graft.dsreal

/** DuckDB-side mirror of [[DsTables]]: a WITH-clause prelude that
  * rebuilds the derived TPC-DS tables column-for-column from the same
  * parquet inputs (the driver registers orders/lineitem/part/customer
  * as views). Every q_dsreal_* oracle is `prelude + real query text`,
  * so the DuckDB gate checks the REAL TPC-DS semantics end-to-end.
  *
  * Parity rules with the Spark derivation (DsTables):
  *  - all money is BIGINT cents via CAST(round(x*100) AS BIGINT) — the
  *    repo-wide proven formula;
  *  - integer division is `//` here and `div` in Spark (identical on
  *    the all-positive operands used);
  *  - the CTE is named customer_dim (a CTE named `customer` would
  *    self-reference the view it reads from).
  */
object DsOracle {

  /** WITH-clause body (no trailing comma); append ", <more CTEs>" or
    * close with the query. */
  val prelude: String = """WITH date_dim AS (
  SELECT d_date_sk, d_date,
         CAST(year(d_date) AS INT) AS d_year,
         CAST(month(d_date) AS INT) AS d_moy,
         CAST(day(d_date) AS INT) AS d_dom,
         CAST((month(d_date) - 1) // 3 + 1 AS INT) AS d_qoy,
         CAST((year(d_date) - 1995) * 12 + month(d_date) - 1 AS BIGINT)
           AS d_month_seq,
         d_date_sk // 7 AS d_week_seq,
         CAST(d_date_sk % 7 AS INT) AS d_dow
  FROM (SELECT i AS d_date_sk, DATE '1995-01-01' + CAST(i AS INT) AS d_date
        FROM range(0, 2557) t(i))),
item AS (
  SELECT p_partkey AS i_item_sk, p_name AS i_item_desc,
         p_name AS i_product_name, p_brand AS i_brand,
         CAST(substr(p_brand, 7) AS INT) AS i_brand_id,
         split_part(p_name, ' ', 2) AS i_class,
         p_type AS i_category,
         CAST(p_partkey % 50 AS INT) AS i_manufact_id,
         CASE split_part(p_name, ' ', 2)
              WHEN 'anvil' THEN 1 WHEN 'bolt' THEN 2 WHEN 'gear' THEN 3
              WHEN 'gizmo' THEN 4 WHEN 'plate' THEN 5 WHEN 'ring' THEN 6
              WHEN 'rod' THEN 7 ELSE 8 END AS i_class_id,
         CASE p_type
              WHEN 'ECONOMY' THEN 1 WHEN 'LARGE' THEN 2 WHEN 'MEDIUM' THEN 3
              WHEN 'PROMO' THEN 4 WHEN 'SMALL' THEN 5 ELSE 6 END
           AS i_category_id
  FROM part),
customer_dim AS (
  SELECT c_custkey AS c_customer_sk, c_name AS c_customer_id,
         'First' || CAST(c_custkey % 97 AS VARCHAR) AS c_first_name,
         'Last' || CAST(c_custkey % 89 AS VARCHAR) AS c_last_name,
         c_custkey % 2557 AS c_first_sales_date_sk,
         (c_custkey * 7) % 2557 AS c_first_shipto_date_sk
  FROM customer),
store AS (
  SELECT i AS s_store_sk, 'S' || CAST(i AS VARCHAR) AS s_store_id,
         'Store_' || CAST(i AS VARCHAR) AS s_store_name,
         CASE i % 5 WHEN 0 THEN 'TN' WHEN 1 THEN 'CA' WHEN 2 THEN 'NY'
              WHEN 3 THEN 'TX' ELSE 'WA' END AS s_state,
         'Z' || CAST(i % 5 AS VARCHAR) AS s_zip
  FROM range(1, 11) t(i)),
catalog_page AS (
  SELECT i AS cp_catalog_page_sk,
         'CP' || CAST(i AS VARCHAR) AS cp_catalog_page_id
  FROM range(1, 11) t(i)),
web_site AS (
  SELECT i AS web_site_sk, 'WS' || CAST(i AS VARCHAR) AS web_site_id
  FROM range(1, 11) t(i)),
ds_base AS (
  SELECT *,
         ext_cents // qty AS sales_price_cents,
         (ext_cents * 11) // 10 AS list_price_cents,
         (ext_cents * (60 + item_sk % 30)) // 100 AS wholesale_cost_cents,
         ext_cents - (ext_cents * (60 + item_sk % 30)) // 100
           AS net_profit_cents,
         (qty + 1) // 2 AS ret_qty,
         ext_cents // 2 AS ret_amt_cents
  FROM (SELECT l_orderkey % 3 AS chan,
               CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT)
                 AS sold_date_sk,
               l_partkey AS item_sk, o_custkey AS customer_sk,
               CAST(1 + (l_suppkey % 10) AS BIGINT) AS store_sk,
               l_orderkey * 8 + l_linenumber AS ticket,
               CAST(l_quantity AS BIGINT) AS qty,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS ext_cents,
               l_returnflag = 'R' AS returned
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)),
store_sales AS (
  SELECT sold_date_sk AS ss_sold_date_sk, item_sk AS ss_item_sk,
         customer_sk AS ss_customer_sk, store_sk AS ss_store_sk,
         ticket AS ss_ticket_number, qty AS ss_quantity,
         sales_price_cents AS ss_sales_price_cents,
         list_price_cents AS ss_list_price_cents,
         ext_cents AS ss_ext_sales_price_cents,
         wholesale_cost_cents AS ss_wholesale_cost_cents,
         net_profit_cents AS ss_net_profit_cents
  FROM ds_base WHERE chan = 0),
catalog_sales AS (
  SELECT sold_date_sk AS cs_sold_date_sk, item_sk AS cs_item_sk,
         customer_sk AS cs_bill_customer_sk, store_sk AS cs_store_sk,
         ticket AS cs_order_number, qty AS cs_quantity,
         sales_price_cents AS cs_sales_price_cents,
         list_price_cents AS cs_list_price_cents,
         ext_cents AS cs_ext_sales_price_cents,
         wholesale_cost_cents AS cs_wholesale_cost_cents,
         net_profit_cents AS cs_net_profit_cents
  FROM ds_base WHERE chan = 1),
web_sales AS (
  SELECT sold_date_sk AS ws_sold_date_sk, item_sk AS ws_item_sk,
         customer_sk AS ws_bill_customer_sk, store_sk AS ws_store_sk,
         ticket AS ws_order_number, qty AS ws_quantity,
         sales_price_cents AS ws_sales_price_cents,
         list_price_cents AS ws_list_price_cents,
         ext_cents AS ws_ext_sales_price_cents,
         wholesale_cost_cents AS ws_wholesale_cost_cents,
         net_profit_cents AS ws_net_profit_cents
  FROM ds_base WHERE chan = 2),
store_returns AS (
  SELECT item_sk AS sr_item_sk, ticket AS sr_ticket_number,
         sold_date_sk + 30 AS sr_returned_date_sk, store_sk AS sr_store_sk,
         ret_qty AS sr_return_quantity, ret_amt_cents AS sr_return_amt_cents,
         ret_amt_cents // 10 AS sr_net_loss_cents
  FROM ds_base WHERE chan = 0 AND returned),
catalog_returns AS (
  SELECT item_sk AS cr_item_sk, ticket AS cr_order_number,
         sold_date_sk + 30 AS cr_returned_date_sk, store_sk AS cr_store_sk,
         ret_qty AS cr_return_quantity, ret_amt_cents AS cr_return_amt_cents,
         ret_amt_cents // 10 AS cr_net_loss_cents
  FROM ds_base WHERE chan = 1 AND returned),
web_returns AS (
  SELECT item_sk AS wr_item_sk, ticket AS wr_order_number,
         sold_date_sk + 30 AS wr_returned_date_sk, store_sk AS wr_store_sk,
         ret_qty AS wr_return_quantity, ret_amt_cents AS wr_return_amt_cents,
         ret_amt_cents // 10 AS wr_net_loss_cents
  FROM ds_base WHERE chan = 2 AND returned)"""
}
