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
  SELECT p_partkey AS i_item_sk,
         'I' || CAST(p_partkey AS VARCHAR) AS i_item_id,
         p_name AS i_item_desc,
         p_name AS i_product_name, p_brand AS i_brand,
         CAST(substr(p_brand, 7) AS INT) AS i_brand_id,
         split_part(p_name, ' ', 2) AS i_class,
         split_part(p_name, ' ', 1) AS i_color,
         CAST(round(p_retailprice * 100) AS BIGINT) AS i_current_price_cents,
         p_type AS i_category,
         CAST(p_partkey % 50 AS INT) AS i_manufact_id,
         CASE p_size % 4 WHEN 0 THEN 'Each' WHEN 1 THEN 'Dozen'
              WHEN 2 THEN 'Case' ELSE 'Pallet' END AS i_units,
         CAST(p_size AS INT) AS i_size,
         CAST(1 + p_partkey % 20 AS INT) AS i_manager_id,
         CAST(round(p_retailprice * 100) AS BIGINT)
           * (60 + p_partkey % 30) // 100 AS i_wholesale_cost_cents,
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
         (c_custkey * 7) % 2557 AS c_first_shipto_date_sk,
         c_custkey AS c_current_addr_sk,
         1 + c_custkey % 210 AS c_current_cdemo_sk,
         1 + c_custkey % 72 AS c_current_hdemo_sk,
         CASE c_custkey % 4 WHEN 0 THEN 'UNITED STATES'
              WHEN 1 THEN 'CANADA' WHEN 2 THEN 'GERMANY'
              ELSE 'JAPAN' END AS c_birth_country,
         CAST(1924 + c_custkey % 69 AS INT) AS c_birth_year,
         CAST(1 + c_custkey % 12 AS INT) AS c_birth_month
  FROM customer),
customer_address AS (
  SELECT c_custkey AS ca_address_sk,
         CAST(c_custkey % 1000 AS VARCHAR) AS ca_street_number,
         'Street_' || CAST(c_custkey % 97 AS VARCHAR) AS ca_street_name,
         'City_' || CAST(c_custkey % 60 AS VARCHAR) AS ca_city,
         'County_' || CAST(c_custkey % 30 AS VARCHAR) AS ca_county,
         CASE c_nationkey % 10 WHEN 0 THEN 'TN' WHEN 1 THEN 'CA'
              WHEN 2 THEN 'NY' WHEN 3 THEN 'TX' WHEN 4 THEN 'WA'
              WHEN 5 THEN 'GA' WHEN 6 THEN 'OH' WHEN 7 THEN 'KY'
              WHEN 8 THEN 'NM' ELSE 'OR' END AS ca_state,
         'Z' || CAST(c_custkey % 50 AS VARCHAR) AS ca_zip,
         'United States' AS ca_country,
         CAST(-5 - c_nationkey % 4 AS INT) AS ca_gmt_offset
  FROM customer),
customer_demographics AS (
  SELECT i AS cd_demo_sk,
         CASE (i - 1) % 2 WHEN 0 THEN 'M' ELSE 'F' END AS cd_gender,
         CASE ((i - 1) // 2) % 5 WHEN 0 THEN 'M' WHEN 1 THEN 'S'
              WHEN 2 THEN 'D' WHEN 3 THEN 'W' ELSE 'U' END
           AS cd_marital_status,
         CASE ((i - 1) // 10) % 7 WHEN 0 THEN 'Primary'
              WHEN 1 THEN 'Secondary' WHEN 2 THEN 'College'
              WHEN 3 THEN '2 yr Degree' WHEN 4 THEN '4 yr Degree'
              WHEN 5 THEN 'Advanced Degree' ELSE 'Unknown' END
           AS cd_education_status,
         CAST(((i - 1) % 20 + 1) * 500 AS BIGINT) AS cd_purchase_estimate,
         CASE (i - 1) % 4 WHEN 0 THEN 'Good' WHEN 1 THEN 'High Risk'
              WHEN 2 THEN 'Low Risk' ELSE 'Unknown' END AS cd_credit_rating,
         CAST((i - 1) % 7 AS INT) AS cd_dep_count,
         CAST((i - 1) % 5 AS INT) AS cd_dep_employed_count,
         CAST((i - 1) % 3 AS INT) AS cd_dep_college_count
  FROM range(1, 211) t(i)),
household_demographics AS (
  SELECT i AS hd_demo_sk,
         (i - 1) % 20 + 1 AS hd_income_band_sk,
         CASE (i - 1) % 6 WHEN 0 THEN '>10000' WHEN 1 THEN '5001-10000'
              WHEN 2 THEN '1001-5000' WHEN 3 THEN '501-1000'
              WHEN 4 THEN '0-500' ELSE 'Unknown' END AS hd_buy_potential,
         CAST((i - 1) % 10 AS INT) AS hd_dep_count,
         CAST((i - 1) % 6 - 1 AS INT) AS hd_vehicle_count
  FROM range(1, 73) t(i)),
income_band AS (
  SELECT i AS ib_income_band_sk,
         CAST((i - 1) * 10000 AS BIGINT) AS ib_lower_bound,
         CAST(i * 10000 - 1 AS BIGINT) AS ib_upper_bound
  FROM range(1, 21) t(i)),
reason AS (
  SELECT i AS r_reason_sk, 'R' || CAST(i AS VARCHAR) AS r_reason_id,
         'Reason_' || CAST(i AS VARCHAR) AS r_reason_desc
  FROM range(1, 11) t(i)),
web_page AS (
  SELECT i AS wp_web_page_sk, 'WP' || CAST(i AS VARCHAR) AS wp_web_page_id,
         CAST(4900 + i * 40 AS INT) AS wp_char_count
  FROM range(1, 11) t(i)),
time_dim AS (
  SELECT i AS t_time_sk, i AS t_time, CAST(i // 3600 AS INT) AS t_hour,
         CAST((i % 3600) // 60 AS INT) AS t_minute,
         CASE WHEN i // 3600 BETWEEN 6 AND 8 THEN 'breakfast'
              WHEN i // 3600 BETWEEN 11 AND 13 THEN 'lunch'
              WHEN i // 3600 BETWEEN 17 AND 19 THEN 'dinner' END
           AS t_meal_time
  FROM range(0, 86400) t(i)),
ship_mode AS (
  SELECT i AS sm_ship_mode_sk,
         'SM' || CAST(i AS VARCHAR) AS sm_ship_mode_id,
         CASE i WHEN 1 THEN 'EXPRESS' WHEN 2 THEN 'OVERNIGHT'
              WHEN 3 THEN 'REGULAR' WHEN 4 THEN 'TWO DAY'
              ELSE 'LIBRARY' END AS sm_type,
         CASE i WHEN 1 THEN 'DHL' WHEN 2 THEN 'BARIAN' WHEN 3 THEN 'UPS'
              WHEN 4 THEN 'FEDEX' ELSE 'USPS' END AS sm_carrier
  FROM range(1, 6) t(i)),
store AS (
  SELECT i AS s_store_sk, 'S' || CAST(i AS VARCHAR) AS s_store_id,
         'Store_' || CAST(i AS VARCHAR) AS s_store_name,
         CASE i % 5 WHEN 0 THEN 'TN' WHEN 1 THEN 'CA' WHEN 2 THEN 'NY'
              WHEN 3 THEN 'TX' ELSE 'WA' END AS s_state,
         'Z' || CAST(i % 5 AS VARCHAR) AS s_zip,
         'Company_' || CAST(1 + i % 2 AS VARCHAR) AS s_company_name,
         CAST(1 + i % 3 AS INT) AS s_market_id,
         'County_' || CAST(i % 30 AS VARCHAR) AS s_county,
         'City_' || CAST(i % 60 AS VARCHAR) AS s_city,
         CAST(1 + i % 2 AS INT) AS s_company_id,
         CAST(i * 10 AS VARCHAR) AS s_street_number,
         'Street_' || CAST(i % 97 AS VARCHAR) AS s_street_name,
         CASE WHEN i % 2 = 0 THEN 'Ave' ELSE 'Blvd' END AS s_street_type,
         'Suite_' || CAST(i % 10 AS VARCHAR) AS s_suite_number,
         CAST(-5 - i % 3 AS INT) AS s_gmt_offset
  FROM range(1, 11) t(i)),
call_center AS (
  SELECT i AS cc_call_center_sk, 'CC' || CAST(i AS VARCHAR)
           AS cc_call_center_id,
         'CallCenter_' || CAST(i AS VARCHAR) AS cc_name,
         'County_' || CAST(i % 30 AS VARCHAR) AS cc_county,
         'Manager_' || CAST(i % 20 AS VARCHAR) AS cc_manager
  FROM range(1, 11) t(i)),
catalog_page AS (
  SELECT i AS cp_catalog_page_sk,
         'CP' || CAST(i AS VARCHAR) AS cp_catalog_page_id
  FROM range(1, 11) t(i)),
web_site AS (
  SELECT i AS web_site_sk, 'WS' || CAST(i AS VARCHAR) AS web_site_id,
         'Site_' || CAST(i AS VARCHAR) AS web_name,
         'Company_' || CAST(1 + i % 2 AS VARCHAR) AS web_company_name
  FROM range(1, 11) t(i)),
ds_base AS (
  SELECT *,
         net_paid_cents + net_paid_cents // 20 AS net_paid_inc_tax_cents,
         CASE WHEN promo_sk IS NOT NULL THEN discount_cents // 2
              ELSE 0 END AS coupon_cents
  FROM (
  SELECT *,
         ext_cents // qty AS sales_price_cents,
         (ext_cents * 11) // 10 AS list_price_cents,
         (ext_cents * (60 + item_sk % 30)) // 100 AS wholesale_cost_cents,
         ext_cents - (ext_cents * (60 + item_sk % 30)) // 100
           AS net_profit_cents,
         ext_cents * (ticket % 11) // 100 AS discount_cents,
         ext_cents - ext_cents * (ticket % 11) // 100 AS net_paid_cents,
         (qty + 1) // 2 AS ret_qty,
         ext_cents // 2 AS ret_amt_cents,
         (ext_cents // 2) // 50 + 10 AS ret_fee_cents,
         (ext_cents // 2) // 2 AS ret_cash_cents,
         (ext_cents // 2) // 3 AS ret_charge_cents,
         (ext_cents // 2) - (ext_cents // 2) // 2 - (ext_cents // 2) // 3
           AS ret_credit_cents
  FROM (SELECT l_orderkey % 3 AS chan,
               CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT)
                 AS sold_date_sk,
               CAST(CAST(l_shipdate AS DATE) - DATE '1995-01-01' AS BIGINT)
                 AS ship_date_sk,
               l_partkey AS item_sk, o_custkey AS customer_sk,
               CAST(1 + (l_suppkey % 10) AS BIGINT) AS store_sk,
               l_orderkey * 8 + l_linenumber AS ticket,
               CASE WHEN (l_orderkey * 8 + l_linenumber) % 14 < 10
                    THEN 1 + (l_orderkey * 8 + l_linenumber) % 14
                    END AS promo_sk,
               1 + (l_orderkey * 8 + l_linenumber) % 210 AS cdemo_sk,
               1 + (l_orderkey * 8 + l_linenumber) % 72 AS hdemo_sk,
               1 + ((l_orderkey * 8 + l_linenumber) * 3 + 1) % 210
                 AS ret_cdemo_sk,
               1 + (l_orderkey * 8 + l_linenumber) % 10 AS reason_sk,
               (l_orderkey * 8 + l_linenumber) * 7919 % 86400
                 AS sold_time_sk,
               1 + (l_orderkey * 8 + l_linenumber) % 5 AS ship_mode_sk,
               1 + (l_partkey + l_orderkey * 8 + l_linenumber) % 5
                 AS warehouse_sk,
               1 + ((l_orderkey * 8 + l_linenumber) * 3 + 2) % 72
                 AS ship_hdemo_sk,
               CAST(l_quantity AS BIGINT) AS qty,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS ext_cents,
               l_returnflag = 'R' AS returned
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey))),
store_sales AS (
  SELECT sold_date_sk AS ss_sold_date_sk, item_sk AS ss_item_sk,
         customer_sk AS ss_customer_sk,
         CASE WHEN ticket % 47 <> 11 THEN store_sk END AS ss_store_sk,
         cdemo_sk AS ss_cdemo_sk, hdemo_sk AS ss_hdemo_sk,
         CASE WHEN ticket % 23 <> 7 THEN customer_sk END AS ss_addr_sk,
         CASE WHEN ticket % 4 = 0 THEN 1 + (ticket * 13) % 1400
              ELSE customer_sk END AS ss_sold_addr_sk,
         sold_time_sk AS ss_sold_time_sk,
         ticket AS ss_ticket_number, promo_sk AS ss_promo_sk,
         qty AS ss_quantity,
         sales_price_cents AS ss_sales_price_cents,
         list_price_cents AS ss_list_price_cents,
         ext_cents AS ss_ext_sales_price_cents,
         discount_cents AS ss_ext_discount_amt_cents,
         net_paid_cents AS ss_net_paid_cents,
         coupon_cents AS ss_coupon_amt_cents,
         wholesale_cost_cents AS ss_wholesale_cost_cents,
         net_profit_cents AS ss_net_profit_cents
  FROM ds_base WHERE chan = 0),
catalog_sales AS (
  SELECT sold_date_sk AS cs_sold_date_sk, ship_date_sk AS cs_ship_date_sk,
         item_sk AS cs_item_sk,
         customer_sk AS cs_bill_customer_sk, store_sk AS cs_store_sk,
         store_sk AS cs_call_center_sk,
         store_sk AS cs_catalog_page_sk,
         cdemo_sk AS cs_bill_cdemo_sk, hdemo_sk AS cs_bill_hdemo_sk,
         customer_sk AS cs_bill_addr_sk,
         customer_sk AS cs_ship_customer_sk,
         CASE WHEN ticket % 47 <> 11 THEN customer_sk END
           AS cs_ship_addr_sk,
         sold_time_sk AS cs_sold_time_sk,
         ship_mode_sk AS cs_ship_mode_sk,
         warehouse_sk AS cs_warehouse_sk,
         ticket AS cs_order_number, promo_sk AS cs_promo_sk,
         qty AS cs_quantity,
         sales_price_cents AS cs_sales_price_cents,
         list_price_cents AS cs_list_price_cents,
         ext_cents AS cs_ext_sales_price_cents,
         discount_cents AS cs_ext_discount_amt_cents,
         net_paid_cents AS cs_net_paid_cents,
         net_paid_inc_tax_cents AS cs_net_paid_inc_tax_cents,
         coupon_cents AS cs_coupon_amt_cents,
         wholesale_cost_cents AS cs_wholesale_cost_cents,
         net_profit_cents AS cs_net_profit_cents
  FROM ds_base WHERE chan = 1),
web_sales AS (
  SELECT sold_date_sk AS ws_sold_date_sk, ship_date_sk AS ws_ship_date_sk,
         item_sk AS ws_item_sk,
         customer_sk AS ws_bill_customer_sk, store_sk AS ws_store_sk,
         cdemo_sk AS ws_bill_cdemo_sk, hdemo_sk AS ws_bill_hdemo_sk,
         customer_sk AS ws_bill_addr_sk,
         customer_sk AS ws_ship_addr_sk,
         CASE WHEN ticket % 47 <> 11 THEN customer_sk END
           AS ws_ship_customer_sk,
         store_sk AS ws_web_page_sk,
         sold_time_sk AS ws_sold_time_sk,
         ship_mode_sk AS ws_ship_mode_sk,
         warehouse_sk AS ws_warehouse_sk,
         ship_hdemo_sk AS ws_ship_hdemo_sk,
         1 + (store_sk * 3) % 10 AS ws_web_site_sk,
         ticket AS ws_order_number, promo_sk AS ws_promo_sk,
         qty AS ws_quantity,
         sales_price_cents AS ws_sales_price_cents,
         list_price_cents AS ws_list_price_cents,
         ext_cents AS ws_ext_sales_price_cents,
         discount_cents AS ws_ext_discount_amt_cents,
         net_paid_cents AS ws_net_paid_cents,
         coupon_cents AS ws_coupon_amt_cents,
         wholesale_cost_cents AS ws_wholesale_cost_cents,
         net_profit_cents AS ws_net_profit_cents
  FROM ds_base WHERE chan = 2),
store_returns AS (
  SELECT item_sk AS sr_item_sk, ticket AS sr_ticket_number,
         customer_sk AS sr_customer_sk,
         sold_date_sk + 1 + ticket % 146 AS sr_returned_date_sk, store_sk AS sr_store_sk,
         reason_sk AS sr_reason_sk, ret_fee_cents AS sr_fee_cents,
         ret_cash_cents AS sr_refunded_cash_cents,
         ret_charge_cents AS sr_reversed_charge_cents,
         ret_credit_cents AS sr_store_credit_cents,
         ret_qty AS sr_return_quantity, ret_amt_cents AS sr_return_amt_cents,
         ret_cdemo_sk AS sr_cdemo_sk,
         ret_amt_cents // 10 AS sr_net_loss_cents
  FROM ds_base WHERE chan = 0 AND returned),
catalog_returns AS (
  SELECT item_sk AS cr_item_sk, ticket AS cr_order_number,
         customer_sk AS cr_returning_customer_sk,
         sold_date_sk + 1 + ticket % 146 AS cr_returned_date_sk, store_sk AS cr_store_sk,
         reason_sk AS cr_reason_sk, ret_fee_cents AS cr_fee_cents,
         ret_cash_cents AS cr_refunded_cash_cents,
         ret_charge_cents AS cr_reversed_charge_cents,
         ret_credit_cents AS cr_store_credit_cents,
         ret_qty AS cr_return_quantity, ret_amt_cents AS cr_return_amt_cents,
         store_sk AS cr_call_center_sk,
         ret_amt_cents // 10 AS cr_net_loss_cents
  FROM ds_base WHERE chan = 1 AND returned),
web_returns AS (
  SELECT item_sk AS wr_item_sk, ticket AS wr_order_number,
         customer_sk AS wr_returning_customer_sk,
         sold_date_sk + 1 + ticket % 146 AS wr_returned_date_sk, store_sk AS wr_store_sk,
         reason_sk AS wr_reason_sk, ret_fee_cents AS wr_fee_cents,
         ret_cash_cents AS wr_refunded_cash_cents,
         ret_charge_cents AS wr_reversed_charge_cents,
         ret_credit_cents AS wr_store_credit_cents,
         cdemo_sk AS wr_refunded_cdemo_sk,
         ret_cdemo_sk AS wr_returning_cdemo_sk,
         customer_sk AS wr_refunded_addr_sk,
         store_sk AS wr_web_page_sk,
         ret_qty AS wr_return_quantity, ret_amt_cents AS wr_return_amt_cents,
         ret_amt_cents // 10 AS wr_net_loss_cents
  FROM ds_base WHERE chan = 2 AND returned),
warehouse AS (
  SELECT i AS w_warehouse_sk, 'W' || CAST(i AS VARCHAR) AS w_warehouse_id,
         'Warehouse_' || CAST(i AS VARCHAR) AS w_warehouse_name,
         CASE i % 5 WHEN 0 THEN 'TN' WHEN 1 THEN 'CA' WHEN 2 THEN 'NY'
              WHEN 3 THEN 'TX' ELSE 'WA' END AS w_state,
         CAST(i * 1000 + 500 AS INT) AS w_warehouse_sq_ft,
         'City_' || CAST(i % 60 AS VARCHAR) AS w_city,
         'County_' || CAST(i % 30 AS VARCHAR) AS w_county,
         'United States' AS w_country
  FROM range(1, 6) t(i)),
inventory AS (
  SELECT d.d_date_sk AS inv_date_sk, p.p_partkey AS inv_item_sk,
         w.i AS inv_warehouse_sk,
         (p.p_partkey * 13 + (d.d_date_sk // 7) * 7 + w.i * 3) % 100
           + (p.p_partkey % 41) * 5
           + CASE WHEN (p.p_partkey + (d.d_date_sk // 7) * 3 + w.i) % 13 = 0
                  THEN 1000 ELSE 0 END AS inv_quantity_on_hand
  FROM part p
  CROSS JOIN range(1, 6) w(i)
  CROSS JOIN (SELECT d_date_sk FROM date_dim
              WHERE d_date_sk % 7 = 0
                AND d_year BETWEEN 1999 AND 2000) d),
promotion AS (
  SELECT i AS p_promo_sk, 'P' || CAST(i AS VARCHAR) AS p_promo_id,
         'Promo_' || CAST(i AS VARCHAR) AS p_promo_name,
         CASE WHEN i % 2 = 0 THEN 'Y' ELSE 'N' END AS p_channel_dmail,
         CASE WHEN i % 3 = 0 THEN 'N' ELSE 'Y' END AS p_channel_email,
         CASE WHEN i % 3 = 1 THEN 'N' ELSE 'Y' END AS p_channel_event,
         CASE WHEN i % 4 = 2 THEN 'Y' ELSE 'N' END AS p_channel_tv
  FROM range(1, 11) t(i))"""
}
