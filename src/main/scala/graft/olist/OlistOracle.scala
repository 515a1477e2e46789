package graft.olist

/** DuckDB mirror of the Olist medallion: the same deterministic bronze
  * derivation ([[OlistData]]), silver transforms ([[OlistSilver]]) and
  * gold tables ([[OlistGold]]) expressed as one shared WITH block over
  * the harness parquet views. CASE chains for the state/category maps
  * are generated from [[OlistMaps]] so the two engines share one source
  * of truth. Unused CTEs are pruned by DuckDB's optimizer, so every gold
  * query ships the full block.
  */
object OlistOracle {
  import OlistMaps._

  /** The frozen audit clock — same instant [[OlistSilver.auditClock]]
    * injects, so silver audit columns hash-match. */
  private val clock = s"CAST('${OlistSilver.AuditEpoch}' AS TIMESTAMP)"

  val ctes: String = s"""WITH
olist_orders AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS order_id,
         CAST(o_custkey AS VARCHAR) AS customer_id,
         CASE o_orderstatus WHEN 'F' THEN 'delivered' WHEN 'O' THEN 'shipped' ELSE 'processing' END AS order_status,
         o_orderdate AS order_purchase_timestamp,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderdate + to_minutes(CAST(o_orderkey % 97 AS INT)) END AS order_approved_at,
         CASE WHEN o_orderstatus = 'F' THEN o_orderdate + to_days(CAST(2 + o_orderkey % 5 AS INT)) END AS order_delivered_carrier_date,
         CASE WHEN o_orderstatus = 'F' THEN o_orderdate + to_days(CAST(7 + o_orderkey % 10 AS INT)) END AS order_delivered_customer_date,
         o_orderdate + to_days(14) AS order_estimated_delivery_date
  FROM orders),
silver_orders AS (
  SELECT order_id, customer_id, order_status, order_purchase_timestamp,
         CASE WHEN order_status = 'delivered' AND order_approved_at IS NULL
              THEN order_purchase_timestamp + to_minutes(18) ELSE order_approved_at END AS order_approved_at,
         order_delivered_carrier_date, order_delivered_customer_date, order_estimated_delivery_date,
         $clock AS processed_date
  FROM olist_orders),
olist_items AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS order_id,
         l_linenumber AS order_item_id,
         CAST(l_partkey AS VARCHAR) AS product_id,
         CAST(l_suppkey AS VARCHAR) AS seller_id,
         l_shipdate AS shipping_limit_date,
         l_extendedprice AS price_raw,
         CASE WHEN l_partkey % 13 = 0 THEN NULL ELSE CAST(l_suppkey % 50 AS DOUBLE) * 0.25 END AS freight_raw
  FROM lineitem),
silver_order_items AS (
  SELECT order_id, CAST(order_item_id AS INT) AS order_item_id, product_id, seller_id,
         shipping_limit_date,
         CAST(price_raw AS DECIMAL(10,2)) AS price,
         CAST(freight_raw AS DECIMAL(10,2)) AS freight_value,
         $clock AS processed_timestamp
  FROM olist_items),
olist_customers AS (
  SELECT CAST(c_custkey AS VARCHAR) AS customer_id,
         'u' || CAST(c_custkey % 1200 AS VARCHAR) AS customer_unique_id,
         c_custkey % 500 AS customer_zip_code_prefix,
         lower(c_mktsegment) AS customer_city,
         CASE WHEN c_custkey % 101 = 0 THEN 'XX' ELSE ${stateCodeSql("c_nationkey")} END AS customer_state
  FROM customer),
silver_order_customers AS (
  SELECT customer_id, customer_unique_id,
         CAST(customer_zip_code_prefix AS INT) AS customer_zip_code_prefix,
         customer_city, customer_state,
         coalesce(${stateFullSql("customer_state")}, customer_state) AS customer_state_full,
         $clock AS modified_timestamp
  FROM olist_customers),
olist_products_base AS (
  SELECT CAST(p_partkey AS VARCHAR) AS product_id,
         CASE WHEN p_partkey % 31 = 0 THEN NULL ELSE ${categorySql("split_part(p_type, ' ', 1)")} END AS product_category_name,
         CASE WHEN p_partkey % 41 = 0 THEN NULL ELSE length(p_name) END AS product_name_lenght,
         CASE WHEN p_partkey % 23 = 0 THEN NULL ELSE length(p_type) END AS product_description_lenght,
         CASE WHEN p_partkey % 29 = 0 THEN NULL ELSE p_size % 5 END AS product_photos_qty,
         CASE WHEN p_partkey % 37 = 0 THEN NULL ELSE p_size * 100 END AS product_weight_g,
         CASE WHEN p_partkey % 37 = 0 THEN NULL ELSE p_size % 40 + 10 END AS product_length_cm,
         CASE WHEN p_partkey % 37 = 0 THEN NULL ELSE p_size % 20 + 5 END AS product_height_cm,
         CASE WHEN p_partkey % 37 = 0 THEN NULL ELSE p_size % 30 + 8 END AS product_width_cm
  FROM part),
olist_products AS (
  SELECT * FROM olist_products_base
  UNION ALL SELECT * FROM olist_products_base WHERE CAST(product_id AS BIGINT) % 50 = 0),
cat_translation AS (
  SELECT * FROM (VALUES ${catTranslation
    .map { case (p, e) => s"('$p','$e')" }.mkString(", ")})
    t(product_category_name, product_category_name_english)),
silver_products AS (
  SELECT DISTINCT p.product_id,
         coalesce(t.product_category_name_english, 'N/A') AS product_category_name_english,
         coalesce(CAST(p.product_name_lenght AS INT), 0) AS product_name_length,
         coalesce(CAST(p.product_description_lenght AS INT), 0) AS product_description_length,
         coalesce(CAST(p.product_photos_qty AS INT), 0) AS product_photos_qty,
         coalesce(CAST(p.product_weight_g AS INT), 0) AS product_weight_g,
         coalesce(CAST(p.product_length_cm AS INT), 0) AS product_length_cm,
         coalesce(CAST(p.product_height_cm AS INT), 0) AS product_height_cm,
         coalesce(CAST(p.product_width_cm AS INT), 0) AS product_width_cm,
         coalesce(CAST(p.product_length_cm AS INT) * CAST(p.product_height_cm AS INT) * CAST(p.product_width_cm AS INT), 0) AS product_volume_cm3,
         CAST(p.product_photos_qty AS INT) > 0 AS has_photos,
         CAST(p.product_description_lenght AS INT) > 0 AS has_description,
         $clock AS processed_timestamp
  FROM olist_products p LEFT JOIN cat_translation t USING (product_category_name)),
olist_sellers AS (
  SELECT CAST(s_suppkey AS VARCHAR) AS seller_id,
         s_suppkey % 500 AS seller_zip_code_prefix,
         ' ' || s_name || '  ' AS seller_city,
         CASE WHEN s_suppkey % 43 = 0 THEN 'zz'
              WHEN s_suppkey % 97 = 0 THEN 'SPX'
              WHEN s_suppkey % 7 = 0 THEN ' ' || lower(${stateCodeSql("s_nationkey")}) || ' '
              ELSE ${stateCodeSql("s_nationkey")} END AS seller_state
  FROM supplier),
silver_sellers AS (
  SELECT seller_id, CAST(seller_zip_code_prefix AS INT) AS seller_zip_code_prefix,
         trim(seller_city) AS seller_city,
         upper(trim(seller_state)) AS seller_state,
         coalesce(${stateFullSql("upper(trim(seller_state))")}, 'Unknown') AS seller_state_full,
         $clock AS processed_timestamp
  FROM olist_sellers),
olist_payments AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS order_id,
         l_linenumber AS payment_sequential,
         CASE (l_linenumber + l_suppkey) % 4 WHEN 0 THEN 'credit_card' WHEN 1 THEN 'boleto'
              WHEN 2 THEN 'voucher' ELSE 'debit_card' END AS payment_type,
         CAST(l_quantity AS BIGINT) % 11 AS payment_installments,
         l_extendedprice AS payment_value_raw
  FROM lineitem),
silver_order_payments AS (
  SELECT order_id, payment_type, CAST(payment_sequential AS INT) AS payment_sequential,
         CAST(payment_installments AS INT) AS payment_installments,
         CAST(payment_value_raw AS DECIMAL(10,2)) AS payment_value,
         $clock AS modified_timestamp
  FROM olist_payments),
olist_reviews_base AS (
  SELECT 'r' || CAST(o_orderkey AS VARCHAR) AS review_id,
         CAST(o_orderkey AS VARCHAR) AS order_id,
         CASE WHEN o_orderkey % 777 = 0 THEN 6 ELSE CAST(o_orderkey % 5 + 1 AS INT) END AS review_score,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE 'title ' || CAST(o_orderkey AS VARCHAR) END AS review_comment_title,
         CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE 'review message ' || CAST(o_orderkey AS VARCHAR) END AS review_comment_message,
         CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_orderdate + to_days(9) END AS review_creation_date,
         CASE WHEN o_orderkey % 17 = 0 THEN NULL ELSE o_orderdate + to_days(12) END AS review_answer_timestamp
  FROM orders WHERE o_orderkey % 10 != 3),
olist_reviews AS (
  SELECT * FROM olist_reviews_base
  UNION ALL SELECT * FROM olist_reviews_base WHERE CAST(order_id AS BIGINT) % 250 = 0
  UNION ALL SELECT 'rx' || CAST(i AS VARCHAR), 'missing' || CAST(i AS VARCHAR),
                   CAST(3 AS INT), NULL, NULL, NULL, NULL FROM generate_series(1, 3) t(i)),
silver_order_reviews AS (
  SELECT DISTINCT
    r.order_id, r.review_id, CAST(r.review_score AS INT) AS review_score,
    coalesce(r.review_comment_title, 'N/A') AS review_comment_title,
    coalesce(r.review_comment_message, 'N/A') AS review_comment_message,
    coalesce(r.review_creation_date, o.order_delivered_customer_date + to_days(1),
             o.order_estimated_delivery_date + to_days(1)) AS review_creation_date,
    coalesce(r.review_answer_timestamp, r.review_creation_date + to_days(3)) AS review_answer_timestamp,
    $clock AS processed_timestamp
  FROM olist_reviews r JOIN silver_orders o ON r.order_id = o.order_id),
olist_geolocations AS (
  SELECT CAST(z.zip AS INT) AS geolocation_zip_code_prefix,
         -33.0 + CAST((z.zip * 7919) % 2749 AS DOUBLE) / 100.0 + CAST(d.dup AS DOUBLE) * 0.01 AS geolocation_lat,
         -73.0 + CAST((z.zip * 104729) % 3800 AS DOUBLE) / 100.0 AS geolocation_lng,
         'city' || CAST(z.zip % 50 AS VARCHAR) AS geolocation_city,
         'SP' AS geolocation_state
  FROM generate_series(0, 499) z(zip) CROSS JOIN generate_series(0, 2) d(dup)
  WHERE d.dup <= z.zip % 3),
silver_geolocations AS (SELECT * FROM olist_geolocations),
geo_dedup AS (
  SELECT zip_code_prefix,
         ANY_VALUE(geolocation_lat) AS geolocation_lat,
         ANY_VALUE(geolocation_lng) AS geolocation_lng
  FROM (SELECT geolocation_zip_code_prefix AS zip_code_prefix, geolocation_lat, geolocation_lng,
               row_number() OVER (PARTITION BY geolocation_zip_code_prefix ORDER BY geolocation_lat) AS rn
        FROM silver_geolocations) ranked
  WHERE rn = 1 GROUP BY zip_code_prefix),
gold_dim_customers AS (
  SELECT sha256(c.customer_id) AS customer_key, c.customer_id AS customer_natural_key,
         c.customer_unique_id, CAST(c.customer_zip_code_prefix AS BIGINT) AS customer_zip_code_prefix,
         c.customer_city, c.customer_state, c.customer_state_full,
         g.geolocation_lat, g.geolocation_lng
  FROM silver_order_customers c LEFT JOIN geo_dedup g ON c.customer_zip_code_prefix = g.zip_code_prefix),
gold_dim_sellers AS (
  SELECT sha256(s.seller_id) AS seller_key, s.seller_id AS seller_natural_key,
         CAST(s.seller_zip_code_prefix AS BIGINT) AS seller_zip_code_prefix,
         s.seller_city, s.seller_state, s.seller_state_full,
         g.geolocation_lat, g.geolocation_lng
  FROM silver_sellers s LEFT JOIN geo_dedup g ON s.seller_zip_code_prefix = g.zip_code_prefix),
gold_dim_products AS (
  SELECT sha256(product_id) AS product_key, product_id AS product_natural_key,
         product_category_name_english AS product_category_name,
         CAST(product_name_length AS BIGINT) AS product_name_length,
         CAST(product_description_length AS BIGINT) AS product_description_length,
         CAST(product_photos_qty AS BIGINT) AS product_photos_qty,
         CAST(product_weight_g AS BIGINT) AS product_weight_g,
         CAST(product_length_cm AS BIGINT) AS product_length_cm,
         CAST(product_height_cm AS BIGINT) AS product_height_cm,
         CAST(product_width_cm AS BIGINT) AS product_width_cm,
         CAST(product_volume_cm3 AS BIGINT) AS product_volume_cm3,
         has_photos, has_description
  FROM silver_products),
gold_dim_orders AS (
  SELECT sha256(order_id) AS order_key, order_id AS order_natural_key, order_status,
         order_purchase_timestamp, order_approved_at, order_delivered_carrier_date,
         order_delivered_customer_date, order_estimated_delivery_date,
         CASE WHEN order_delivered_customer_date IS NOT NULL
              THEN CAST(date_diff('day', CAST(order_estimated_delivery_date AS DATE),
                                  CAST(order_delivered_customer_date AS DATE)) AS BIGINT) END AS delivery_days_vs_estimate,
         CASE WHEN order_delivered_customer_date IS NOT NULL
                   AND CAST(order_delivered_customer_date AS DATE) <= CAST(order_estimated_delivery_date AS DATE) THEN TRUE
              WHEN order_delivered_customer_date IS NOT NULL THEN FALSE END AS is_on_time_delivery
  FROM silver_orders),
date_seq AS (
  SELECT row_number() OVER () - 1 AS seq FROM (SELECT 1 AS x FROM silver_orders LIMIT 1000)),
date_series AS (
  SELECT (SELECT min(CAST(order_purchase_timestamp AS DATE)) FROM silver_orders) + CAST(seq AS INT) AS date_day
  FROM date_seq),
gold_dim_date AS (
  SELECT CAST(row_number() OVER (ORDER BY date_day) AS BIGINT) AS date_key,
         date_day AS date_actual,
         CAST(year(date_day) AS BIGINT) AS year,
         CAST(quarter(date_day) AS BIGINT) AS quarter,
         CAST(month(date_day) AS BIGINT) AS month,
         CAST(dayofmonth(date_day) AS BIGINT) AS day,
         CAST(dayofweek(date_day) + 1 AS BIGINT) AS day_of_week,
         dayname(date_day) AS day_name,
         monthname(date_day) AS month_name,
         CAST(weekofyear(date_day) AS BIGINT) AS week_of_year,
         CASE WHEN dayofweek(date_day) + 1 IN (1, 7) THEN TRUE ELSE FALSE END AS is_weekend
  FROM date_series),
payment_totals AS (
  SELECT order_id,
         SUM(payment_value) AS total_payment_value,
         COUNT(DISTINCT payment_type) AS payment_type_count,
         MAX(payment_installments) AS max_installments,
         string_agg(DISTINCT payment_type, ', ' ORDER BY payment_type) AS payment_types
  FROM silver_order_payments GROUP BY order_id),
review_summary AS (
  SELECT order_id, MAX(review_score) AS review_score,
         MAX(review_creation_date) AS review_creation_date,
         MAX(review_answer_timestamp) AS review_answer_timestamp
  FROM silver_order_reviews GROUP BY order_id),
gold_fact_order_items AS (
  SELECT
    sha256(CAST(oi.order_id AS VARCHAR) || '|' || CAST(oi.order_item_id AS VARCHAR)) AS order_item_key,
    do_.order_key, dc.customer_key, dp.product_key, ds.seller_key,
    dd.date_key AS order_date_key,
    dd_delivered.date_key AS delivered_date_key,
    oi.order_id AS order_natural_key,
    CAST(oi.order_item_id AS BIGINT) AS order_item_id,
    CAST(oi.price AS DOUBLE) AS item_price,
    CAST(oi.freight_value AS DOUBLE) AS item_freight_value,
    CAST(COALESCE(oi.price, 0) + COALESCE(oi.freight_value, 0) AS DOUBLE) AS item_total_value,
    CAST(pt.total_payment_value AS DOUBLE) AS total_payment_value,
    CAST(pt.payment_type_count AS BIGINT) AS payment_type_count,
    CAST(pt.max_installments AS BIGINT) AS max_installments,
    pt.payment_types,
    CAST(rs.review_score AS BIGINT) AS review_score,
    CASE WHEN rs.review_score IS NOT NULL AND rs.review_score >= 4 THEN TRUE ELSE FALSE END AS is_positive_review,
    CASE WHEN o.order_delivered_customer_date IS NOT NULL
         THEN CAST(date_diff('day', CAST(o.order_purchase_timestamp AS DATE),
                             CAST(o.order_delivered_customer_date AS DATE)) AS BIGINT) END AS actual_delivery_days,
    CASE WHEN o.order_estimated_delivery_date IS NOT NULL
         THEN CAST(date_diff('day', CAST(o.order_purchase_timestamp AS DATE),
                             CAST(o.order_estimated_delivery_date AS DATE)) AS BIGINT) END AS estimated_delivery_days,
    oi.shipping_limit_date,
    o.order_purchase_timestamp, o.order_estimated_delivery_date, o.order_delivered_customer_date
  FROM silver_order_items oi
  INNER JOIN silver_orders o ON oi.order_id = o.order_id
  INNER JOIN silver_order_customers c ON o.customer_id = c.customer_id
  INNER JOIN gold_dim_orders do_ ON o.order_id = do_.order_natural_key
  INNER JOIN gold_dim_customers dc ON c.customer_id = dc.customer_natural_key
  INNER JOIN gold_dim_products dp ON oi.product_id = dp.product_natural_key
  INNER JOIN gold_dim_sellers ds ON oi.seller_id = ds.seller_natural_key
  INNER JOIN gold_dim_date dd ON CAST(o.order_purchase_timestamp AS DATE) = dd.date_actual
  LEFT JOIN gold_dim_date dd_delivered ON CAST(o.order_delivered_customer_date AS DATE) = dd_delivered.date_actual
  LEFT JOIN payment_totals pt ON oi.order_id = pt.order_id
  LEFT JOIN review_summary rs ON oi.order_id = rs.order_id
  WHERE oi.order_id IS NOT NULL)
"""

  /** Full oracle query for a gold CTE name. */
  def sql(goldTable: String): String = ctes + s"SELECT * FROM $goldTable"

  /** Expected content of the streamed CSV bronze orders table (st6): the
    * bronze derivation itself, plus the all-null rescue column the CSV
    * round-trip adds. */
  val bronzeOrdersSql: String = ctes +
    """SELECT order_id, customer_id, order_status, order_purchase_timestamp,
      |       order_approved_at, order_delivered_carrier_date,
      |       order_delivered_customer_date, order_estimated_delivery_date,
      |       CAST(NULL AS VARCHAR) AS _rescued_data
      |FROM olist_orders""".stripMargin

  /** dim_date needs its DATE column stringified for the driver hash. */
  val dimDateSql: String = ctes +
    """SELECT date_key, CAST(date_actual AS VARCHAR) AS date_actual, year, quarter,
      |       month, day, day_of_week, day_name, month_name, week_of_year, is_weekend
      |FROM gold_dim_date""".stripMargin
}
