package graft.olist

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables

/** The reference's actual product — the Olist e-commerce medallion
  * (bronze → silver → gold), rebuilt Spark-first and end-to-end.
  *
  * The driver's correctness oracle (DuckDB) can only read the harness
  * parquet tables, so the 9 Olist source datasets are DERIVED
  * deterministically from them (orders/lineitem/customer/supplier/part
  * plus generated geolocation rows). The identical derivation is
  * expressed in the oracle SQL ([[OlistOracle]]), which then transcribes
  * the reference's silver/gold logic — so every silver quirk and every
  * gold table is hash-checked end-to-end against an independent engine.
  *
  * Layer map (reference files):
  *  - bronze: scripts/bronze/bronze_ingestion.py (CSV + rescue; the CSV
  *    path itself is exercised by CsvSource + PipelineSpec / st6)
  *  - silver: the scripts/silver python notebooks — each transform in
  *    [[OlistSilver]] with its documented quirks
  *  - gold: the scripts/gold SQL files — each table in [[OlistGold]]
  */
object OlistMaps {
  /** nationkey (0..24) → Brazilian state code (used to synthesize
    * customer/seller states from the harness tables). */
  val stateCodeByNation: IndexedSeq[String] = IndexedSeq(
    "AC", "AL", "AP", "AM", "BA", "CE", "DF", "ES", "GO", "MA", "MT", "MS",
    "MG", "PA", "PB", "PR", "PE", "PI", "RJ", "RN", "RS", "RO", "RR", "SC",
    "SP")

  /** The reference's 27-entry state map (silver_customers.py:19-47,
    * silver_sellers.py:63-91). */
  val stateFull: Seq[(String, String)] = Seq(
    "AC" -> "Acre", "AL" -> "Alagoas", "AP" -> "Amapá", "AM" -> "Amazonas",
    "BA" -> "Bahia", "CE" -> "Ceará", "DF" -> "Distrito Federal",
    "ES" -> "Espírito Santo", "GO" -> "Goiás", "MA" -> "Maranhão",
    "MT" -> "Mato Grosso", "MS" -> "Mato Grosso do Sul",
    "MG" -> "Minas Gerais", "PA" -> "Pará", "PB" -> "Paraíba",
    "PR" -> "Paraná", "PE" -> "Pernambuco", "PI" -> "Piauí",
    "RJ" -> "Rio de Janeiro", "RN" -> "Rio Grande do Norte",
    "RS" -> "Rio Grande do Sul", "RO" -> "Rondônia", "RR" -> "Roraima",
    "SC" -> "Santa Catarina", "SP" -> "São Paulo", "SE" -> "Sergipe",
    "TO" -> "Tocantins")

  /** p_type first word → synthetic pt-BR Olist category. */
  val categoryByType: Seq[(String, String)] = Seq(
    "STANDARD" -> "cama_mesa_banho", "SMALL" -> "beleza_saude",
    "MEDIUM" -> "informatica_acessorios", "LARGE" -> "moveis_decoracao",
    "ECONOMY" -> "esporte_lazer", "PROMO" -> "promocao")

  /** pt → en translations (silver_product_category_name.py). 'promocao'
    * deliberately missing → english falls back to 'N/A'
    * (silver_products.py coalesce). */
  val catTranslation: Seq[(String, String)] = Seq(
    "cama_mesa_banho" -> "bed_bath_table", "beleza_saude" -> "health_beauty",
    "informatica_acessorios" -> "computers_accessories",
    "moveis_decoracao" -> "furniture_decor", "esporte_lazer" -> "sports_leisure")

  // Spark-side lookups: constant-folded literal maps (same plan shape the
  // reference uses — create_map is codegen'd, no join, no UDF).
  def stateCodeCol(nationKey: Column): Column =
    element_at(typedLit(stateCodeByNation.zipWithIndex.map(_.swap).toMap),
      nationKey.cast("int"))
  def stateFullCol(code: Column): Column =
    element_at(typedLit(stateFull.toMap), code)

  // Oracle-side equivalents (DuckDB CASE chains, generated from the same
  // constants so the two engines cannot drift).
  def stateCodeSql(k: String): String =
    s"CASE $k " + stateCodeByNation.zipWithIndex
      .map { case (c, i) => s"WHEN $i THEN '$c'" }.mkString(" ") + " END"
  def stateFullSql(s: String): String =
    s"CASE $s " + stateFull
      .map { case (c, f) => s"WHEN '$c' THEN '$f'" }.mkString(" ") + " END"
  def categorySql(t: String): String =
    s"CASE $t " + categoryByType
      .map { case (w, c) => s"WHEN '$w' THEN '$c'" }.mkString(" ") + " END"
}

/** Deterministic derivation of the 9 Olist bronze datasets from the
  * harness tables. Every edge case in FIXTURES.md is planted via modulo
  * arithmetic both engines compute identically (see OlistOracle for the
  * DuckDB mirror): null approvals, undelivered orders, null freight,
  * unknown state codes, padded/lowercase states, missing translations,
  * null product dims, duplicate products/reviews, orphan reviews,
  * duplicate geolocation zips.
  */
object OlistData {
  import OlistMaps._

  def orders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey").cast("string").as("order_id"),
      col("o_custkey").cast("string").as("customer_id"),
      when(col("o_orderstatus") === "F", "delivered")
        .when(col("o_orderstatus") === "O", "shipped")
        .otherwise("processing").as("order_status"),
      col("o_orderdate").as("order_purchase_timestamp"),
      when(col("o_orderkey") % 11 === 0, lit(null).cast("timestamp"))
        .otherwise(expr("timestampadd(MINUTE, CAST(o_orderkey % 97 AS INT), o_orderdate)"))
        .as("order_approved_at"),
      when(col("o_orderstatus") === "F",
        expr("timestampadd(DAY, CAST(2 + o_orderkey % 5 AS INT), o_orderdate)"))
        .as("order_delivered_carrier_date"),
      when(col("o_orderstatus") === "F",
        expr("timestampadd(DAY, CAST(7 + o_orderkey % 10 AS INT), o_orderdate)"))
        .as("order_delivered_customer_date"),
      expr("timestampadd(DAY, 14, o_orderdate)")
        .as("order_estimated_delivery_date"))

  def orderItems(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey").cast("string").as("order_id"),
      col("l_linenumber").as("order_item_id"),
      col("l_partkey").cast("string").as("product_id"),
      col("l_suppkey").cast("string").as("seller_id"),
      col("l_shipdate").as("shipping_limit_date"),
      col("l_extendedprice").as("price"),
      when(col("l_partkey") % 13 === 0, lit(null).cast("double"))
        .otherwise((col("l_suppkey") % 50).cast("double") * 0.25)
        .as("freight_value"))

  def customers(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey").cast("string").as("customer_id"),
      concat(lit("u"), (col("c_custkey") % 1200).cast("string"))
        .as("customer_unique_id"),
      (col("c_custkey") % 500).as("customer_zip_code_prefix"),
      lower(col("c_mktsegment")).as("customer_city"),
      when(col("c_custkey") % 101 === 0, "XX")
        .otherwise(stateCodeCol(col("c_nationkey"))).as("customer_state"))

  def products(s: SparkSession, d: String): DataFrame = {
    val base = Tables.part(s, d).select(
      col("p_partkey").cast("string").as("product_id"),
      when(col("p_partkey") % 31 === 0, lit(null).cast("string"))
        .otherwise(element_at(typedLit(categoryByType.toMap),
          expr("split_part(p_type, ' ', 1)")))
        .as("product_category_name"),
      when(col("p_partkey") % 41 === 0, lit(null).cast("int"))
        .otherwise(length(col("p_name"))).as("product_name_lenght"),
      when(col("p_partkey") % 23 === 0, lit(null).cast("int"))
        .otherwise(length(col("p_type"))).as("product_description_lenght"),
      when(col("p_partkey") % 29 === 0, lit(null).cast("int"))
        .otherwise(col("p_size") % 5).as("product_photos_qty"),
      when(col("p_partkey") % 37 === 0, lit(null).cast("int"))
        .otherwise(col("p_size") * 100).as("product_weight_g"),
      when(col("p_partkey") % 37 === 0, lit(null).cast("int"))
        .otherwise(col("p_size") % 40 + 10).as("product_length_cm"),
      when(col("p_partkey") % 37 === 0, lit(null).cast("int"))
        .otherwise(col("p_size") % 20 + 5).as("product_height_cm"),
      when(col("p_partkey") % 37 === 0, lit(null).cast("int"))
        .otherwise(col("p_size") % 30 + 8).as("product_width_cm"))
    // Planted exact-duplicate rows (FIXTURES.md: dropDuplicates target).
    base.unionAll(base.filter(col("product_id").cast("bigint") % 50 === 0))
  }

  def sellers(s: SparkSession, d: String): DataFrame = {
    val code = stateCodeCol(col("s_nationkey"))
    Tables.supplier(s, d).select(
      col("s_suppkey").cast("string").as("seller_id"),
      (col("s_suppkey") % 500).as("seller_zip_code_prefix"),
      concat(lit(" "), col("s_name"), lit("  ")).as("seller_city"),
      when(col("s_suppkey") % 43 === 0, "zz")
        .when(col("s_suppkey") % 97 === 0, "SPX")
        .when(col("s_suppkey") % 7 === 0, concat(lit(" "), lower(code), lit(" ")))
        .otherwise(code).as("seller_state"))
  }

  def catTranslation(s: SparkSession): DataFrame =
    s.createDataFrame(OlistMaps.catTranslation)
      .toDF("product_category_name", "product_category_name_english")

  def payments(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey").cast("string").as("order_id"),
      col("l_linenumber").as("payment_sequential"),
      element_at(typedLit(Map(0 -> "credit_card", 1 -> "boleto",
        2 -> "voucher", 3 -> "debit_card")),
        ((col("l_linenumber") + col("l_suppkey")) % 4).cast("int"))
        .as("payment_type"),
      (col("l_quantity").cast("bigint") % 11).as("payment_installments"),
      col("l_extendedprice").as("payment_value"))

  def reviews(s: SparkSession, d: String): DataFrame = {
    // ~10% of orders carry no review → fact's review_score NULL branch.
    val base = Tables.orders(s, d)
      .filter(col("o_orderkey") % 10 =!= 3)
      .select(
        concat(lit("r"), col("o_orderkey").cast("string")).as("review_id"),
        col("o_orderkey").cast("string").as("order_id"),
        when(col("o_orderkey") % 777 === 0, lit(6))
          .otherwise((col("o_orderkey") % 5 + 1).cast("int")).as("review_score"),
        when(col("o_orderkey") % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("title "), col("o_orderkey").cast("string")))
          .as("review_comment_title"),
        when(col("o_orderkey") % 4 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("review message "), col("o_orderkey").cast("string")))
          .as("review_comment_message"),
        when(col("o_orderkey") % 13 === 0, lit(null).cast("timestamp"))
          .otherwise(expr("timestampadd(DAY, 9, o_orderdate)"))
          .as("review_creation_date"),
        when(col("o_orderkey") % 17 === 0, lit(null).cast("timestamp"))
          .otherwise(expr("timestampadd(DAY, 12, o_orderdate)"))
          .as("review_answer_timestamp"))
    val dups = base.filter(col("order_id").cast("bigint") % 250 === 0)
    // Orphan reviews (order_id absent from orders → inner join drops).
    val orphans = s.range(1, 4).select(
      concat(lit("rx"), col("id").cast("string")).as("review_id"),
      concat(lit("missing"), col("id").cast("string")).as("order_id"),
      lit(3).cast("int").as("review_score"),
      lit(null).cast("string").as("review_comment_title"),
      lit(null).cast("string").as("review_comment_message"),
      lit(null).cast("timestamp").as("review_creation_date"),
      lit(null).cast("timestamp").as("review_answer_timestamp"))
    base.unionAll(dups).unionAll(orphans)
  }

  /** Synthetic geolocation table: zips 0..499, `zip % 3 + 1` rows each
    * (duplicate zips with distinct lats → the rn=1 dedup target in
    * dim_customers.sql:36). Arithmetic is plain IEEE double ops in the
    * same order on both engines → bit-identical. */
  def geolocations(s: SparkSession): DataFrame =
    s.range(0, 500).toDF("zip")
      .crossJoin(s.range(0, 3).toDF("dup"))
      .filter(col("dup") <= col("zip") % 3)
      .select(
        col("zip").cast("int").as("geolocation_zip_code_prefix"),
        (lit(-33.0) + ((col("zip") * 7919) % 2749).cast("double") / 100.0
          + col("dup").cast("double") * 0.01).as("geolocation_lat"),
        (lit(-73.0) + ((col("zip") * 104729) % 3800).cast("double") / 100.0)
          .as("geolocation_lng"),
        concat(lit("city"), (col("zip") % 50).cast("string"))
          .as("geolocation_city"),
        lit("SP").as("geolocation_state"))
}

/** Silver transforms — one function per reference script, DataFrame in /
  * DataFrame out so the same logic runs in the direct query path, the
  * Pipeline DAG, and the CSV e2e test. Every table carries the
  * reference's wall-clock audit column (processed_/modified_timestamp;
  * orders' is NAMED processed_date but holds current_timestamp() —
  * faithful quirk) through an INJECTED clock: `current_timestamp()` is
  * non-deterministic, so the default is a fixed epoch the oracle
  * freezes as a literal, and a live deployment passes
  * `functions.current_timestamp()` instead.
  */
object OlistSilver {
  import OlistMaps._

  /** The frozen audit instant (UTC) — mirrored literally in
    * [[OlistOracle]]'s silver CTEs. */
  val AuditEpoch = "2024-01-01 00:00:00"

  /** Default injected audit clock; swap for `current_timestamp()` in a
    * live pipeline. */
  def auditClock: Column = lit(AuditEpoch).cast("timestamp")

  /** Silver_orders.py:28-41 — timestamp casts + the 18-minute approval
    * imputation for delivered orders; audit column `processed_date`
    * (a TIMESTAMP despite the name — Silver_orders.py:41). */
  def orders(bronze: DataFrame, clock: Column = auditClock): DataFrame =
    bronze.withColumn("order_approved_at",
      when(col("order_status") === "delivered" && col("order_approved_at").isNull,
        col("order_purchase_timestamp") + expr("INTERVAL 18 MINUTES"))
        .otherwise(col("order_approved_at")))
      .withColumn("processed_date", clock)

  /** Silver_order_items.py:50-60 — projection + casts (price/freight to
    * decimal(10,2)) + processed_timestamp. */
  def orderItems(bronze: DataFrame, clock: Column = auditClock): DataFrame =
    bronze.select(
      col("order_id"),
      col("order_item_id").cast("int").as("order_item_id"),
      col("product_id"),
      col("seller_id"),
      col("shipping_limit_date").cast("timestamp").as("shipping_limit_date"),
      col("price").cast("decimal(10,2)").as("price"),
      col("freight_value").cast("decimal(10,2)").as("freight_value"),
      clock.as("processed_timestamp"))

  /** silver_customers.py:64-88 — zip cast + map-decode with raw-code
    * fallback (note: fallback = the RAW code, unlike sellers' 'Unknown'). */
  def customers(bronze: DataFrame, clock: Column = auditClock): DataFrame =
    bronze
      .withColumn("customer_zip_code_prefix",
        col("customer_zip_code_prefix").cast("int"))
      .withColumn("customer_state_full",
        coalesce(stateFullCol(col("customer_state")), col("customer_state")))
      .select("customer_id", "customer_unique_id", "customer_zip_code_prefix",
        "customer_city", "customer_state", "customer_state_full")
      .withColumn("modified_timestamp", clock)   // silver_customers.py:79

  /** silver_products.py:67-119 — broadcast translation join, casts,
    * volume, has_* flags (computed BEFORE fillna, so null inputs keep the
    * flags NULL — faithful quirk), fillna(0) on numerics, dropDuplicates.
    * Determinism: planted duplicates are full-row identical, so the
    * arbitrary-row pick of dropDuplicates is value-stable. */
  def products(bronze: DataFrame, translation: DataFrame,
      clock: Column = auditClock): DataFrame =
    bronze
      .join(broadcast(translation), Seq("product_category_name"), "left")
      .select(
        col("product_id"),
        coalesce(col("product_category_name_english"), lit("N/A"))
          .as("product_category_name_english"),
        col("product_name_lenght").cast("int").as("product_name_length"),
        col("product_description_lenght").cast("int")
          .as("product_description_length"),
        col("product_photos_qty").cast("int").as("product_photos_qty"),
        col("product_weight_g").cast("int").as("product_weight_g"),
        col("product_length_cm").cast("int").as("product_length_cm"),
        col("product_height_cm").cast("int").as("product_height_cm"),
        col("product_width_cm").cast("int").as("product_width_cm"))
      .withColumn("product_volume_cm3",
        col("product_length_cm") * col("product_height_cm") * col("product_width_cm"))
      .withColumn("has_photos", col("product_photos_qty") > 0)
      .withColumn("has_description", col("product_description_length") > 0)
      .na.fill(0, Seq("product_name_length", "product_description_length",
        "product_photos_qty", "product_weight_g", "product_length_cm",
        "product_height_cm", "product_width_cm", "product_volume_cm3"))
      // silver_products.py:116 — appended before the dedup, as upstream;
      // the clock is constant per run, so the arbitrary-row pick stays
      // value-stable.
      .withColumn("processed_timestamp", clock)
      .dropDuplicates(Seq("product_id"))

  /** silver_sellers.py:93-113 — trim/upper normalization + 27-state map
    * with 'Unknown' fallback (vs customers' raw-code fallback). */
  def sellers(bronze: DataFrame, clock: Column = auditClock): DataFrame =
    bronze.select(
      col("seller_id"),
      col("seller_zip_code_prefix").cast("int").as("seller_zip_code_prefix"),
      trim(col("seller_city")).as("seller_city"),
      upper(trim(col("seller_state"))).as("seller_state"),
      coalesce(stateFullCol(upper(trim(col("seller_state")))), lit("Unknown"))
        .as("seller_state_full"),
      clock.as("processed_timestamp"))   // silver_sellers.py:112

  /** order_payments.py:46-56 — casts + modified_timestamp. */
  def payments(bronze: DataFrame, clock: Column = auditClock): DataFrame =
    bronze.select(
      col("order_id"),
      col("payment_type"),
      col("payment_sequential").cast("int").as("payment_sequential"),
      col("payment_installments").cast("int").as("payment_installments"),
      col("payment_value").cast("decimal(10,2)").as("payment_value"),
      clock.as("modified_timestamp"))   // order_payments.py:55

  /** order_reviews.py:38-78 — inner join to silver_orders, dedup by
    * review_id, N/A comment fill, creation-date imputation chain, and the
    * reference's faithful quirk: review_answer_timestamp is imputed from
    * the ORIGINAL (pre-imputation) creation date, so a review with both
    * dates null keeps a null answer timestamp. */
  def reviews(bronze: DataFrame, silverOrders: DataFrame,
      clock: Column = auditClock): DataFrame = {
    val lookup = silverOrders.select(
      col("order_id"),
      col("order_delivered_customer_date").cast("timestamp").as("delivered_date"),
      col("order_estimated_delivery_date").cast("timestamp").as("estimated_date"))
    bronze
      .join(lookup, Seq("order_id"), "inner")
      .dropDuplicates(Seq("review_id"))
      .select(
        col("order_id"),
        col("review_id"),
        col("review_score").cast("int").as("review_score"),
        coalesce(col("review_comment_title"), lit("N/A"))
          .as("review_comment_title"),
        coalesce(col("review_comment_message"), lit("N/A"))
          .as("review_comment_message"),
        coalesce(col("review_creation_date").cast("timestamp"),
          col("delivered_date") + expr("INTERVAL 1 DAY"),
          col("estimated_date") + expr("INTERVAL 1 DAY"))
          .as("review_creation_date"),
        coalesce(col("review_answer_timestamp").cast("timestamp"),
          col("review_creation_date").cast("timestamp") + expr("INTERVAL 3 DAY"))
          .as("review_answer_timestamp"),
        clock.as("processed_timestamp"))   // order_reviews.py:78
  }

  /** silver_geolocations.py — passthrough. */
  def geolocations(bronze: DataFrame): DataFrame = bronze
}

/** Gold layer — the scripts/gold SQL files re-expressed as DataFrame programs.
  * Scale notes: dims join the window-deduped geo subquery via broadcast
  * (500 zips; the real Olist has ~19k — still broadcast-sized); the fact
  * keeps all order_id-keyed joins (orders, payments, reviews, dim_orders)
  * on one hash partitioning so the shuffle is paid once; bounded dims
  * (sellers, dates) broadcast; unbounded dims (orders, customers,
  * products) shuffle on their natural keys.
  */
object OlistGold {

  /** The shared deduped-geo subquery (dim_customers.sql:25-41,
    * dim_sellers.sql:22-37): rn=1 per zip ordered by lat, then
    * ANY_VALUE group — the composed J10/J11 + A4 shape. */
  def geoDedup(silverGeo: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("zip_code_prefix"))
      .orderBy(col("geolocation_lat"))
    silverGeo
      .select(col("geolocation_zip_code_prefix").as("zip_code_prefix"),
        col("geolocation_lat"), col("geolocation_lng"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("zip_code_prefix"))
      .agg(any_value(col("geolocation_lat")).as("geolocation_lat"),
        any_value(col("geolocation_lng")).as("geolocation_lng"))
  }

  /** dim_customers.sql — sha2 surrogate key + left join to deduped geo. */
  def dimCustomers(silverCustomers: DataFrame, silverGeo: DataFrame): DataFrame =
    silverCustomers
      .join(broadcast(geoDedup(silverGeo)),
        col("customer_zip_code_prefix") === col("zip_code_prefix"), "left")
      .select(
        sha2(col("customer_id"), 256).as("customer_key"),
        col("customer_id").as("customer_natural_key"),
        col("customer_unique_id"),
        col("customer_zip_code_prefix").cast("long").as("customer_zip_code_prefix"),
        col("customer_city"), col("customer_state"), col("customer_state_full"),
        col("geolocation_lat"), col("geolocation_lng"))

  /** dim_sellers.sql — same shape over sellers. */
  def dimSellers(silverSellers: DataFrame, silverGeo: DataFrame): DataFrame =
    silverSellers
      .join(broadcast(geoDedup(silverGeo)),
        col("seller_zip_code_prefix") === col("zip_code_prefix"), "left")
      .select(
        sha2(col("seller_id"), 256).as("seller_key"),
        col("seller_id").as("seller_natural_key"),
        col("seller_zip_code_prefix").cast("long").as("seller_zip_code_prefix"),
        col("seller_city"), col("seller_state"), col("seller_state_full"),
        col("geolocation_lat"), col("geolocation_lng"))

  /** dim_products.sql — key + passthrough (BIGINT-normalized metrics). */
  def dimProducts(silverProducts: DataFrame): DataFrame =
    silverProducts.select(
      sha2(col("product_id"), 256).as("product_key"),
      col("product_id").as("product_natural_key"),
      col("product_category_name_english").as("product_category_name"),
      col("product_name_length").cast("long").as("product_name_length"),
      col("product_description_length").cast("long").as("product_description_length"),
      col("product_photos_qty").cast("long").as("product_photos_qty"),
      col("product_weight_g").cast("long").as("product_weight_g"),
      col("product_length_cm").cast("long").as("product_length_cm"),
      col("product_height_cm").cast("long").as("product_height_cm"),
      col("product_width_cm").cast("long").as("product_width_cm"),
      col("product_volume_cm3").cast("long").as("product_volume_cm3"),
      col("has_photos"), col("has_description"))

  /** dim_orders.sql — delivery performance metrics (datediff(end, start)
    * = delivered - estimated, Databricks two-arg semantics). */
  def dimOrders(silverOrders: DataFrame): DataFrame =
    silverOrders.select(
      sha2(col("order_id"), 256).as("order_key"),
      col("order_id").as("order_natural_key"),
      col("order_status"),
      col("order_purchase_timestamp"), col("order_approved_at"),
      col("order_delivered_carrier_date"), col("order_delivered_customer_date"),
      col("order_estimated_delivery_date"),
      when(col("order_delivered_customer_date").isNotNull,
        datediff(to_date(col("order_delivered_customer_date")),
          to_date(col("order_estimated_delivery_date"))).cast("long"))
        .as("delivery_days_vs_estimate"),
      when(col("order_delivered_customer_date").isNotNull
        && to_date(col("order_delivered_customer_date"))
        <= to_date(col("order_estimated_delivery_date")), lit(true))
        .when(col("order_delivered_customer_date").isNotNull, lit(false))
        .as("is_on_time_delivery"))

  /** dim_date.sql — 1000-day calendar from min purchase date. Faithful to
    * the reference's LIMIT-1000-rows seq generator (including its quirk:
    * the computed max_date is unused, the series is always 1000 days), but
    * partition-safe: LIMIT first bounds the window input to ≤1000 rows, so
    * the global row_number window is O(1000) on one task, not a full-table
    * single-partition sort. */
  def dimDate(silverOrders: DataFrame): DataFrame = {
    val minDate = silverOrders.agg(
      min(to_date(col("order_purchase_timestamp"))).as("min_date"))
    val seq = silverOrders.limit(1000)
      .select((row_number().over(Window.orderBy(lit(1))) - 1).as("seq"))
    val series = seq.crossJoin(broadcast(minDate))
      .select(date_add(col("min_date"), col("seq").cast("int")).as("date_day"))
    series.select(
      row_number().over(Window.orderBy(col("date_day"))).cast("long").as("date_key"),
      col("date_day").as("date_actual"),
      year(col("date_day")).cast("long").as("year"),
      quarter(col("date_day")).cast("long").as("quarter"),
      month(col("date_day")).cast("long").as("month"),
      dayofmonth(col("date_day")).cast("long").as("day"),
      dayofweek(col("date_day")).cast("long").as("day_of_week"),
      date_format(col("date_day"), "EEEE").as("day_name"),
      date_format(col("date_day"), "MMMM").as("month_name"),
      weekofyear(col("date_day")).cast("long").as("week_of_year"),
      dayofweek(col("date_day")).isin(1, 7).as("is_weekend"))
  }

  /** fact_order_items.sql — the star build: payment/review aggregate CTEs,
    * natural-key dim joins, date-window inner join (orders past the
    * 1000-day calendar drop — faithful reference quirk), null-safe
    * measures. Decimal measures exit as DOUBLE per the determinism
    * convention. */
  def factOrderItems(
      silverItems: DataFrame,
      silverOrders: DataFrame,
      silverCustomers: DataFrame,
      dimOrders: DataFrame,
      dimCustomers: DataFrame,
      dimProducts: DataFrame,
      dimSellers: DataFrame,
      dimDate: DataFrame,
      silverPayments: DataFrame,
      silverReviews: DataFrame): DataFrame = {

    // Same split as a1_group_agg: collect_set (ObjectHashAggregate) fused
    // with countDistinct (Expand) degrades super-linearly; two
    // aggregations joined on the group key share one hash partitioning
    // and their stages overlap.
    val payMain = silverPayments.groupBy(col("order_id")).agg(
      sum(col("payment_value")).as("total_payment_value"),
      max(col("payment_installments")).as("max_installments"),
      array_join(sort_array(collect_set(col("payment_type"))), ", ")
        .as("payment_types"))
    val payTypes = silverPayments.select(col("order_id"), col("payment_type"))
      .distinct()
      .groupBy(col("order_id")).agg(count(lit(1)).as("payment_type_count"))
    val paymentTotals = payMain.join(payTypes, "order_id")

    val reviewSummary = silverReviews.groupBy(col("order_id")).agg(
      max(col("review_score")).as("review_score"),
      max(col("review_creation_date")).as("review_creation_date"),
      max(col("review_answer_timestamp")).as("review_answer_timestamp"))

    // Prune each dim to (natural key, surrogate key) BEFORE the join — at
    // 100 TB the fact shuffle carries two columns per dim, not the payload.
    val oi = silverItems.alias("oi")
    val o = silverOrders.alias("o")
    val c = silverCustomers.select(col("customer_id")).alias("c")
    val dok = dimOrders.select(col("order_natural_key"), col("order_key")).alias("dok")
    val dck = dimCustomers.select(col("customer_natural_key"), col("customer_key")).alias("dck")
    val dpk = dimProducts.select(col("product_natural_key"), col("product_key")).alias("dpk")
    val dsk = dimSellers.select(col("seller_natural_key"), col("seller_key")).alias("dsk")
    val dd = dimDate.select(col("date_actual"), col("date_key")).alias("dd")
    val dd2 = dimDate.select(col("date_actual"), col("date_key")).alias("dd2")
    val pt = paymentTotals.alias("pt")
    val rs = reviewSummary.alias("rs")

    // Join order is partition-aware: ALL order_id-keyed joins (o, dok,
    // pt, rs) run contiguously so the fact side shuffles on order_id
    // ONCE; then the two customer_id joins share one shuffle; then
    // product; bounded dims broadcast last. Catalyst does not reorder
    // inner joins by partitioning without CBO stats, so interleaving
    // keys (the old o → c → dok order) paid an extra exchange of the
    // fact side per key switch. The pt/rs left joins carry unique
    // per-order keys, so commuting them ahead of the inner dims is
    // value-identical.
    oi.filter(col("oi.order_id").isNotNull)
      .join(o, col("oi.order_id") === col("o.order_id"))
      .join(dok, col("o.order_id") === col("dok.order_natural_key"))
      .join(pt, col("oi.order_id") === col("pt.order_id"), "left")
      .join(rs, col("oi.order_id") === col("rs.order_id"), "left")
      .join(c, col("o.customer_id") === col("c.customer_id"))
      .join(dck, col("c.customer_id") === col("dck.customer_natural_key"))
      .join(dpk, col("oi.product_id") === col("dpk.product_natural_key"))
      .join(broadcast(dsk), col("oi.seller_id") === col("dsk.seller_natural_key"))
      .join(broadcast(dd),
        to_date(col("o.order_purchase_timestamp")) === col("dd.date_actual"))
      .join(broadcast(dd2),
        to_date(col("o.order_delivered_customer_date")) === col("dd2.date_actual"),
        "left")
      .select(
        sha2(concat(col("oi.order_id"), lit("|"),
          col("oi.order_item_id").cast("string")), 256).as("order_item_key"),
        col("dok.order_key").as("order_key"),
        col("dck.customer_key").as("customer_key"),
        col("dpk.product_key").as("product_key"),
        col("dsk.seller_key").as("seller_key"),
        col("dd.date_key").as("order_date_key"),
        col("dd2.date_key").as("delivered_date_key"),
        col("oi.order_id").as("order_natural_key"),
        col("oi.order_item_id").cast("long").as("order_item_id"),
        col("oi.price").cast("double").as("item_price"),
        col("oi.freight_value").cast("double").as("item_freight_value"),
        (coalesce(col("oi.price"), lit(0)) + coalesce(col("oi.freight_value"), lit(0)))
          .cast("double").as("item_total_value"),
        col("pt.total_payment_value").cast("double").as("total_payment_value"),
        col("pt.payment_type_count").as("payment_type_count"),
        col("pt.max_installments").cast("long").as("max_installments"),
        col("pt.payment_types").as("payment_types"),
        col("rs.review_score").cast("long").as("review_score"),
        when(col("rs.review_score").isNotNull && col("rs.review_score") >= 4,
          lit(true)).otherwise(lit(false)).as("is_positive_review"),
        when(col("o.order_delivered_customer_date").isNotNull,
          datediff(to_date(col("o.order_delivered_customer_date")),
            to_date(col("o.order_purchase_timestamp"))).cast("long"))
          .as("actual_delivery_days"),
        when(col("o.order_estimated_delivery_date").isNotNull,
          datediff(to_date(col("o.order_estimated_delivery_date")),
            to_date(col("o.order_purchase_timestamp"))).cast("long"))
          .as("estimated_delivery_days"),
        col("oi.shipping_limit_date"),
        col("o.order_purchase_timestamp"),
        col("o.order_estimated_delivery_date"),
        col("o.order_delivered_customer_date"))
  }
}

/** Lazy one-pass wiring of the whole medallion graph for a scale dir. */
final class OlistGraph(s: SparkSession, d: String) {
  lazy val silverOrders: DataFrame = OlistSilver.orders(OlistData.orders(s, d))
  lazy val silverItems: DataFrame = OlistSilver.orderItems(OlistData.orderItems(s, d))
  lazy val silverCustomers: DataFrame = OlistSilver.customers(OlistData.customers(s, d))
  lazy val silverProducts: DataFrame =
    OlistSilver.products(OlistData.products(s, d), OlistData.catTranslation(s))
  lazy val silverSellers: DataFrame = OlistSilver.sellers(OlistData.sellers(s, d))
  lazy val silverPayments: DataFrame = OlistSilver.payments(OlistData.payments(s, d))
  lazy val silverReviews: DataFrame =
    OlistSilver.reviews(OlistData.reviews(s, d), silverOrders)
  lazy val silverGeo: DataFrame = OlistSilver.geolocations(OlistData.geolocations(s))

  lazy val dimCustomers: DataFrame = OlistGold.dimCustomers(silverCustomers, silverGeo)
  lazy val dimSellers: DataFrame = OlistGold.dimSellers(silverSellers, silverGeo)
  lazy val dimProducts: DataFrame = OlistGold.dimProducts(silverProducts)
  lazy val dimOrders: DataFrame = OlistGold.dimOrders(silverOrders)
  lazy val dimDate: DataFrame = OlistGold.dimDate(silverOrders)
  lazy val factOrderItems: DataFrame = OlistGold.factOrderItems(
    silverItems, silverOrders, silverCustomers, dimOrders, dimCustomers,
    dimProducts, dimSellers, dimDate, silverPayments, silverReviews)
}
