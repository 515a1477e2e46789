package graft.queries

import org.apache.spark.sql.functions._

import graft.olist.{OlistGraph, OlistOracle}

/** Driver-checked gold queries for the Olist medallion (the reference's
  * actual end product): each builds the full bronze→silver→gold chain
  * from the harness tables and is hash-compared against a DuckDB oracle
  * that derives the identical Olist datasets and transcribes the
  * reference's silver/gold SQL (see graft.olist).
  *
  * g1 also closes SURVEY.md §2 rows J10/J11 + A4 as ONE composed query
  * (left join against the window-deduped, ANY_VALUE-grouped geolocation
  * subquery — dim_customers.sql:25-41).
  */
object OlistQueries {

  import QuerySpec._

  val g1DimCustomers = withOracle(
    "g1_dim_customers", OlistOracle.sql("gold_dim_customers")) { (s, d) =>
    new OlistGraph(s, d).dimCustomers
  }

  val g2DimSellers = withOracle(
    "g2_dim_sellers", OlistOracle.sql("gold_dim_sellers")) { (s, d) =>
    new OlistGraph(s, d).dimSellers
  }

  val g3DimProducts = withOracle(
    "g3_dim_products", OlistOracle.sql("gold_dim_products")) { (s, d) =>
    new OlistGraph(s, d).dimProducts
  }

  val g4DimOrders = withOracle(
    "g4_dim_orders", OlistOracle.sql("gold_dim_orders")) { (s, d) =>
    new OlistGraph(s, d).dimOrders
  }

  val g5DimDate = withOracle(
    "g5_dim_date", OlistOracle.dimDateSql) { (s, d) =>
    new OlistGraph(s, d).dimDate
      .withColumn("date_actual", col("date_actual").cast("string"))
  }

  val g6FactOrderItems = withOracle(
    "g6_fact_order_items", OlistOracle.sql("gold_fact_order_items")) { (s, d) =>
    new OlistGraph(s, d).factOrderItems
  }

  val specs: Seq[QuerySpec] = Seq(
    g1DimCustomers, g2DimSellers, g3DimProducts, g4DimOrders, g5DimDate,
    g6FactOrderItems)
}
