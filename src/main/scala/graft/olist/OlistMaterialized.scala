package graft.olist

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dq.{Expectations => DQ}
import graft.pipeline.{Dataset, Materialize, Pipeline}

/** The COMMITTED medallion: one Pipeline run per scale dir materializes
  * every silver table and gold table into the session catalog, so the
  * consumption queries (g6 fact read, g9 revenue rollup) scan committed
  * parquet instead of re-deriving bronze+silver inline — the reference's
  * actual read path (`scripts/gold/fact_order_items.sql:86-112` reads
  * `LIVE.silver_*`, and BI reads the committed gold tables).
  *
  * Scale: this is the difference between O(pipeline) once plus O(scan)
  * per gold query, and O(pipeline) PER query — at 100 TB the silver
  * layer is derived exactly once per refresh and every downstream query
  * pays only its own scan. Within one JVM the materialization is
  * memoized per (session, dir); a fresh JVM re-runs the pipeline from
  * the CURRENT source dir (tables are dropped first), so committed
  * content can never go stale against the data under test.
  *
  * Silver tables flow through [[Materialize.Incremental]] keyed on their
  * natural keys — the reference's incremental streaming-table semantics
  * (first load = full batch; subsequent pipeline runs MERGE new/changed
  * keys, see PipelineSpec). Gold tables are [[Materialize.MaterializedView]]
  * full refreshes, exactly the reference's `CREATE OR REFRESH
  * MATERIALIZED VIEW`, with the fact carrying the reference's named
  * EXPECT constraints (`fact_order_items.sql:3-7`) enforced per refresh
  * and its TBLPROPERTIES recorded as informational catalog metadata.
  */
object OlistMaterialized {

  /** Catalog-safe suffix for a scale dir. Sanitization alone is LOSSY
    * ("/data/sf.1" and "/data/sf-1" both collapse to "data_sf_1", and
    * the in-JVM memo would then serve one dir's committed tables for
    * the other) — the appended hash of the RAW path makes the suffix
    * injective, so two dirs can never alias one table set. */
  def sfx(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]+", "_").toLowerCase
      .stripPrefix("_").stripSuffix("_") +
      "_" + graft.core.Scratch.sha8(dir)

  /** Committed table names for one scale dir. */
  final case class Names(suffix: String) {
    val silverOrders = s"olist_silver_orders_$suffix"
    val silverItems = s"olist_silver_order_items_$suffix"
    val silverCustomers = s"olist_silver_customers_$suffix"
    val silverProducts = s"olist_silver_products_$suffix"
    val silverSellers = s"olist_silver_sellers_$suffix"
    val silverPayments = s"olist_silver_payments_$suffix"
    val silverReviews = s"olist_silver_reviews_$suffix"
    val silverGeo = s"olist_silver_geolocations_$suffix"
    val dimCustomers = s"olist_gold_dim_customers_$suffix"
    val dimSellers = s"olist_gold_dim_sellers_$suffix"
    val dimProducts = s"olist_gold_dim_products_$suffix"
    val dimOrders = s"olist_gold_dim_orders_$suffix"
    val dimDate = s"olist_gold_dim_date_$suffix"
    val fact = s"olist_gold_fact_order_items_$suffix"
    /** Incremental (snapshot-committed) tables — their data lives under
      * versioned SnapshotCommit directories, not `<warehouse>/<name>`. */
    def silvers: Seq[String] = Seq(
      silverOrders, silverItems, silverCustomers, silverProducts,
      silverSellers, silverPayments, silverReviews, silverGeo)
    def all: Seq[String] = silvers ++ Seq(
      dimCustomers, dimSellers, dimProducts, dimOrders, dimDate, fact)
  }

  private val materialized = mutable.Set.empty[(SparkSession, String, String)]

  /** Property key recording which generation of the source dir a
    * committed medallion was derived from. */
  val FingerprintKey = "graft.source_fingerprint"

  /** Content fingerprint of the source dir: (name, size, mtime) of every
    * file, hashed. Cheap (one directory listing), and any regeneration
    * of the test data changes it. */
  def fingerprint(s: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(p).map(st =>
      s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString("|")
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(entries.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Commit the full medallion for `dir` — ONCE per generation of the
    * source data, not once per process: a marker file in the warehouse
    * records the source fingerprint the last successful run derived
    * from, and when it matches and every table's data dir survives, the
    * committed medallion is REUSED (the session catalog is in-memory
    * per JVM, so surviving locations are re-registered as tables). This
    * is the DLT split between a pipeline UPDATE and the queries that
    * read its tables — BI queries never pay the refresh. A fingerprint
    * mismatch (source dir regenerated) or any missing table dir drops
    * and rebuilds everything, so staleness is impossible; the marker is
    * written only AFTER a fully successful run, so a crashed build can
    * never masquerade as reusable. Returns the committed table names.
    */
  /** Bumped whenever the medallion's committed SCHEMAS/layout change in
    * code (the source-data fingerprint alone cannot see a code change,
    * so a warm warehouse would re-register tables built by the old
    * logic). v2: silver audit columns (processed_/modified_timestamp).
    * v3: multi-key CLUSTER BY switched to the Z-order layout. v4:
    * 4-key z-codes flip the sign bit (monotone signed ordering). v5:
    * silver tables commit through SnapshotCommit's versioned pointer
    * directories instead of managed `<warehouse>/<name>` dirs. v6:
    * size-derived file fan-out on batch materialization writes
    * ([[graft.storage.OptimizedWrite]]) — committed silver/gold file
    * counts change, so a warm warehouse must rebuild.
    */
  private val LayoutVersion = "v6"

  def ensure(s: SparkSession, dir: String): Names = synchronized {
    val n = Names(sfx(dir))
    val fp = fingerprint(s, dir) + "|" + LayoutVersion
    if (materialized.contains((s, n.suffix, fp))) return n
    val hconf = s.sparkContext.hadoopConfiguration
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val marker = new org.apache.hadoop.fs.Path(
      wh, s"_graft_medallion_${n.suffix}.fp")
    val fs = marker.getFileSystem(hconf)
    val priorFp =
      if (!fs.exists(marker)) None
      else scala.util.Try {
        val in = fs.open(marker)
        try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
      }.toOption
    val silver = n.silvers.toSet
    val sc = graft.storage.SnapshotCommit
    // Silver tables live under SnapshotCommit pointers; gold tables are
    // managed dirs at <warehouse>/<name>.
    def survives(t: String): Boolean =
      if (silver(t)) sc.currentLocation(s, t).isDefined
      else fs.exists(new org.apache.hadoop.fs.Path(wh, t))
    if (priorFp.contains(fp) && n.all.forall(survives)) {
      n.all.foreach { t =>
        if (!s.catalog.tableExists(t)) {
          if (silver(t)) sc.register(s, t)
          else s.sql(s"CREATE TABLE $t USING parquet LOCATION " +
            s"'${new org.apache.hadoop.fs.Path(wh, t)}'")
        }
      }
    } else {
      if (fs.exists(marker)) fs.delete(marker, false)
      // Deterministic rebuild: drop any tables a previous JVM committed
      // from a different generation of the source dir (destroy clears a
      // silver table's snapshot versions along with its registration).
      n.all.foreach(t =>
        if (silver(t)) sc.destroy(s, t)
        else s.sql(s"DROP TABLE IF EXISTS $t"))
      pipeline(dir, n, fp).run(s)
      val out = fs.create(marker, true)
      try out.write(fp.getBytes("UTF-8")) finally out.close()
    }
    materialized += ((s, n.suffix, fp))
    n
  }

  /** The full bronze→silver→gold DAG over committed tables. */
  def pipeline(dir: String, n: Names, sourceFingerprint: String = ""): Pipeline = {
    val layerProps = Map("layer" -> "analytics", "quality" -> "gold")
    new Pipeline()
      // ---- bronze: lazy staging views (DLT @dlt.view) ----
      .register(Dataset("b_orders", Nil, (sp, _) => OlistData.orders(sp, dir)))
      .register(Dataset("b_items", Nil, (sp, _) => OlistData.orderItems(sp, dir)))
      .register(Dataset("b_customers", Nil, (sp, _) => OlistData.customers(sp, dir)))
      .register(Dataset("b_products", Nil, (sp, _) => OlistData.products(sp, dir)))
      .register(Dataset("b_sellers", Nil, (sp, _) => OlistData.sellers(sp, dir)))
      .register(Dataset("b_payments", Nil, (sp, _) => OlistData.payments(sp, dir)))
      .register(Dataset("b_reviews", Nil, (sp, _) => OlistData.reviews(sp, dir)))
      .register(Dataset("b_geo", Nil, (sp, _) => OlistData.geolocations(sp)))
      .register(Dataset("b_cat", Nil, (sp, _) => OlistData.catTranslation(sp)))
      // ---- silver: incremental tables on natural keys ----
      .register(Dataset(n.silverOrders, Seq("b_orders"),
        (_, up) => OlistSilver.orders(up("b_orders")),
        expectations = Seq(
          DQ.fail("valid_order_id", col("order_id").isNotNull)),
        materialize = Materialize.Incremental(Seq("order_id"))))
      .register(Dataset(n.silverItems, Seq("b_items"),
        (_, up) => OlistSilver.orderItems(up("b_items")),
        materialize = Materialize.Incremental(Seq("order_id", "order_item_id"))))
      .register(Dataset(n.silverCustomers, Seq("b_customers"),
        (_, up) => OlistSilver.customers(up("b_customers")),
        materialize = Materialize.Incremental(Seq("customer_id"))))
      .register(Dataset(n.silverProducts, Seq("b_products", "b_cat"),
        (_, up) => OlistSilver.products(up("b_products"), up("b_cat")),
        materialize = Materialize.Incremental(Seq("product_id"))))
      .register(Dataset(n.silverSellers, Seq("b_sellers"),
        (_, up) => OlistSilver.sellers(up("b_sellers")),
        materialize = Materialize.Incremental(Seq("seller_id"))))
      .register(Dataset(n.silverPayments, Seq("b_payments"),
        (_, up) => OlistSilver.payments(up("b_payments")),
        materialize = Materialize.Incremental(
          Seq("order_id", "payment_sequential"))))
      .register(Dataset(n.silverReviews, Seq("b_reviews", n.silverOrders),
        (_, up) => OlistSilver.reviews(up("b_reviews"), up(n.silverOrders)),
        materialize = Materialize.Incremental(Seq("review_id"))))
      .register(Dataset(n.silverGeo, Seq("b_geo"),
        (_, up) => OlistSilver.geolocations(up("b_geo")),
        materialize = Materialize.Incremental(
          Seq("geolocation_zip_code_prefix", "geolocation_lat"))))
      // ---- gold: materialized-view refreshes over committed silver ----
      .register(Dataset(n.dimCustomers, Seq(n.silverCustomers, n.silverGeo),
        (_, up) => OlistGold.dimCustomers(up(n.silverCustomers), up(n.silverGeo)),
        materialize = Materialize.MaterializedView,
        tableProperties = layerProps +
          ("constraint.pk_dim_customers" -> "PRIMARY KEY (customer_key) NOT ENFORCED")))
      .register(Dataset(n.dimSellers, Seq(n.silverSellers, n.silverGeo),
        (_, up) => OlistGold.dimSellers(up(n.silverSellers), up(n.silverGeo)),
        materialize = Materialize.MaterializedView,
        tableProperties = layerProps +
          ("constraint.pk_dim_sellers" -> "PRIMARY KEY (seller_key) NOT ENFORCED")))
      .register(Dataset(n.dimProducts, Seq(n.silverProducts),
        (_, up) => OlistGold.dimProducts(up(n.silverProducts)),
        materialize = Materialize.MaterializedView,
        tableProperties = layerProps +
          ("constraint.pk_dim_products" -> "PRIMARY KEY (product_key) NOT ENFORCED")))
      .register(Dataset(n.dimOrders, Seq(n.silverOrders),
        (_, up) => OlistGold.dimOrders(up(n.silverOrders)),
        materialize = Materialize.MaterializedView,
        tableProperties = layerProps +
          ("constraint.pk_dim_orders" -> "PRIMARY KEY (order_key) NOT ENFORCED")))
      .register(Dataset(n.dimDate, Seq(n.silverOrders),
        (_, up) => OlistGold.dimDate(up(n.silverOrders)),
        materialize = Materialize.MaterializedView,
        tableProperties = layerProps +
          ("constraint.pk_dim_date" -> "PRIMARY KEY (date_key) NOT ENFORCED")))
      .register(Dataset(n.fact,
        Seq(n.silverItems, n.silverOrders, n.silverCustomers, n.dimOrders,
          n.dimCustomers, n.dimProducts, n.dimSellers, n.dimDate,
          n.silverPayments, n.silverReviews),
        (_, up) => OlistGold.factOrderItems(
          up(n.silverItems), up(n.silverOrders), up(n.silverCustomers),
          up(n.dimOrders), up(n.dimCustomers), up(n.dimProducts),
          up(n.dimSellers), up(n.dimDate), up(n.silverPayments),
          up(n.silverReviews)),
        // The reference's named EXPECT constraints on the fact
        // (fact_order_items.sql:3-7), enforced per refresh.
        expectations = Seq(
          DQ.fail("fk_product", col("product_key").isNotNull),
          DQ.fail("fk_order", col("order_key").isNotNull),
          DQ.fail("valid_item_price",
            col("item_price").isNotNull && col("item_price") >= 0),
          DQ.warn("valid_item_total",
            col("item_total_value").isNotNull && col("item_total_value") >= 0),
          DQ.fail("valid_order_date", col("order_date_key").isNotNull)),
        materialize = Materialize.MaterializedView,
        // The 10-join fact build is the one plan expensive enough that
        // re-running it for the expectations aggregate would dominate —
        // stage once, validate the staged copy, commit from it.
        validateStaged = true,
        // CLUSTER BY (product_key, seller_key, order_date_key,
        // customer_key) — fact_order_items.sql:9; range layout + in-file
        // sort gives min/max data skipping on the dominant filter keys.
        clusterBy = Seq("product_key", "seller_key", "order_date_key",
          "customer_key"),
        tableProperties = layerProps ++ Map(
          FingerprintKey -> sourceFingerprint,
          "comment" -> "This table provides order items transactions.",
          "constraint.pk_fact_order_items" ->
            "PRIMARY KEY (order_item_key) NOT ENFORCED",
          "constraint.fk_order" ->
            "FOREIGN KEY (order_key) REFERENCES gold_dim_orders(order_key) NOT ENFORCED",
          "constraint.fk_customer" ->
            "FOREIGN KEY (customer_key) REFERENCES gold_dim_customers(customer_key) NOT ENFORCED",
          "constraint.fk_product" ->
            "FOREIGN KEY (product_key) REFERENCES gold_dim_products(product_key) NOT ENFORCED",
          "constraint.fk_seller" ->
            "FOREIGN KEY (seller_key) REFERENCES gold_dim_sellers(seller_key) NOT ENFORCED",
          "constraint.fk_order_date" ->
            "FOREIGN KEY (order_date_key) REFERENCES gold_dim_date(date_key) NOT ENFORCED")))
  }
}
