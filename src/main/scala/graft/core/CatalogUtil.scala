package graft.core

import org.apache.spark.sql.SparkSession

object CatalogUtil {

  /** With an in-memory catalog, a managed table's warehouse directory can
    * outlive its catalog entry (new JVM, same warehouse dir) and
    * re-creation then fails with LOCATION_ALREADY_EXISTS. If the catalog
    * has no record of the table, any leftover location (and optional
    * companion dirs, e.g. a stream checkpoint) is an orphan from a lost
    * catalog — remove it and let the caller rebuild. With a persistent
    * metastore the entry survives alongside the data, so this never
    * triggers.
    */
  def dropOrphanLocation(spark: SparkSession, name: String,
      extraDirs: Seq[String] = Nil): Unit =
    if (!spark.catalog.tableExists(name)) {
      val hconf = spark.sparkContext.hadoopConfiguration
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
      (wh +: extraDirs.map(new org.apache.hadoop.fs.Path(_))).foreach { p =>
        val fs = p.getFileSystem(hconf)
        if (fs.exists(p)) fs.delete(p, true)
      }
    }
}
