package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deletion-vector stand-in — the reference's tables declare
  * `delta.enableDeletionVectors = true` (`scripts/gold/
  * fact_order_items.sql:7`): a DELETE marks rows dead in a per-file
  * bitmap instead of rewriting the files, and readers subtract the
  * bitmap on scan. The environment has no Delta jars, but Spark's
  * parquet reader exposes the two physical coordinates a DV needs —
  * `_metadata.file_path` and `_metadata.row_index` (the row's stable
  * position inside its file) — so the same contract runs on plain
  * parquet:
  *
  *  - [[delete]] appends the matched rows' (file, pos) pairs to a
  *    `<table>__dv` sidecar table. The DATA FILES ARE NOT TOUCHED
  *    (StorageSpec pins their names and sizes across a delete);
  *    repeated deletes accumulate.
  *  - [[read]] subtracts the sidecar with a BROADCAST left-anti join on
  *    (file, pos) — deletes are bounded between compactions, so the
  *    subtraction is map-side, no shuffle of the table.
  *  - [[compact]] folds the vectors in: rewrites the surviving rows,
  *    truncates the sidecar (Delta's `REORG TABLE ... APPLY PURGE`).
  *
  * Scale: delete cost = one column-pruned scan + a sidecar append of
  * matched coordinates; read overhead = a broadcast hash anti-join
  * probe per row. The Delta difference is durability bookkeeping (its
  * log tracks DV files per version); the query-visible semantics are
  * identical.
  */
object DeletionVectors {

  private def dvName(table: String) = s"${table}__dv"

  private def withCoords(df: DataFrame): DataFrame = df
    .withColumn("_dv_file", col("_metadata.file_path"))
    .withColumn("_dv_pos", col("_metadata.row_index"))

  /** Mark rows matching `pred` deleted: append their physical
    * coordinates to the sidecar. No data file changes.
    */
  def delete(spark: SparkSession, table: String, pred: Column): Unit =
    withCoords(spark.table(table)).filter(pred)
      .select(col("_dv_file").as("f"), col("_dv_pos").as("p"))
      .write.mode("append").format("parquet").saveAsTable(dvName(table))

  /** The live view: table rows minus the deletion vector. */
  def read(spark: SparkSession, table: String): DataFrame = {
    val base = spark.table(table)
    if (!spark.catalog.tableExists(dvName(table))) base
    else withCoords(base)
      .join(broadcast(spark.table(dvName(table))),
        col("_dv_file") === col("f") && col("_dv_pos") === col("p"),
        "left_anti")
      .drop("_dv_file", "_dv_pos")
  }

  /** Fold the vectors into the files: rewrite survivors, drop the
    * sidecar (REORG ... APPLY PURGE). */
  def compact(spark: SparkSession, table: String): Unit = {
    val survivors = read(spark, table)
    val staging = spark.conf.get("spark.sql.warehouse.dir") +
      s"/_graft_staging/${table}_dv_compact"
    survivors.write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging)
      .write.mode("overwrite").format("parquet").saveAsTable(table)
    spark.sql(s"DROP TABLE IF EXISTS ${dvName(table)}")
    val p = new org.apache.hadoop.fs.Path(staging)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
