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
  *    `<table>__dv` sidecar table, stamped with a monotonically
  *    increasing DELETE VERSION. The DATA FILES ARE NOT TOUCHED
  *    (StorageSpec pins their names and sizes across a delete);
  *    repeated deletes accumulate.
  *  - [[read]] subtracts the sidecar with a BROADCAST left-anti join on
  *    (file, pos) — deletes are bounded between compactions, so the
  *    subtraction is map-side, no shuffle of the table.
  *  - [[readAt]] is the TIME-TRAVEL read (`SELECT ... VERSION AS OF v`):
  *    subtract only the vectors stamped <= v. Version 0 is the
  *    pre-delete table. Because data files are immutable and deletes
  *    only append, every historical version stays readable at zero
  *    storage cost beyond the sidecar.
  *  - [[restore]] rolls the LIVE view back (Delta's `RESTORE TABLE ...
  *    TO VERSION AS OF v`): drop sidecar entries stamped > v — a
  *    sidecar-only rewrite, no data IO.
  *  - [[compact]] folds the vectors in: rewrites the surviving rows,
  *    truncates the sidecar (Delta's `REORG TABLE ... APPLY PURGE`).
  *    History before the compaction is no longer reachable — exactly
  *    Delta's VACUUM/REORG trade.
  *
  * Scale: delete cost = one column-pruned scan + a sidecar append of
  * matched coordinates; read overhead = a broadcast hash anti-join
  * probe per row; restore touches only the sidecar. Single writer
  * assumed (the Delta difference is durability bookkeeping — its log
  * arbitrates concurrent writers and tracks DV files per version); the
  * query-visible semantics are identical.
  */
object DeletionVectors {

  private def dvName(table: String) = s"${table}__dv"

  private def withCoords(df: DataFrame): DataFrame = df
    .withColumn("_dv_file", col("_metadata.file_path"))
    .withColumn("_dv_pos", col("_metadata.row_index"))

  /** Latest delete version: 0 before any delete, else the highest
    * stamp in the sidecar (a 1-row aggregate over the bounded sidecar).
    */
  def version(spark: SparkSession, table: String): Long =
    if (!spark.catalog.tableExists(dvName(table))) 0L
    else spark.table(dvName(table))
      .agg(coalesce(max(col("v")), lit(0L))).head().getLong(0)

  /** Mark rows matching `pred` deleted: append their physical
    * coordinates to the sidecar under the next delete version. No data
    * file changes. Returns the new version.
    */
  def delete(spark: SparkSession, table: String, pred: Column): Long = {
    val v = version(spark, table) + 1
    withCoords(spark.table(table)).filter(pred)
      .select(col("_dv_file").as("f"), col("_dv_pos").as("p"),
        lit(v).as("v"))
      .write.mode("append").format("parquet").saveAsTable(dvName(table))
    v
  }

  /** The live view: table rows minus the whole deletion vector. */
  def read(spark: SparkSession, table: String): DataFrame =
    readAt(spark, table, Long.MaxValue)

  /** Time travel: the table as of delete version `v` — subtract only
    * vectors stamped <= v (version 0 = before any delete). Immutable
    * data files + append-only sidecar make every version readable
    * without snapshot copies.
    */
  def readAt(spark: SparkSession, table: String, v: Long): DataFrame = {
    val base = spark.table(table)
    if (!spark.catalog.tableExists(dvName(table))) base
    else withCoords(base)
      .join(broadcast(
          spark.table(dvName(table)).filter(col("v") <= v).select("f", "p")),
        col("_dv_file") === col("f") && col("_dv_pos") === col("p"),
        "left_anti")
      .drop("_dv_file", "_dv_pos")
  }

  /** RESTORE TABLE ... TO VERSION AS OF `v`: drop every sidecar entry
    * stamped after `v`. Sidecar-only rewrite — the data files were
    * never touched, so rolling back deletes is metadata work.
    */
  def restore(spark: SparkSession, table: String, v: Long): Unit = {
    val dv = dvName(table)
    if (spark.catalog.tableExists(dv)) {
      val staging = spark.conf.get("spark.sql.warehouse.dir") +
        s"/_graft_staging/${table}_dv_restore"
      spark.table(dv).filter(col("v") <= v)
        .write.mode("overwrite").parquet(staging)
      spark.read.parquet(staging)
        .write.mode("overwrite").format("parquet").saveAsTable(dv)
      val p = new org.apache.hadoop.fs.Path(staging)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
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
