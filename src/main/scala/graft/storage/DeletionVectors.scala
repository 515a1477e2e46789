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

  /** VACUUM with a retention floor: fold every delete stamped `<= cutoff`
    * INTO the data files and drop those sidecar entries — Delta's
    * `VACUUM` trade, where versions older than the retention window stop
    * being readable (time travel below the floor returns the floor
    * state) and the storage they pinned is reclaimed.
    *
    * Unlike [[compact]] (which folds EVERYTHING and drops the whole
    * history), vacuum must keep versions `> cutoff` readable, which is
    * the hard part: rewriting a file renumbers `row_index`, so every
    * surviving sidecar entry that points into a rewritten file needs its
    * physical coordinates REBASED. The rebase map is pure arithmetic,
    * no data movement: a surviving row's new position is its rank (by
    * old position) among the file's survivors, computed from a
    * coordinates-only column-pruned scan. The rewrite itself is
    * proportional to the AFFECTED files (those holding a folded row) —
    * untouched files keep their coordinates and are not rewritten, so
    * vacuum cost tracks delete locality, not table size.
    *
    * Write layout: survivors are hash-partitioned by source file and
    * written `partitionBy` a per-file group id, each group sorted by old
    * position — one task owns a group, so each group directory holds
    * exactly one part file whose row order (hence `row_index`) is the
    * ascending old-position order the rebase map predicts. The group
    * files are then renamed into the live directory (file content never
    * contains the group id — partition columns live in the path).
    *
    * A `(_floor, -1, cutoff)` sentinel row is appended to the sidecar:
    * its synthetic coordinates match no data row (harmless to reads) but
    * keep [[version]] monotonic even when vacuum folds every real entry,
    * so later deletes can never reuse a historical version number.
    */
  def vacuum(spark: SparkSession, table: String, cutoff: Long): Unit = {
    val dv = dvName(table)
    if (!spark.catalog.tableExists(dv)) return
    import org.apache.spark.sql.expressions.Window
    val sidecar = spark.table(dv)
    val folded = sidecar.filter(col("v") <= cutoff && col("p") >= 0)
      .select("f", "p").distinct().cache()
    val affected = folded.select("f").distinct()
      .collect().map(_.getString(0)).sorted
    if (affected.isEmpty) { folded.unpersist(); return }

    val hconf = spark.sparkContext.hadoopConfiguration
    val schema = spark.table(table).schema
    val dataCols = schema.fieldNames.toSeq

    // Rebase map from a coordinates-only scan: survivor (f, p) ->
    // new position = rank among the file's survivors by old position.
    val gfIdx = affected.zipWithIndex.toSeq
    val gfMap = spark.createDataFrame(gfIdx).toDF("_mf", "_gf")
    val affectedRows = spark.read.schema(schema)
      .parquet(affected.map(u => new org.apache.hadoop.fs.Path(u)
        .toUri.getPath): _*)
      .withColumn("_f", col("_metadata.file_path"))
      .withColumn("_p", col("_metadata.row_index"))
    val survivors = affectedRows
      .join(broadcast(folded),
        col("_f") === col("f") && col("_p") === col("p"), "left_anti")
    val rebase = survivors.select(col("_f"), col("_p"))
      .withColumn("_np",
        (row_number().over(Window.partitionBy(col("_f")).orderBy(col("_p")))
          - 1).cast("long"))

    // One part file per affected source file, rows in old-position order.
    val staging = spark.conf.get("spark.sql.warehouse.dir") +
      s"/_graft_staging/${table}_dv_vacuum"
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    val fs = stagingPath.getFileSystem(hconf)
    fs.delete(stagingPath, true)
    survivors
      .join(broadcast(gfMap), col("_f") === col("_mf"))
      .repartition(col("_gf"))
      .sortWithinPartitions(col("_gf"), col("_p"))
      .select(dataCols.map(col) :+ col("_gf"): _*)
      .write.partitionBy("_gf").parquet(staging)

    // Rebased sidecar for surviving versions, pointing at the new files.
    // The new `f` strings are derived by replacing the BASENAME of the
    // old sidecar strings (which are whatever representation
    // `_metadata.file_path` produced), never reconstructed from the
    // catalog location — a scheme/slash-count difference between the
    // two representations would silently break every future readAt join.
    // A file whose every row was folded leaves no staging group — it is
    // simply deleted, and (having no survivors) can carry no rebased
    // sidecar entry either.
    val newFileOf: Map[Int, org.apache.hadoop.fs.Path] = gfIdx.flatMap {
      case (_, i) =>
        val dir = new org.apache.hadoop.fs.Path(stagingPath, s"_gf=$i")
        if (!fs.exists(dir)) None
        else {
          val parts = fs.listStatus(dir)
            .filter(_.getPath.getName.endsWith(".parquet"))
          require(parts.length == 1,
            s"expected one part file per vacuum group, got ${parts.length} in $dir")
          Some(i -> parts.head.getPath)
        }
    }.toMap
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val liveNameOf: Map[String, String] = gfIdx.collect {
      case (f, i) if newFileOf.contains(i) =>
        val base = s"vacuum-$nonce-$i-${newFileOf(i).getName}"
        f -> (f.substring(0, f.lastIndexOf('/') + 1) + base)
    }.toMap
    val liveNameMap = spark.createDataFrame(liveNameOf.toSeq)
      .toDF("_rf", "_newf")
    val affectedSet = spark.createDataFrame(gfIdx).toDF("_af", "_i")
    val keptEntries = sidecar.filter(col("v") > cutoff && col("p") >= 0)
    val rebasedAffected = keptEntries
      .join(broadcast(affectedSet), col("f") === col("_af"))
      .join(rebase, col("f") === col("_f") && col("p") === col("_p"))
      .join(broadcast(liveNameMap), col("f") === col("_rf"))
      .select(col("_newf").as("f"), col("_np").as("p"), col("v"))
    val untouchedEntries = keptEntries
      .join(broadcast(affectedSet), col("f") === col("_af"), "left_anti")
      .select("f", "p", "v")
    val floor = spark.createDataFrame(
      Seq(("_floor", -1L, math.max(cutoff, version(spark, table)))))
      .toDF("f", "p", "v")
    val newSidecar = untouchedEntries.unionByName(rebasedAffected)
      .unionByName(floor)

    val sideStaging = spark.conf.get("spark.sql.warehouse.dir") +
      s"/_graft_staging/${table}_dv_vacuum_sidecar"
    newSidecar.write.mode("overwrite").parquet(sideStaging)
    folded.unpersist()

    // Swap: drop folded files, move rewritten groups in, refresh both
    // tables. (Same non-atomicity note as the file-level MERGE — the
    // transaction log is what Delta adds over this.)
    affected.foreach { f =>
      fs.delete(new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(f).toUri.getPath), false)
    }
    gfIdx.foreach { case (f, i) =>
      if (newFileOf.contains(i)) {
        require(fs.rename(newFileOf(i), new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(liveNameOf(f)).toUri.getPath)),
          s"could not move vacuum group $i next to $f")
      }
    }
    fs.delete(stagingPath, true)
    spark.read.parquet(sideStaging)
      .write.mode("overwrite").format("parquet").saveAsTable(dv)
    val sp = new org.apache.hadoop.fs.Path(sideStaging)
    sp.getFileSystem(hconf).delete(sp, true)
    spark.sql(s"REFRESH TABLE $table")
    spark.sql(s"REFRESH TABLE $dv")
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
