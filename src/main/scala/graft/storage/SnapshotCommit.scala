package graft.storage

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

/** Manifest-pointer table commits — the minimal slice of a Delta/Iceberg
  * transaction log that closes the non-atomic snapshot-swap window.
  *
  * The reference's tables inherit atomic commits from Delta
  * (`scripts/gold/fact_order_items.sql:11-18` tblproperties assume the
  * transaction log); without Delta jars the engine previously staged a
  * new snapshot and swapped it under the live directory with
  * delete-then-rename — a crash between the two left NO readable table.
  * This utility removes that window:
  *
  *  - every version of a table lives in its own immutable directory
  *    `<warehouse>/_graft_snapshots/<table>/v<N>/`;
  *  - publishing version N is ONE atomic filesystem operation: a
  *    create-rename of the pointer file `_commits/<N>` (written first to
  *    a dot-tmp name, then renamed into place — rename within a
  *    directory is atomic on POSIX and HDFS, and the target name is
  *    never reused, so it can never clobber);
  *  - readers resolve the CURRENT version as the highest-numbered
  *    pointer file whose snapshot directory exists. A crash before the
  *    rename leaves the old pointer current (staged files are invisible
  *    garbage, reclaimed by the next commit); a crash after it leaves
  *    the new version current (catalog registration and pruning are
  *    replayed by the next [[register]]/[[commit]]). At every instant a
  *    reader sees exactly the old or the new version — never a
  *    half-swapped directory.
  *
  * Snapshots share unchanged data files by HARD LINK ([[carry]]): a
  * file-level merge carries the untouched files of version N into
  * version N+1 as directory entries, not copies, so version cost is
  * proportional to rewritten bytes — the same economics as Delta's
  * log entries referencing unchanged files. (On a non-POSIX store the
  * carry falls back to a copy; a production port would reference files
  * in place from a manifest instead, which is pure metadata.)
  *
  * Single writer per table assumed, as documented for the merge path —
  * what Delta's log ADDS over this is multi-writer arbitration (optimistic
  * concurrency over the same commit names) and per-commit metadata.
  */
object SnapshotCommit {

  /** Test-only failure injection: invoked with "staged" after the new
    * snapshot directory is fully written but BEFORE the pointer rename,
    * and "committed" after the rename but before catalog registration
    * and pruning. PipelineSpec kills the protocol at both points and
    * proves every read still resolves a complete version.
    */
  private[graft] var failpoint: String => Unit = _ => ()

  def rootDir(spark: SparkSession, table: String): Path =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"_graft_snapshots/$table")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitsPath(root: Path) = new Path(root, "_commits")

  private def versionOf(name: String): Option[Long] =
    if (name.forall(_.isDigit) && name.nonEmpty) Some(name.toLong) else None

  /** Highest published version whose snapshot directory exists. */
  def currentVersion(spark: SparkSession, table: String): Option[Long] = {
    val root = rootDir(spark, table)
    val fs = fsOf(spark, root)
    val c = commitsPath(root)
    if (!fs.exists(c)) None
    else fs.listStatus(c).toSeq
      .flatMap(st => versionOf(st.getPath.getName))
      .sorted(Ordering[Long].reverse)
      .find(v => fs.exists(new Path(root, s"v$v")))
  }

  /** The current snapshot directory, if any version has been published. */
  def currentLocation(spark: SparkSession, table: String): Option[Path] =
    currentVersion(spark, table).map(v => new Path(rootDir(spark, table), s"v$v"))

  /** Stage a new snapshot via `write` (handed the staging directory,
    * which it must fully populate), then publish it with the single
    * pointer rename, re-point the catalog, and prune superseded
    * versions. Returns the published location.
    */
  def commit(spark: SparkSession, table: String)(
      write: String => Unit): Path = {
    val root = rootDir(spark, table)
    val fs = fsOf(spark, root)
    fs.mkdirs(commitsPath(root))
    val v = currentVersion(spark, table).getOrElse(0L) + 1
    val snap = new Path(root, s"v$v")
    if (fs.exists(snap)) fs.delete(snap, true) // crashed prior attempt
    write(snap.toString)
    failpoint("staged")
    val tmp = new Path(commitsPath(root), s".$v.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"v$v".getBytes("UTF-8")) finally out.close()
    require(fs.rename(tmp, new Path(commitsPath(root), v.toString)),
      s"could not publish snapshot v$v of $table")
    failpoint("committed")
    register(spark, table)
    prune(spark, table, keep = v)
    snap
  }

  /** Align the session catalog with the published pointer: create the
    * external table at the current location, or re-point a stale
    * registration. Safe to call any time; replays the tail of a commit
    * interrupted after its pointer rename.
    */
  def register(spark: SparkSession, table: String): Unit =
    currentLocation(spark, table).foreach(pointAt(spark, table, _))

  /** Create `table` at `loc`, or re-point a registration whose catalog
    * location differs. Also used for sidecar tables that live INSIDE a
    * snapshot (DeletionVectors' `_dv`). */
  def pointAt(spark: SparkSession, table: String, loc: Path): Unit =
    if (!spark.catalog.tableExists(table))
      spark.sql(s"CREATE TABLE $table USING parquet LOCATION '$loc'")
    else {
      val cat = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      if (new Path(cat.location).toUri.getPath != loc.toUri.getPath) {
        spark.sql(s"ALTER TABLE $table SET LOCATION '$loc'")
        spark.sql(s"REFRESH TABLE $table")
      }
    }

  /** Delete snapshot directories and pointer files below `keep`. Shared
    * (linked) data files survive through the newer version's directory
    * entries. Crash-safe: interrupted pruning just leaves garbage that
    * the next prune removes.
    */
  private def prune(spark: SparkSession, table: String, keep: Long): Unit = {
    val root = rootDir(spark, table)
    val fs = fsOf(spark, root)
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("v") && versionOf(n.drop(1)).exists(_ < keep))
        fs.delete(st.getPath, true)
    }
    val c = commitsPath(root)
    if (fs.exists(c)) fs.listStatus(c).foreach { st =>
      if (versionOf(st.getPath.getName).exists(_ < keep))
        fs.delete(st.getPath, false)
    }
  }

  /** Drop the table and delete every version — the clean-slate used when
    * a pipeline (re)builds from scratch. */
  def destroy(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val root = rootDir(spark, table)
    val fs = fsOf(spark, root)
    if (fs.exists(root)) fs.delete(root, true)
  }

  /** Carry an unchanged file into a staged snapshot WITHOUT disturbing
    * the live version: hard link on a local filesystem (a directory
    * entry, no IO), copy elsewhere. Never a rename — the source must
    * stay readable until the new version is published.
    */
  def carry(spark: SparkSession, src: Path, dst: Path): Unit = {
    val fs = fsOf(spark, dst)
    if (dst.getParent != null) fs.mkdirs(dst.getParent)
    val linked = fs.getScheme == "file" &&
      (try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(src.toUri.getPath))
        true
      } catch { case e: Throwable =>
        System.err.println(s"[snapshot] link $src -> $dst failed: $e"); false })
    if (!linked)
      org.apache.hadoop.fs.FileUtil.copy(
        fsOf(spark, src), src, fs, dst, false,
        spark.sparkContext.hadoopConfiguration)
  }
}
