package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.storage.SnapshotCommit

/** STREAMING SOURCE OVER THE SNAPSHOT VERSION CHAIN — the engine's
  * `spark.readStream.table(...)` parity, and the reference's core
  * dependency mechanism: every silver table is a STREAMING read of a
  * committed upstream table
  * (`/root/reference/scripts/silver/Silver_orders.py:12`
  * `dlt.readStream("bronze.bronze_orders")`,
  * `scripts/silver/silver_customers.py:13`
  * `dlt.read_stream("live.silver_orders")`), which Delta serves by
  * tailing its transaction log. Here the log is the `_commits` pointer
  * chain: OFFSETS ARE VERSION NUMBERS, and a micro-batch is the set of
  * data files APPENDED between two versions.
  *
  * ```
  * spark.readStream.format("graft-table").option("table", t).load()
  * ```
  *
  * HOW A BATCH IS DERIVED. Carried files keep their basenames across
  * versions (the SnapshotCommit carry contract — also what keeps DV
  * coordinates stable), so the appended set between versions is a
  * basename DIFF. The source records each version's basename listing in
  * a tiny per-version manifest under its checkpoint `metadataPath` the
  * moment it first OBSERVES the version ([[getOffset]]): `getBatch`
  * then never needs the historical version DIRECTORIES — prune retains
  * only (current, previous), and a restart may replay offsets whose
  * directories are long gone, but the manifests are durable with the
  * checkpoint, and the NAMES they record still resolve against the
  * CURRENT version (same physical bytes, carried forward). This is the
  * FileStreamSource-log pattern with version numbers for batch ids.
  *
  * EXACTLY-ONCE. The WAL replays `getBatch(lastCommitted, walEnd)` on
  * restart; both endpoints' manifests exist (written before the offset
  * was ever returned), so the replayed batch is byte-identical.
  * [[commit]] garbage-collects manifests strictly below the committed
  * offset (the committed one itself stays — it is the next batch's
  * start anchor).
  *
  * CHANGE COMMITS FAIL LOUDLY (Delta's default for a streaming read):
  * a version that REMOVES a basename (UPDATE/MERGE rewrite, OPTIMIZE,
  * vacuum fold) or touches the `_dv` deletion-vector sidecar (DELETE,
  * RESTORE) is not an append — streaming past it would silently miss
  * (or resurrect) rows. `.option("skipChangeCommits", "true")` opts
  * into Delta's skip semantics: removals and DV changes are ignored and
  * only appended basenames stream (the approximation is documented: a
  * rewrite's OUTPUT files are indistinguishable from appends at the
  * name level, so unlike Delta the rewritten rows DO stream — set the
  * option only on targets whose non-append commits are maintenance-
  * only, e.g. OPTIMIZE compaction, exactly the Delta guidance).
  *
  * SCALE. getOffset is one pointer listing; a batch plans from two
  * manifest reads plus one current-version listing — never a scan of
  * table history. The batch itself is a parquet scan of exactly the new
  * files. At a million files the manifests are the FileStreamSource
  * economics: O(files per version) metadata, not O(table).
  */
class GraftTableSource(sqlContext: SQLContext, metadataPath: String,
    table: String, skipChangeCommits: Boolean) extends Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  private val spark: SparkSession = sqlContext.sparkSession

  /** Trigger.AvailableNow contract: versions published AFTER the
    * trigger fired are not served by this run — the cap is the version
    * current at prepare time (matching Delta's available-now snapshot
    * semantics; without this Spark falls back to single-batch execution
    * whose restart-with-uncommitted-batch behavior is weaker). */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = SnapshotCommit.register(spark, table)

  /** Admission-control face of [[getOffset]] (the AvailableNow mixin
    * extends SupportsAdmissionControl; MicroBatchExecution prefers this
    * entry point when present). Read limits are not applied — a version
    * is the atomic unit here, as a commit is in Delta's source. */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    getOffset.orNull

  // Schema pinned at stream start (Delta pins it per stream too;
  // widening commits require a stream restart).
  override val schema: StructType = {
    SnapshotCommit.register(spark, table).getOrElse(sys.error(
      s"graft-table stream over $table: table has no published version"))
    SnapshotCommit.readData(spark, table).schema
  }

  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir = new Path(metadataPath, "graft-versions")

  private def manifestPath(v: Long) = new Path(manifestDir, v.toString)

  /** The version's observed state: its DV fingerprint line plus the
    * data-file basenames. */
  private case class VersionState(dvFingerprint: String, names: Set[String])

  /** One tiny fingerprint of the version's `_dv` sidecar: sorted
    * name:length pairs. Carries preserve names AND bytes, so an append
    * keeps the fingerprint; any DELETE/RESTORE/VACUUM rewrites the
    * sidecar files and changes it. */
  private def dvFingerprint(dir: Path): String = {
    val dv = new Path(dir, "_dv")
    val f = fs(dv)
    if (!f.exists(dv)) "-"
    else f.listStatus(dv).toSeq.filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith("."))
      .map(s => s"${s.getPath.getName}:${s.getLen}")
      .sorted.mkString(",")
  }

  /** Record version `v`'s manifest if not already recorded. No-clobber:
    * a concurrent recovery attempt writing the same version loses the
    * rename benignly (version listings are immutable, both writers
    * recorded the same content). */
  private def ensureManifest(v: Long, dir: Path): Unit = {
    val p = manifestPath(v)
    val f = fs(p)
    if (f.exists(p)) return
    f.mkdirs(manifestDir)
    val names = SnapshotCommit.listData(spark, dir).map(_._1)
    val body = (dvFingerprint(dir) +: names.sorted).mkString("\n")
    val tmp = new Path(manifestDir, s".${v}-${java.util.UUID.randomUUID()}.tmp")
    val out = f.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, p)) f.delete(tmp, false) // lost a benign race
  }

  private def readManifest(v: Long): VersionState = {
    val p = manifestPath(v)
    val f = fs(p)
    if (!f.exists(p)) {
      // Not yet recorded (e.g. a WAL offset written by a crashed
      // instance whose manifest write raced the crash): recoverable
      // ONLY while the version directory still resolves.
      val dir = SnapshotCommit.resolveDir(spark, table, v).getOrElse(
        sys.error(s"graft-table stream over $table: version v$v has " +
          "no manifest and its directory is pruned — the checkpoint " +
          "predates this source's metadata; restart the stream fresh"))
      ensureManifest(v, dir)
    }
    val in = f.open(p)
    val lines =
      try new String(in.readAllBytes(), "UTF-8").split("\n", -1).toSeq
      finally in.close()
    VersionState(lines.head, lines.tail.filter(_.nonEmpty).toSet)
  }

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] = {
    val current = SnapshotCommit.register(spark, table)
    val capped = availableNowCap match {
      case Some(cap) => current.map(math.min(_, cap))
      case None => current
    }
    capped.map { v =>
      // Manifest BEFORE the offset escapes: once the WAL holds v, a
      // batch for v must always be derivable.
      SnapshotCommit.resolveDir(spark, table, v).foreach(ensureManifest(v, _))
      LongOffset(v)
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = ver(end)
    val endState = readManifest(endV)
    val startState = start.map(o => readManifest(ver(o)))
    val startNames = startState.map(_.names).getOrElse(Set.empty)
    val removed = startNames -- endState.names
    val dvChanged = startState.exists(_.dvFingerprint != endState.dvFingerprint)
    if (!skipChangeCommits) {
      require(removed.isEmpty,
        s"graft-table stream over $table: version v$endV removed " +
          s"${removed.size} file(s) (UPDATE/MERGE/OPTIMIZE/VACUUM) — " +
          "not an append; restart from a fresh checkpoint or set " +
          "skipChangeCommits=true (Delta's semantics)")
      require(!dvChanged,
        s"graft-table stream over $table: the deletion-vector sidecar " +
          s"changed by v$endV (DELETE/RESTORE) — not an append; restart " +
          "fresh or set skipChangeCommits=true")
    }
    val newNames = (endState.names -- startNames).toSeq.sorted
    if (newNames.isEmpty)
      return org.apache.spark.sql.graftbridge.Bridge
        .emptyStreaming(spark, schema)
    // Resolve basenames against the CURRENT listing — carried names are
    // stable and their bytes immutable, so the mapping is version-free;
    // a name absent from the live version was rewritten/vacuumed after
    // endV, which is a change commit by definition.
    val phys = SnapshotCommit.dataFiles(spark, table).toMap
    val missing = newNames.filterNot(phys.contains)
    require(skipChangeCommits || missing.isEmpty,
      s"graft-table stream over $table: file(s) ${missing.take(3)} of " +
        s"v$endV were rewritten before the stream read them — restart " +
        "fresh or set skipChangeCommits=true")
    val paths = newNames.flatMap(phys.get).map(_.toString)
    if (paths.isEmpty)
      return org.apache.spark.sql.graftbridge.Bridge
        .emptyStreaming(spark, schema)
    org.apache.spark.sql.graftbridge.Bridge.asStreaming(
      spark.read.schema(schema).parquet(paths: _*))
  }

  override def commit(end: Offset): Unit = {
    // GC manifests strictly below the committed offset; the committed
    // one anchors the next diff.
    val endV = ver(end)
    val d = manifestDir
    val f = fs(d)
    if (f.exists(d)) f.listStatus(d).foreach { st =>
      val n = st.getPath.getName
      if (n.forall(_.isDigit) && n.nonEmpty && n.toLong < endV)
        f.delete(st.getPath, false)
    }
  }

  override def stop(): Unit = ()
}

/** `spark.readStream.format("graft-table")` registration. Options:
  * `table` (required — a SnapshotCommit-published table name),
  * `skipChangeCommits` (default false — see [[GraftTableSource]]).
  */
class GraftTableSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("table", sys.error(
      "graft-table source needs .option(\"table\", <snapshot table>)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val table = tableOf(parameters)
    val spark = sqlContext.sparkSession
    SnapshotCommit.register(spark, table).getOrElse(sys.error(
      s"graft-table stream over $table: table has no published version"))
    (shortName(),
      schema.getOrElse(SnapshotCommit.readData(spark, table).schema))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftTableSource(sqlContext, metadataPath, tableOf(parameters),
      parameters.get("skipChangeCommits").exists(_.equalsIgnoreCase("true")))
}
