package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.storage.SnapshotCommit

/** A graft-table stream position. `consumed = names(anchor) ∪ the first
  * `idx` basenames (sorted) appended between anchor and target` — the
  * shape that lets `maxFilesPerTrigger` CHUNK a large version diff (a
  * restart after a long outage, or the initial snapshot) into bounded
  * micro-batches while offsets stay replayable from the durable
  * per-version manifests. The fully-consumed form is `(v, v, 0)`
  * (consumed = names(v)), serialized as the bare version number so
  * checkpoints written by the version-only format replay unchanged;
  * `anchor = -1` denotes the empty pre-stream state (chunked initial
  * snapshot). */
private[streaming] final case class GraftTableOffset(anchor: Long,
    target: Long, idx: Long) extends Offset {
  override def json: String =
    if (anchor == target && idx == 0L) target.toString
    else s"""{"anchor":$anchor,"target":$target,"idx":$idx}"""
}

private[streaming] object GraftTableOffset {
  private val JsonRe =
    """\{"anchor":(-?\d+),"target":(\d+),"idx":(\d+)\}""".r
  def parse(o: org.apache.spark.sql.connector.read.streaming.Offset)
      : GraftTableOffset = {
    val j = (o match {
      case l: LongOffset => l.json
      case s: SerializedOffset => s.json
      case g: GraftTableOffset => return g
      case other => other.json
    }).trim
    j match {
      case JsonRe(a, t, i) => GraftTableOffset(a.toLong, t.toLong, i.toLong)
      case v if v.nonEmpty && v.forall(_.isDigit) =>
        GraftTableOffset(v.toLong, v.toLong, 0L)
      case other => sys.error(s"unparseable graft-table offset: '$other'")
    }
  }
}

/** STREAMING SOURCE OVER THE SNAPSHOT VERSION CHAIN — the engine's
  * `spark.readStream.table(...)` parity, and the reference's core
  * dependency mechanism: every silver table is a STREAMING read of a
  * committed upstream table
  * (`/root/reference/scripts/silver/Silver_orders.py:12`
  * `dlt.readStream("bronze.bronze_orders")`,
  * `scripts/silver/silver_customers.py:13`
  * `dlt.read_stream("live.silver_orders")`), which Delta serves by
  * tailing its transaction log. Here the log is the `_commits` pointer
  * chain: offsets track (version, files-within-diff) positions, and a
  * micro-batch is a bounded slice of the files APPENDED between two
  * versions.
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
  * moment it first OBSERVES the version: batches then never need the
  * historical version DIRECTORIES — prune retains only (current,
  * previous), and a restart may replay offsets whose directories are
  * long gone, but the manifests are durable with the checkpoint, and
  * the NAMES they record still resolve against the CURRENT version
  * (same physical bytes, carried forward). This is the
  * FileStreamSource-log pattern with version numbers for batch ids.
  *
  * ADMISSION CONTROL. `.option("maxFilesPerTrigger", n)` bounds every
  * micro-batch to n files (Delta's option): a backlog of many versions
  * — or the initial snapshot of a million-file table — streams as
  * bounded batches instead of one giant catch-up scan, with the
  * position INSIDE a version diff carried by the offset itself
  * ([[GraftTableOffset]]), so a restart resumes mid-diff exactly-once.
  *
  * EXACTLY-ONCE. The WAL replays `getBatch(lastCommitted, walEnd)` on
  * restart; both endpoints' manifests exist (written before the offset
  * was ever returned), so the replayed batch is byte-identical.
  * [[commit]] garbage-collects manifests strictly below the committed
  * offset's anchor (the anchor is the next batch's start).
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
  * SCALE. Planning a batch costs one pointer listing + two manifest
  * reads + one current-version listing — never a scan of table
  * history. The batch itself is a parquet scan of exactly its files.
  * Honest accounting: each manifest records the version's FULL
  * basename listing (O(table file count) names — at a million files
  * ~60 MB, the size class of a Delta checkpoint or a compacted
  * FileStreamSource log), written once per OBSERVED version and
  * GC'd below the committed anchor, so at most a handful exist at a
  * time; a diff-chain encoding with periodic compaction (the
  * FileStreamSourceLog design) would shrink the per-version write to
  * O(appended files) and is the natural next step if per-batch
  * versions at very high file counts ever dominate.
  */
class GraftTableSource(sqlContext: SQLContext, metadataPath: String,
    table: String, skipChangeCommits: Boolean,
    maxFilesPerTrigger: Option[Int]) extends Source
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

  /** The empty pre-stream state for the chunked initial snapshot. */
  private val EmptyState = VersionState("-", Set.empty)

  private def readManifest(v: Long): VersionState = {
    if (v < 0) return EmptyState
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

  /** The sorted basenames appended between anchor and target. */
  private def spanDiff(anchor: Long, target: Long): Seq[String] =
    if (anchor == target) Nil
    else (readManifest(target).names -- readManifest(anchor).names)
      .toSeq.sorted

  /** Every basename the offset has consumed. */
  private def consumed(o: GraftTableOffset): Set[String] =
    if (o.anchor == o.target) readManifest(o.target).names
    else readManifest(o.anchor).names ++
      spanDiff(o.anchor, o.target).take(
        math.min(o.idx, Int.MaxValue.toLong).toInt)

  /** The current version this run may serve (AvailableNow cap applied),
    * its manifest recorded BEFORE the value escapes — once an offset
    * derived from it reaches the WAL, its batch must stay derivable. */
  private def servableCurrent(): Option[Long] = {
    val current = SnapshotCommit.register(spark, table)
    val capped = availableNowCap match {
      case Some(cap) => current.map(math.min(_, cap))
      case None => current
    }
    capped.foreach { v =>
      SnapshotCommit.resolveDir(spark, table, v).foreach(ensureManifest(v, _))
    }
    capped
  }

  /** Next offset from `from` under maxFilesPerTrigger: finish the open
    * span first, then open a span to the current version; None = no
    * progress possible (the stream idles on the unchanged offset). */
  private def advance(from: Option[GraftTableOffset])
      : Option[GraftTableOffset] = {
    val cur = servableCurrent()
    def openSpan(anchor: Long, target: Long): GraftTableOffset = {
      val d = spanDiff(anchor, target)
      maxFilesPerTrigger match {
        case Some(m) if m < d.size => GraftTableOffset(anchor, target, m)
        case _ => GraftTableOffset(target, target, 0L)
      }
    }
    from match {
      case None => cur.map(c => openSpan(-1L, c))
      case Some(o) =>
        val span = spanDiff(o.anchor, o.target)
        if (o.idx < span.size) {
          // Unfinished span: continue inside it regardless of newer
          // versions — bounded batches drain in order.
          val next = maxFilesPerTrigger
            .map(m => math.min(span.size.toLong, o.idx + m))
            .getOrElse(span.size.toLong)
          Some(GraftTableOffset(o.anchor, o.target, next))
        } else cur match {
          case Some(c) if c > o.target => Some(openSpan(o.target, c))
          case _ => None // nothing new
        }
    }
  }

  // The V1 non-admission entry point (unreached when MicroBatchExecution
  // takes the SupportsAdmissionControl path above it): the full current
  // version, unchunked.
  override def getOffset: Option[Offset] =
    servableCurrent().map(v => GraftTableOffset(v, v, 0L))

  /** Admission-control entry point (the AvailableNow mixin extends
    * SupportsAdmissionControl; MicroBatchExecution prefers this when
    * present). Spark's ReadLimit is ignored in favor of the source's
    * own `maxFilesPerTrigger` option — the unit of admission here is a
    * FILE within a version diff, which Spark's version-agnostic limits
    * cannot express. */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val from = Option(start).map(GraftTableOffset.parse)
    advance(from) match {
      case Some(next) => next
      case None => start // unchanged: the stream idles
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val e = GraftTableOffset.parse(end)
    val s = start.map(o => GraftTableOffset.parse(o))
    val endT = readManifest(e.target)
    val startT = s.map(o => readManifest(o.target))
    // Change-commit detection at the VERSION level (targets): a
    // basename removed, or a DV sidecar rewrite, is not an append.
    val removed = startT.map(_.names -- endT.names).getOrElse(Set.empty)
    val dvChanged = startT.exists(_.dvFingerprint != endT.dvFingerprint)
    if (!skipChangeCommits) {
      require(removed.isEmpty,
        s"graft-table stream over $table: version v${e.target} removed " +
          s"${removed.size} file(s) (UPDATE/MERGE/OPTIMIZE/VACUUM) — " +
          "not an append; restart from a fresh checkpoint or set " +
          "skipChangeCommits=true (Delta's semantics)")
      require(!dvChanged,
        s"graft-table stream over $table: the deletion-vector sidecar " +
          s"changed by v${e.target} (DELETE/RESTORE) — not an append; " +
          "restart fresh or set skipChangeCommits=true")
    }
    val newNames = (consumed(e) -- s.map(consumed).getOrElse(Set.empty))
      .toSeq.sorted
    if (newNames.isEmpty)
      return org.apache.spark.sql.graftbridge.Bridge
        .emptyStreaming(spark, schema)
    // Resolve basenames against the CURRENT listing — carried names are
    // stable and their bytes immutable, so the mapping is version-free;
    // a name absent from the live version was rewritten/vacuumed after
    // the offset, which is a change commit by definition.
    val phys = SnapshotCommit.dataFiles(spark, table).toMap
    val missing = newNames.filterNot(phys.contains)
    require(skipChangeCommits || missing.isEmpty,
      s"graft-table stream over $table: file(s) ${missing.take(3)} of " +
        s"v${e.target} were rewritten before the stream read them — " +
        "restart fresh or set skipChangeCommits=true")
    val paths = newNames.flatMap(phys.get).map(_.toString)
    if (paths.isEmpty)
      return org.apache.spark.sql.graftbridge.Bridge
        .emptyStreaming(spark, schema)
    val scan = org.apache.spark.sql.graftbridge.Bridge.asStreaming(
      spark.read.schema(schema).parquet(paths: _*))
    // The INITIAL snapshot is the table's live STATE, not raw files:
    // a pre-existing DV delete must not stream its dead rows (Delta's
    // readStream serves the masked snapshot — review r16). The mask
    // wraps the ALREADY-streaming scan so its sidecar side stays a
    // static relation (a stream-STATIC anti-join, the supported
    // shape). Later batches are pure appends whose files carry no DV
    // entries (the change-commit guard enforces it; under
    // skipChangeCommits the raw-append approximation is the
    // documented trade).
    if (start.isEmpty)
      graft.storage.DeletionVectors.mask(spark, table, scan)
    else scan
  }

  override def commit(end: Offset): Unit = {
    // GC manifests strictly below the committed offset's ANCHOR — the
    // anchor (and target) still seed the next diff.
    val keepFrom = GraftTableOffset.parse(end).anchor
    val d = manifestDir
    val f = fs(d)
    if (f.exists(d)) f.listStatus(d).foreach { st =>
      val n = st.getPath.getName
      if (n.forall(_.isDigit) && n.nonEmpty && n.toLong < keepFrom)
        f.delete(st.getPath, false)
    }
  }

  override def stop(): Unit = ()
}

/** TRANSACTIONAL streaming sink face of [[SnapshotSink]]:
  * `df.writeStream.format("graft-table").option("table", t)` — each
  * micro-batch commits as one atomic snapshot version with its batch id
  * inside the version directory (exactly-once under replay; see the
  * SnapshotSink scaladoc), making the write side of `readStream
  * .table`/`writeStream.toTable` parity a one-liner. Append-only, flat
  * layout (snapshot tables reject partition columns by design). The
  * incoming frame is re-rooted on its already-computed RDD before the
  * commit re-executes it (the ForeachBatchSink discipline — a stateful
  * micro-batch plan must not run twice). */
class GraftTableSink(table: String) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = org.apache.spark.sql.graftbridge.Bridge.rebatch(data)
    SnapshotSink.append(data.sparkSession, table, batchId, batch)
    ()
  }
  override def toString: String = s"GraftTableSink[$table]"
}

/** `spark.readStream`/`writeStream` `.format("graft-table")`
  * registration. Source options: `table` (required — a
  * SnapshotCommit-published table name), `skipChangeCommits` (default
  * false), `maxFilesPerTrigger` (optional batch bound). Sink options:
  * `table` (created on first batch if absent).
  */
class GraftTableSourceProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("table", sys.error(
      "graft-table needs .option(\"table\", <snapshot table>)"))

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
      parameters.get("skipChangeCommits").exists(_.equalsIgnoreCase("true")),
      parameters.get("maxFilesPerTrigger").map { v =>
        val n = v.toInt
        require(n > 0, s"maxFilesPerTrigger must be positive, got $n")
        n
      })

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft-table sink writes the snapshot layout, which is flat — " +
        "partitionBy is not supported (cluster with Optimize.zorder)")
    require(outputMode == OutputMode.Append(),
      s"graft-table sink is append-only (exactly-once version commits); " +
        s"got $outputMode")
    new GraftTableSink(tableOf(parameters))
  }
}
