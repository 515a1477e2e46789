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
  * (or resurrect) rows. Detection walks every version transition the
  * source can OBSERVE: when an offset opens a span across several
  * versions, each intermediate version whose directory still resolves
  * is manifested at offset-creation time and the span is checked
  * TRANSITION BY TRANSITION, not endpoint-to-endpoint (review r16: an
  * endpoint-only diff missed a file appended at v+1 and rewritten at
  * v+2 inside one catch-up span). The one unobservable case — a
  * version BOTH appended and retracted entirely within a span whose
  * intermediate directories were already pruned (stream down past the
  * prune window, which retains two versions) — collapses into the
  * surrounding gap transition; its removals/DV changes still trip the
  * endpoint check, but an appended-then-removed basename inside such a
  * gap is invisible (its rows are physically gone). That narrow
  * divergence from Delta's log-complete detection is documented here
  * and in MIGRATION.md.
  *
  * `.option("skipChangeCommits", "true")` opts into Delta's skip
  * semantics, now Delta-EXACT on observable transitions: a change
  * version's ADDED files are excluded from the stream along with its
  * removals (a rewrite's output never re-streams — r16 streamed it as
  * a pseudo-append). For an unobservable pruned gap that contains a
  * change, the gap's net-added files DO stream as pseudo-appends (the
  * r16 approximation, kept deliberately: skipping them would silently
  * drop any genuine appends folded into the same gap — at-least-once
  * beats data loss; a warning is logged and an idempotent sink
  * collapses the duplicates).
  *
  * CHANGE-FEED MODE (`.option("readChangeFeed", "true")` — Delta's
  * streaming CDC): offsets track CHANGE-axis versions instead of file
  * positions, and each micro-batch is the row-level change feed of a
  * version span, served by the same [[graft.storage.DeletionVectors
  * .changesBetween]] machinery as the batch TVF — schema = table
  * columns + change_type + commit_version, loud-failure contract
  * included (an unanswerable span fails the stream, never
  * under-reports). `.option("startingVersion", n)` replays history
  * from version n INCLUSIVE (Delta's contract);
  * `.option("startingTimestamp", ts)` replays every change committed
  * at or after the instant (resolved on the `_ts:` timeline at first
  * use, loud when the timestamp is past the latest change commit or
  * the timeline is partial); without either the stream serves only
  * changes committed AFTER it first advances (Delta's default).
  * UPDATE/MERGE spans require `delta.enableChangeDataFeed` on the
  * table, like Delta.
  *
  * SCALE. Planning a batch costs one pointer listing + a bounded
  * manifest-chain read + one current-version listing — never a scan of
  * table history. The batch itself is a parquet scan of exactly its
  * files. Manifests are DIFF-ENCODED (the FileStreamSourceLog design):
  * a full base listing every [[GraftTableSource.MaxChain]] observed
  * versions, `+name`/`-name` diffs against the previous observed
  * version in between — so steady-state appends write O(appended
  * files) bytes per version, not O(table file count), and [[commit]]
  * garbage-collects strictly below the committed anchor's chain BASE
  * (never orphaning a diff's parent). Legacy full-listing manifests
  * (r16 checkpoints) still parse.
  */
private[streaming] object GraftTableSource {
  /** Diff-chain length bound: every MaxChain-th observed version writes
    * a full base manifest (periodic compaction, the FileStreamSourceLog
    * rule) so resolving a state reads at most MaxChain files. */
  val MaxChain = 8
}

class GraftTableSource(sqlContext: SQLContext, metadataPath: String,
    table: String, skipChangeCommits: Boolean,
    maxFilesPerTrigger: Option[Int],
    changeFeed: Boolean = false,
    startingVersion: Option[Long] = None,
    startingTimestamp: Option[Long] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  private val spark: SparkSession = sqlContext.sparkSession

  /** Trigger.AvailableNow contract: versions published AFTER the
    * trigger fired are not served by this run — the cap is the version
    * current at prepare time (matching Delta's available-now snapshot
    * semantics; without this Spark falls back to single-batch execution
    * whose restart-with-uncommitted-batch behavior is weaker). In
    * change-feed mode the cap lives on the CHANGE axis instead. */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap =
      if (changeFeed) Some(graft.storage.DeletionVectors
        .version(spark, table))
      else SnapshotCommit.register(spark, table)

  // Schema pinned at stream start (Delta pins it per stream too;
  // widening commits require a stream restart). Change-feed mode
  // serves the table columns plus Delta's CDC tags.
  override val schema: StructType = {
    SnapshotCommit.register(spark, table).getOrElse(sys.error(
      s"graft-table stream over $table: table has no published version"))
    val base = SnapshotCommit.readData(spark, table).schema
    if (!changeFeed) base
    else StructType(base.fields.toSeq :+
      org.apache.spark.sql.types.StructField("change_type",
        org.apache.spark.sql.types.StringType) :+
      org.apache.spark.sql.types.StructField("commit_version",
        org.apache.spark.sql.types.LongType))
  }

  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir = new Path(metadataPath, "graft-versions")

  private def manifestPath(v: Long) = new Path(manifestDir, v.toString)

  /** The version's observed state: its DV fingerprint line plus the
    * data-file basenames. */
  private case class VersionState(dvFingerprint: String, names: Set[String])

  /** One tiny fingerprint of the version's deletion-vector STATE: an
    * order-independent hash over the sidecar's DATA entries (p >= 0 —
    * the rows that actually mask data). Content-based, not file-based
    * (r17): a versioned INSERT re-stamps the sidecar with sentinel
    * rows, which rewrites its part files without touching any data
    * entry — a name:length fingerprint would flag every INSERT INTO as
    * a change commit. DELETE adds entries, RESTORE drops them, VACUUM
    * rebases their coordinates — all change the content hash. One
    * bounded aggregate per OBSERVED version (the sidecar is broadcast-
    * small by contract). */
  private def dvFingerprint(dir: Path): String = {
    val dv = new Path(dir, "_dv")
    val f = fs(dv)
    if (!f.exists(dv)) "-"
    else {
      import org.apache.spark.sql.functions.{col, count, expr, lit}
      val r = spark.read.parquet(dv.toString).filter(col("p") >= 0)
        .agg(count(lit(1)).as("n"),
          expr("bit_xor(xxhash64(concat_ws(':', f, p, v)))").as("h"))
        .head()
      if (r.getLong(0) == 0L) "-" // no data entries = no masking state
      else s"${r.getLong(0)}:${if (r.isNullAt(1)) 0L else r.getLong(1)}"
    }
  }

  /** A manifest file as stored: diff manifests carry the parent they
    * diff against; base (and legacy r16 full-listing) manifests carry
    * the complete name set. */
  private case class RawManifest(dvFingerprint: String,
      parent: Option[Long], entries: Seq[String])

  private def manifestExists(v: Long): Boolean = {
    val p = manifestPath(v)
    fs(p).exists(p)
  }

  /** Observed-version numbers with a manifest on disk, ascending. */
  private def manifestVersions(): Seq[Long] = {
    val d = manifestDir
    val f = fs(d)
    if (!f.exists(d)) Nil
    else f.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong).sorted
  }

  private def readRaw(v: Long): RawManifest = {
    val p = manifestPath(v)
    val in = fs(p).open(p)
    val lines =
      try new String(in.readAllBytes(), "UTF-8").split("\n", -1).toSeq
      finally in.close()
    if (lines.head.startsWith("dv:")) {
      val fp = lines.head.drop(3)
      lines(1) match {
        case "base" => RawManifest(fp, None, lines.drop(2).filter(_.nonEmpty))
        case d if d.startsWith("diff:") =>
          RawManifest(fp, Some(d.drop(5).toLong),
            lines.drop(2).filter(_.nonEmpty))
        case other => sys.error(
          s"graft-table manifest v$v: unknown header '$other'")
      }
    } else // legacy r16 full listing: fingerprint line + names
      RawManifest(lines.head, None, lines.tail.filter(_.nonEmpty))
  }

  /** Diff-chain depth of `v`'s manifest (0 = base/legacy). */
  private def chainDepth(v: Long): Int = readRaw(v).parent match {
    case None => 0
    case Some(p) => 1 + chainDepth(p)
  }

  /** The base version `v`'s manifest chain resolves through — the GC
    * floor that keeps every diff's parent alive. Missing manifests
    * answer `v` itself (conservative: GC nothing extra). */
  private def chainBase(v: Long): Long =
    if (v < 0 || !manifestExists(v)) v
    else readRaw(v).parent match {
      case None => v
      case Some(p) => chainBase(p)
    }

  /** Record version `v`'s manifest if not already recorded — a diff
    * against the newest already-observed version when the chain is
    * shorter than [[GraftTableSource.MaxChain]], else a fresh base.
    * No-clobber: a concurrent recovery attempt writing the same version
    * loses the rename benignly (version listings are immutable, both
    * writers recorded the same content). */
  private def ensureManifest(v: Long, dir: Path): Unit = {
    val p = manifestPath(v)
    val f = fs(p)
    if (f.exists(p)) return
    // Schema pinned at stream start: a widening ALTER observed mid-
    // stream fails loudly (Delta requires a restart too) — silently
    // reading new-schema files under the pinned schema would drop the
    // added columns forever. One cheap ledger probe per NEW version.
    SnapshotCommit.schemaVersions(spark, table).lastOption.foreach {
      case (_, widened) =>
        require(widened.fieldNames.sameElements(schema.fieldNames),
          s"graft-table stream over $table: the table's schema evolved " +
            s"(${widened.fieldNames.mkString(",")} vs the stream's " +
            s"pinned ${schema.fieldNames.mkString(",")}) — restart the " +
            "stream to pick up the new schema (Delta's semantics)")
    }
    f.mkdirs(manifestDir)
    val names = SnapshotCommit.listData(spark, dir).map(_._1).toSet
    val fp = dvFingerprint(dir)
    val parent = manifestVersions().filter(_ < v).maxOption
      .filter(q => chainDepth(q) < GraftTableSource.MaxChain)
    val body = parent match {
      case Some(q) =>
        val prev = readManifest(q)
        val added = (names -- prev.names).toSeq.sorted.map("+" + _)
        val removed = (prev.names -- names).toSeq.sorted.map("-" + _)
        (s"dv:$fp" +: s"diff:$q" +: (added ++ removed)).mkString("\n")
      case None =>
        (s"dv:$fp" +: "base" +: names.toSeq.sorted).mkString("\n")
    }
    val tmp = new Path(manifestDir, s".${v}-${java.util.UUID.randomUUID()}.tmp")
    val out = f.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, p)) f.delete(tmp, false) // lost a benign race
  }

  /** The empty pre-stream state for the chunked initial snapshot. */
  private val EmptyState = VersionState("-", Set.empty)

  /** Resolved states by version — manifests are immutable once written,
    * so entries never go stale; [[commit]] drops GC'd versions. */
  private val stateCache =
    new java.util.concurrent.ConcurrentHashMap[Long, VersionState]()

  private def readManifest(v: Long): VersionState = {
    if (v < 0) return EmptyState
    val cached = stateCache.get(v)
    if (cached != null) return cached
    if (!manifestExists(v)) {
      // Not yet recorded (e.g. a WAL offset written by a crashed
      // instance whose manifest write raced the crash): recoverable
      // ONLY while the version directory still resolves.
      val dir = SnapshotCommit.resolveDir(spark, table, v).getOrElse(
        sys.error(s"graft-table stream over $table: version v$v has " +
          "no manifest and its directory is pruned — the checkpoint " +
          "predates this source's metadata; restart the stream fresh"))
      ensureManifest(v, dir)
    }
    val raw = readRaw(v)
    val state = raw.parent match {
      case None => VersionState(raw.dvFingerprint, raw.entries.toSet)
      case Some(q) =>
        val base = readManifest(q)
        val added = raw.entries.collect { case e if e.startsWith("+") =>
          e.drop(1) }.toSet
        val removed = raw.entries.collect { case e if e.startsWith("-") =>
          e.drop(1) }.toSet
        VersionState(raw.dvFingerprint, base.names ++ added -- removed)
    }
    stateCache.put(v, state)
    state
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

  /** Manifest every resolvable version STRICTLY INSIDE (anchor, target)
    * before an offset spanning them escapes — change detection and
    * skipChangeCommits then see per-version transitions, and a WAL
    * replay of the batch reads the SAME manifest set (manifests >=
    * anchor are never GC'd while the span is open, and nothing writes
    * intermediate manifests after the span closes — deterministic
    * replay). Versions already pruned stay unobservable (see the
    * class scaladoc's documented divergence). */
  private def observeIntermediates(anchor: Long, target: Long): Unit =
    if (anchor >= 0 && target - anchor > 1)
      ((anchor + 1) until target).foreach { v =>
        if (!manifestExists(v))
          SnapshotCommit.resolveDir(spark, table, v)
            .foreach(ensureManifest(v, _))
      }

  /** Next offset from `from` under maxFilesPerTrigger: finish the open
    * span first, then open a span to the current version; None = no
    * progress possible (the stream idles on the unchanged offset). */
  private def advance(from: Option[GraftTableOffset])
      : Option[GraftTableOffset] = {
    val cur = servableCurrent()
    def openSpan(anchor: Long, target: Long): GraftTableOffset = {
      observeIntermediates(anchor, target)
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

  /** Change-feed position: the newest served CHANGE version (the
    * DV-axis number [[graft.storage.DeletionVectors.version]] hands
    * out), capped under Trigger.AvailableNow. */
  private def changeFeedCurrent(): Long = {
    val cur = graft.storage.DeletionVectors.version(spark, table)
    availableNowCap.map(math.min(cur, _)).getOrElse(cur)
  }

  /** The EXCLUSIVE-from change position of a change-feed stream's
    * first batch. `startingVersion` is INCLUSIVE like Delta's
    * (startingVersion=n serves version n's changes, so the exclusive
    * bound is n-1, clamped at 0 — the pre-change state);
    * `startingTimestamp` resolves through [[graft.storage
    * .DeletionVectors.changeStartAtTimestamp]] (serve every change
    * committed at or after the instant; loud past-the-latest-commit
    * and partial-timeline failures). Lazy: resolved only when a FIRST
    * batch actually needs it — a restart resumes from its checkpointed
    * offset and must not re-resolve a timestamp whose history a vacuum
    * has since folded. */
  private lazy val startFrom: Option[Long] =
    startingVersion.map(v => math.max(v - 1L, 0L)).orElse(
      startingTimestamp.map(ms => graft.storage.DeletionVectors
        .changeStartAtTimestamp(spark, table, ms)))

  private def startSpecified: Boolean =
    startingVersion.isDefined || startingTimestamp.isDefined

  // The V1 non-admission entry point (unreached when MicroBatchExecution
  // takes the SupportsAdmissionControl path above it): the full current
  // version, unchunked.
  override def getOffset: Option[Offset] =
    if (changeFeed) {
      val v = changeFeedCurrent()
      if (v == 0L && !startSpecified) None
      else Some(GraftTableOffset(v, v, 0L))
    } else servableCurrent().map(v => GraftTableOffset(v, v, 0L))

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
    if (changeFeed) {
      val cur = changeFeedCurrent()
      val pos = from.map(_.target)
      if (pos.exists(_ >= cur) || (cur == 0L && !startSpecified
          && pos.isEmpty)) start // nothing new: the stream idles
      else GraftTableOffset(cur, cur, 0L)
    } else advance(from) match {
      case Some(next) => next
      case None => start // unchanged: the stream idles
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    // CHANGE-FEED mode: a micro-batch is the table's row-level change
    // feed over a change-version span — served by the SAME machinery
    // as the batch TVF (changesBetween), so its loud-failure contract
    // rides along: a range the feed cannot answer (unrecorded
    // UPDATE/MERGE, vacuum-folded span, rewritten-away inserts) FAILS
    // the stream instead of under-reporting. The first batch starts at
    // `startingVersion` (history replay) or at the position current
    // when the stream first advanced (only future changes — Delta's
    // default); the complex feed plan executes as a batch and re-roots
    // on its RDD (Bridge.rebatchStreaming).
    if (changeFeed) {
      val hi = GraftTableOffset.parse(end).target
      val lo = start.map(o => GraftTableOffset.parse(o).target)
        .orElse(startFrom).getOrElse(hi)
      if (lo >= hi)
        return org.apache.spark.sql.graftbridge.Bridge
          .emptyStreaming(spark, schema)
      return org.apache.spark.sql.graftbridge.Bridge.rebatchStreaming(
        graft.storage.DeletionVectors.changesBetween(spark, table, lo, hi))
    }
    val e = GraftTableOffset.parse(end)
    val s = start.map(o => GraftTableOffset.parse(o))
    // The span's OBSERVED version chain: both endpoints plus every
    // intermediate version with a manifest (written at offset-creation
    // time by observeIntermediates — replay reads the same set). The
    // chain derives from the END offset's OWN span (anchor -> target)
    // when that span is open, so every chunk of a multi-batch span sees
    // the same transitions and the same skip set (a start-relative
    // chain would collapse to one element on the second chunk and leak
    // a change commit's added files into it); a COLLAPSED end offset
    // (anchor == target — the whole diff fit in one batch) has shed its
    // anchor, so the chain starts at the START offset's target instead.
    // Anchor -1 (chunked initial snapshot) has no history to check.
    val from: Long =
      if (e.anchor < e.target) e.anchor
      else s.map(_.target).getOrElse(e.target)
    val chain: Seq[Long] =
      if (from < 0 || from >= e.target) Seq(e.target)
      else (from +: ((from + 1) until e.target)
        .filter(manifestExists) :+ e.target).distinct
    // Change-commit detection transition by transition: a basename
    // removed, or a DV sidecar rewrite, is not an append. Under
    // skipChangeCommits the change transition's ADDED names are
    // excluded from the stream too (Delta skips the whole commit) —
    // except across an unobservable pruned gap, where the net-added
    // files stream as pseudo-appends (see the class scaladoc).
    var skipNames = Set.empty[String]
    var appendAdds = Set.empty[String] // adds at NON-change transitions
    chain.sliding(2).foreach {
      case Seq(a, b) =>
        val sa = readManifest(a)
        val sb = readManifest(b)
        val removed = sa.names -- sb.names
        val dvChanged = sa.dvFingerprint != sb.dvFingerprint
        if (!skipChangeCommits) {
          require(removed.isEmpty,
            s"graft-table stream over $table: v$a -> v$b removed " +
              s"${removed.size} file(s) (UPDATE/MERGE/OPTIMIZE/VACUUM) " +
              "— not an append; restart from a fresh checkpoint or set " +
              "skipChangeCommits=true (Delta's semantics)")
          require(!dvChanged,
            s"graft-table stream over $table: the deletion-vector " +
              s"sidecar changed between v$a and v$b (DELETE/RESTORE) — " +
              "not an append; restart fresh or set skipChangeCommits=true")
        } else if (removed.nonEmpty || dvChanged) {
          if (b - a == 1) skipNames ++= (sb.names -- sa.names)
          else System.err.println(
            s"[graft-table] $table: change commit inside pruned gap " +
              s"v$a..v$b under skipChangeCommits — its net-added files " +
              "stream as pseudo-appends (at-least-once; see scaladoc)")
        } else appendAdds ++= (sb.names -- sa.names)
      case _ => ()
    }
    // A file appended by one version and removed again by a LATER
    // skipped change commit in the same span never reaches the
    // endpoint state the consumed-diff sees — but it is a genuine
    // append Delta would stream (from the retained pre-change file).
    // Serve those with the span's FINAL chunk (they are outside the
    // chunk index, which counts endpoint-diff names only); the
    // historical resolution below finds their bytes while the
    // appending version's directory survives.
    val spanClosed = e.anchor == e.target ||
      e.idx >= spanDiff(e.anchor, e.target).size
    val lostAppends: Set[String] =
      if (!skipChangeCommits || !spanClosed) Set.empty
      else appendAdds -- readManifest(e.target).names -- skipNames
    val newNames = ((consumed(e) -- s.map(consumed).getOrElse(Set.empty))
      ++ lostAppends).toSeq.sorted.filterNot(skipNames)
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
    // Under skipChangeCommits a genuine append's file can be REWRITTEN
    // AWAY by a later, skipped change commit in the same span — Delta
    // still streams it from the retained pre-change file, and so does
    // this source while the appending version's directory survives
    // (pruned directories drop the rows, the documented retention
    // trade; Delta after vacuum behaves the same way).
    lazy val historical: Map[String, Path] =
      chain.flatMap(v => SnapshotCommit.resolveDir(spark, table, v))
        .distinct
        .flatMap(d => SnapshotCommit.listData(spark, d)).toMap
    val paths = newNames.flatMap(n =>
      phys.get(n).orElse(if (missing.isEmpty) None else historical.get(n)))
      .map(_.toString)
    if (paths.isEmpty)
      return org.apache.spark.sql.graftbridge.Bridge
        .emptyStreaming(spark, schema)
    val scan = org.apache.spark.sql.graftbridge.Bridge.asStreaming(
      spark.read.schema(schema).parquet(paths: _*))
    // The INITIAL snapshot is the table's live STATE, not raw files:
    // a pre-existing DV delete must not stream its dead rows (Delta's
    // readStream serves the masked snapshot — review r16). EVERY chunk
    // of the snapshot masks, not just the first (anchor -1 marks the
    // chunked-snapshot span — review r16's chunked-batch hole: later
    // chunks took the unmasked branch and resurrected deleted rows).
    // The mask wraps the ALREADY-streaming scan so its sidecar side
    // stays a static relation (a stream-STATIC anti-join, the
    // supported shape). Later batches are pure appends whose files
    // carry no DV entries (the change-commit guard enforces it; under
    // skipChangeCommits the skipped-commit semantics cover it).
    if (start.isEmpty || s.exists(_.anchor == -1L))
      graft.storage.DeletionVectors.mask(spark, table, scan)
    else scan
  }

  override def commit(end: Offset): Unit = {
    if (changeFeed) return // no manifests on the change axis
    // GC manifests strictly below the committed offset's anchor-chain
    // BASE — the anchor (and target) still seed the next diff, and a
    // diff manifest's parents must survive with it (manifests at or
    // above the anchor only ever chain through the anchor, because
    // parents are the newest manifest existing at write time and the
    // anchor's manifest exists from the moment its offset escaped).
    val anchor = GraftTableOffset.parse(end).anchor
    val keepFrom = chainBase(anchor)
    val d = manifestDir
    val f = fs(d)
    if (f.exists(d)) f.listStatus(d).foreach { st =>
      val n = st.getPath.getName
      if (n.forall(_.isDigit) && n.nonEmpty && n.toLong < keepFrom) {
        f.delete(st.getPath, false)
        stateCache.remove(n.toLong)
      }
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

  private def changeFeedOf(parameters: Map[String, String]): Boolean =
    Seq("readChangeFeed", "readChangeData").exists(k =>
      parameters.get(k).exists(_.equalsIgnoreCase("true")))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val table = tableOf(parameters)
    val spark = sqlContext.sparkSession
    SnapshotCommit.register(spark, table).getOrElse(sys.error(
      s"graft-table stream over $table: table has no published version"))
    val base = SnapshotCommit.readData(spark, table).schema
    val inferred =
      if (!changeFeedOf(parameters)) base
      else StructType(base.fields.toSeq :+
        org.apache.spark.sql.types.StructField("change_type",
          org.apache.spark.sql.types.StringType) :+
        org.apache.spark.sql.types.StructField("commit_version",
          org.apache.spark.sql.types.LongType))
    (shortName(), schema.getOrElse(inferred))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val cdc = changeFeedOf(parameters)
    if (cdc) require(
      !parameters.contains("maxFilesPerTrigger") &&
        !parameters.contains("skipChangeCommits"),
      "graft-table readChangeFeed streams change versions, not files — " +
        "maxFilesPerTrigger/skipChangeCommits do not apply")
    if (!cdc) require(
      !parameters.contains("startingVersion") &&
        !parameters.contains("startingTimestamp"),
      "graft-table startingVersion/startingTimestamp apply to the " +
        "change axis — set .option(\"readChangeFeed\", \"true\")")
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "graft-table: give startingVersion OR startingTimestamp, not both")
    new GraftTableSource(sqlContext, metadataPath, tableOf(parameters),
      parameters.get("skipChangeCommits").exists(_.equalsIgnoreCase("true")),
      parameters.get("maxFilesPerTrigger").map { v =>
        val n = v.toInt
        require(n > 0, s"maxFilesPerTrigger must be positive, got $n")
        n
      },
      changeFeed = cdc,
      startingVersion = parameters.get("startingVersion").map { v =>
        val n = v.toLong
        require(n >= 0, s"startingVersion must be >= 0, got $n")
        n
      },
      startingTimestamp = parameters.get("startingTimestamp").map(ts =>
        graft.ext.GraftSqlParser.parseTsMs(
          sqlContext.sparkSession, ts)))
  }

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
