package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{StringType, StructType}

/** The MAINTENANCE SQL surface — the statements a user of the reference
  * actually types on Databricks (`OPTIMIZE ... ZORDER BY`, `RESTORE
  * TABLE ... TO VERSION AS OF`, `VACUUM`, `CREATE TABLE ... SHALLOW
  * CLONE`) parsed into this engine's own maintenance commands, so the
  * reference's operational vocabulary runs here AS SQL, not only as
  * Scala calls:
  *
  *   OPTIMIZE t                          -> Optimize.compact
  *   OPTIMIZE t ZORDER BY (a, b)         -> Optimize.zorder
  *   RESTORE TABLE t TO VERSION AS OF v  -> DeletionVectors.restore
  *   VACUUM t RETAIN v VERSIONS          -> DeletionVectors.vacuum
  *   CREATE TABLE d SHALLOW CLONE s      -> SnapshotCommit.clone
  *   DESCRIBE HISTORY t                  -> per-version audit rows
  *   MERGE INTO t USING s ON t.k = s.k   -> snapshot-rewrite merge
  *     WHEN MATCHED THEN UPDATE SET *       (upsert; + NOT MATCHED BY
  *     WHEN NOT MATCHED THEN INSERT *        SOURCE THEN DELETE = full
  *     [WHEN NOT MATCHED BY SOURCE            sync; WHEN MATCHED THEN
  *      THEN DELETE]                          DELETE = keyed delete)
  *
  * Wiring, two ways (the GraftExtensions pattern): sessions built with
  * `spark.sql.extensions=graft.ext.GraftExtensions` get this parser
  * injected (`injectParser`) and the statements work through plain
  * `spark.sql(...)`; live sessions (whose parser is fixed at build)
  * call [[GraftSqlParser.sql]], which parses with the IDENTICAL
  * grammar and executes the same command — one grammar, no drift.
  *
  * Everything that is not a maintenance statement delegates verbatim
  * to Spark's own parser, so the extension is purely additive.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.maintenance(sqlText)
      .getOrElse(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}

/** A parsed maintenance statement: runs on the driver, returns
  * (item, value) metric rows — the Delta command shape. */
final case class GraftMaintenanceCommand(label: String,
    exec: SparkSession => Seq[(String, String)])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("item", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    exec(spark).map { case (k, v) => Row(k, v) }
  override def simpleString(maxFields: Int): String = s"GraftMaintenance $label"
}

/** `DESCRIBE HISTORY t` — the Delta audit statement: one row per still-
  * resolvable snapshot version (vacuum/prune may have reaped older
  * ones) with its resolved file count, total live bytes and
  * current-flag. Metadata-only: version resolution + file listing +
  * `getFileStatus` per data file — no data read, so the statement costs
  * the same on a 100 TB table as on a test fixture.
  */
final case class GraftHistoryCommand(table: String)
  extends LeafRunnableCommand {
  import org.apache.spark.sql.types.{BooleanType, LongType}
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)(),
    AttributeReference("is_current", BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val sc = graft.storage.SnapshotCommit
    val cur = sc.register(spark, table).getOrElse(sys.error(
      s"DESCRIBE HISTORY $table: table has no published version"))
    (1L to cur).flatMap { v =>
      sc.resolveDir(spark, table, v).map { d =>
        val files = sc.listData(spark, d)
        val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val bytes = files.map(f => fs.getFileStatus(f._2).getLen).sum
        Row(v, files.size.toLong, bytes, v == cur)
      }
    }
  }
  override def simpleString(maxFields: Int): String =
    s"GraftHistory $table"
}

object GraftSqlParser {

  // Table names: the engine's snapshot tables are single-part
  // identifiers (optionally backquoted).
  private val Ident = "`?([A-Za-z_][A-Za-z0-9_]*)`?"
  private val OptimizeRe =
    s"(?is)\\s*OPTIMIZE\\s+$Ident\\s*".r
  private val ZorderRe =
    s"(?is)\\s*OPTIMIZE\\s+$Ident\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\)\\s*".r
  private val RestoreRe =
    s"(?is)\\s*RESTORE\\s+TABLE\\s+$Ident\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*".r
  private val VacuumRe =
    s"(?is)\\s*VACUUM\\s+$Ident\\s+RETAIN\\s+(\\d+)\\s+VERSIONS\\s*".r
  private val CloneRe =
    s"(?is)\\s*CREATE\\s+TABLE\\s+$Ident\\s+SHALLOW\\s+CLONE\\s+$Ident\\s*".r
  // MERGE — the three canonical Delta forms on a single same-named key:
  //   upsert   (MATCHED UPDATE SET * / NOT MATCHED INSERT *)
  //   full sync (upsert + NOT MATCHED BY SOURCE DELETE)
  //   keyed delete (MATCHED DELETE)
  // Optional aliases on both relations; the ON clause must be one
  // equality between the two relations' qualifiers.
  private val MergeHead =
    s"(?is)\\s*MERGE\\s+INTO\\s+$Ident(?:\\s+(?:AS\\s+)?$Ident)?" +
      s"\\s+USING\\s+$Ident(?:\\s+(?:AS\\s+)?$Ident)?" +
      s"\\s+ON\\s+$Ident\\s*\\.\\s*$Ident\\s*=\\s*$Ident\\s*\\.\\s*$Ident"
  private val MergeUpsertRe =
    (MergeHead +
      "\\s+WHEN\\s+MATCHED\\s+THEN\\s+UPDATE\\s+SET\\s+\\*" +
      "\\s+WHEN\\s+NOT\\s+MATCHED\\s+THEN\\s+INSERT\\s+\\*" +
      "(\\s+WHEN\\s+NOT\\s+MATCHED\\s+BY\\s+SOURCE\\s+THEN\\s+DELETE)?\\s*").r
  private val MergeDeleteRe =
    (MergeHead + "\\s+WHEN\\s+MATCHED\\s+THEN\\s+DELETE\\s*").r
  private val HistoryRe =
    s"(?is)\\s*DESCRIBE\\s+HISTORY\\s+$Ident\\s*".r

  /** Resolve the ON clause's single equality to the SHARED key column:
    * each side's qualifier must be the target or the source (name or
    * alias), one of each, and the two column names must agree — the
    * rename-on-merge case is out of this subset's scope and fails
    * loudly rather than guessing.
    */
  private def mergeKey(tgt: String, tgtAlias: String, src: String,
      srcAlias: String, q1: String, c1: String, q2: String,
      c2: String): String = {
    // Identifiers compare case-insensitively, like Spark's resolver —
    // the grammar itself matches (?is), so 'ON T.K = S.K' must resolve,
    // not fail a case-sensitive require.
    def eq(a: String, b: String) = a != null && a.equalsIgnoreCase(b)
    def isTgt(q: String) = eq(q, tgt) || eq(q, tgtAlias)
    def isSrc(q: String) = eq(q, src) || eq(q, srcAlias)
    require((isTgt(q1) && isSrc(q2)) || (isSrc(q1) && isTgt(q2)),
      s"MERGE ON clause must join $tgt to $src (got $q1.$c1 = $q2.$c2)")
    require(c1.equalsIgnoreCase(c2),
      s"MERGE subset requires the same key column name on both sides " +
        s"(got $c1 vs $c2)")
    c1
  }

  /** The maintenance grammar; None -> not ours, delegate. */
  def maintenance(sqlText: String): Option[LogicalPlan] = sqlText match {
    case ZorderRe(tbl, cols) =>
      val cs = cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
        .filter(_.nonEmpty).toSeq
      Some(GraftMaintenanceCommand(s"OPTIMIZE $tbl ZORDER", { spark =>
        graft.storage.Optimize.zorder(spark, tbl, cs)
        Seq("table" -> tbl, "zordered_by" -> cs.mkString(","))
      }))
    case OptimizeRe(tbl) =>
      Some(GraftMaintenanceCommand(s"OPTIMIZE $tbl", { spark =>
        val (before, after) = graft.storage.Optimize.compact(spark, tbl)
        Seq("table" -> tbl, "files_before" -> before.toString,
          "files_after" -> after.toString)
      }))
    case RestoreRe(tbl, v) =>
      Some(GraftMaintenanceCommand(s"RESTORE $tbl", { spark =>
        // RESTORE here rolls back DELETE-version history (the engine's
        // time-travel axis — appends commit whole snapshot versions and
        // are not rolled back by this statement). A table with no
        // delete history must FAIL loudly, not report a success that
        // changed nothing.
        val hwm = graft.storage.DeletionVectors.version(spark, tbl)
        require(hwm > 0,
          s"RESTORE $tbl: table has no delete-version history to roll " +
            "back (this statement restores DELETE history; appends are " +
            "separate snapshot versions)")
        graft.storage.DeletionVectors.restore(spark, tbl, v.toLong)
        Seq("table" -> tbl, "restored_to_version" -> v)
      }))
    case VacuumRe(tbl, v) =>
      Some(GraftMaintenanceCommand(s"VACUUM $tbl", { spark =>
        // RETAIN n VERSIONS = keep the n NEWEST delete versions
        // separable, fold everything older: cutoff = high-water mark
        // minus n (passing n directly would invert the semantics — a
        // scheduled RETAIN 5 would stop reclaiming forever once the
        // HWM passed 5).
        val hwm = graft.storage.DeletionVectors.version(spark, tbl)
        val cutoff = hwm - v.toLong
        if (cutoff > 0)
          graft.storage.DeletionVectors.vacuum(spark, tbl, cutoff)
        Seq("table" -> tbl, "retained_versions" -> v,
          "vacuumed_through_version" -> math.max(cutoff, 0L).toString)
      }))
    case CloneRe(dst, src) =>
      Some(GraftMaintenanceCommand(s"CLONE $src -> $dst", { spark =>
        val loc = graft.storage.SnapshotCommit.clone(spark, src, dst)
        Seq("table" -> dst, "cloned_from" -> src,
          "location" -> loc.toString)
      }))
    case MergeUpsertRe(tgt, tA, src, sA, q1, c1, q2, c2, bySource) =>
      val key = mergeKey(tgt, tA, src, sA, q1, c1, q2, c2)
      val sync = bySource != null
      Some(GraftMaintenanceCommand(
        s"MERGE $src -> $tgt${if (sync) " (full sync)" else ""}", { spark =>
          val v = runMerge(spark, tgt, src, key, sync, delete = false)
          Seq("table" -> tgt, "merged_from" -> src, "key" -> key,
            "mode" -> (if (sync) "sync" else "upsert"),
            "version" -> v.toString)
        }))
    case MergeDeleteRe(tgt, tA, src, sA, q1, c1, q2, c2) =>
      val key = mergeKey(tgt, tA, src, sA, q1, c1, q2, c2)
      Some(GraftMaintenanceCommand(s"MERGE DELETE $src -> $tgt", { spark =>
        val v = runMerge(spark, tgt, src, key, sync = false, delete = true)
        Seq("table" -> tgt, "merged_from" -> src, "key" -> key,
          "mode" -> "delete", "version" -> v.toString)
      }))
    case HistoryRe(tbl) => Some(GraftHistoryCommand(tbl))
    case _ => None
  }

  /** Execute one parsed MERGE as a snapshot commit (the Delta execution
    * model: merge produces a new version; readers of older versions are
    * untouched — u-family entries prove the same algebra at plan level,
    * this is the table-mutating twin).
    *
    * TOUCHED-FILE WRITE IO (the Delta MERGE shape, same machinery as
    * the Pipeline incremental arm, `pipeline/Pipeline.scala`): the
    * upsert and delete arms first PROBE which data files hold a matched
    * key (a column-pruned scan of the key column plus file provenance,
    * semi-joined against the source's keys), REWRITE only those files'
    * live rows merged with the source, and CARRY every untouched file
    * by name (hard link / manifest ref — a directory entry, no data
    * IO). Write IO is therefore proportional to touched files + source,
    * not table size — a nightly 0.1%-key upsert against a 100 TB table
    * rewrites ~0.1% of it, not 100 TB. Only the `sync` form (NOT
    * MATCHED BY SOURCE DELETE) remains a full rewrite, by definition:
    * the source IS the desired state.
    *
    *  - Matched-file detection runs on the LIVE view
    *    ([[graft.storage.DeletionVectors.readWithProvenance]]): a key
    *    whose every row in a file is already DV-deleted does not drag
    *    that file into the rewrite, and the rewrite of a touched file
    *    merges its LIVE rows — deleted rows are never resurrected.
    *  - Untouched files keep their BASENAMES (DV coordinates key on
    *    them) and the `_dv` sidecar carries with the version, its
    *    entries for rewritten files dropped
    *    ([[graft.storage.DeletionVectors.carrySidecarDropping]]); the
    *    `_stats` skipping sidecar and the streaming `_batchid` progress
    *    marker carry too, so skipping and exactly-once sink replay
    *    survive a MERGE exactly as they survive compaction. Carried
    *    basenames cannot collide with the rewrite's fresh part files:
    *    Spark embeds a per-job UUID in every part-file name.
    *  - Delta's cardinality rule is enforced: a source with duplicate
    *    keys would make UPDATE SET * nondeterministic, so it fails
    *    loudly BEFORE any write. The pure-DELETE form skips the check,
    *    as Delta does — anti-join semantics are unaffected by source
    *    duplicates.
    *  - upsert rewrite: touched-live-minus-matched ∪ source (source
    *    columns aligned to the target schema by NAME — a source missing
    *    a target column fails the select, loudly). delete rewrite:
    *    touched live rows anti-join source keys.
    *
    * Scale: one column-pruned probe + one key-partitioned anti-join
    * over the TOUCHED subset + the bounded rewrite; the commit itself
    * is the engine's atomic pointer publish, and every phase derives
    * inside the staging closure so a lost optimistic claim rebases onto
    * the winner's rows (ExtensionsSpec races two merges to pin this).
    */
  private def runMerge(spark: SparkSession, tgt: String, src: String,
      key: String, sync: Boolean, delete: Boolean): Long = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val sc = graft.storage.SnapshotCommit
    val dv = graft.storage.DeletionVectors
    sc.register(spark, tgt)
    val srcDf = spark.table(src)
    require(srcDf.columns.contains(key),
      s"MERGE source $src has no column $key")
    if (!delete) {
      val dup = srcDf.groupBy(col(key)).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).limit(1).count()
      require(dup == 0,
        s"MERGE source $src has duplicate keys on $key — UPDATE SET * " +
          "would be nondeterministic (Delta's multiple-matches error)")
    }
    sc.commit(spark, tgt) { dir =>
      // EVERYTHING derives INSIDE the staging closure, target read
      // first: on a lost claim the commit protocol re-points the
      // catalog at the winner's version and RE-INVOKES this closure,
      // so the re-derivation rebases the merge onto the winner's rows.
      // Reading the current version while staging is safe: version
      // files are immutable and the stage directory is fresh.
      val stage = new org.apache.hadoop.fs.Path(dir)
      if (sync) {
        val aligned = srcDf.select(
          dv.read(spark, tgt).columns.toSeq.map(col): _*)
        aligned.write.parquet(dir)
        // Full rewrite: no files carried, so no sidecar entries can
        // survive (the source is the whole state) — but stats columns
        // recompute for the fresh files and stream progress carries.
        sc.currentLocation(spark, tgt).foreach { cur =>
          graft.storage.StatsSkipping.refreshStats(spark, cur, stage)
          sc.carryBatchId(spark, cur, stage)
        }
      } else {
        val cur = sc.currentLocation(spark, tgt).getOrElse(
          sys.error(s"MERGE target $tgt has no published version"))
        val allFiles = sc.listData(spark, cur) // (basename, physical)
        val srcKeys = srcDf.select(col(key)).distinct()
        // Phase 1 — probe: which files hold a LIVE matched key.
        val touched: Set[String] = dv
          .readWithProvenance(spark, tgt, "_graft_file")
          .select(col(key), col("_graft_file"))
          .join(srcKeys, Seq(key), "left_semi")
          .select("_graft_file").distinct()
          .collect().map(_.getString(0)).toSet
        // Phase 2 — rewrite ONLY the touched files' live rows.
        val rawSchema = sc.readData(spark, tgt).schema
        val touchedPhys = allFiles.collect {
          case (n, p) if touched(n) => p.toString }
        val touchedLive =
          if (touchedPhys.isEmpty) sc.readData(spark, tgt).limit(0)
          else dv.mask(spark, tgt, spark.read.schema(rawSchema)
            .parquet(touchedPhys: _*))
        val merged =
          if (delete)
            touchedLive.join(srcKeys, Seq(key), "left_anti")
          else {
            val aligned = srcDf.select(rawSchema.fieldNames.toSeq.map(col): _*)
            touchedLive.join(srcKeys, Seq(key), "left_anti")
              .unionByName(aligned)
          }
        merged.write.parquet(dir)
        // Phase 3 — carry the untouched files by name (no data IO) plus
        // the DV / stats / stream-progress sidecars.
        allFiles.foreach { case (n, p) =>
          if (!touched(n))
            sc.carry(spark, p, new org.apache.hadoop.fs.Path(stage, n))
        }
        dv.carrySidecarDropping(spark, tgt, touched, stage)
        graft.storage.StatsSkipping.refreshStats(spark, cur, stage)
        sc.carryBatchId(spark, cur, stage)
      }
    }
    dv.realign(spark, tgt) // re-point (or drop) the <tgt>__dv table
    sc.register(spark, tgt)
      .getOrElse(sys.error(s"MERGE into $tgt left no published version"))
  }

  /** Run a statement on a LIVE session (whose parser was fixed at
    * build): maintenance statements execute through the same grammar
    * the injected parser uses; anything else falls through to
    * `spark.sql`. */
  def sql(spark: SparkSession, text: String): DataFrame =
    maintenance(text) match {
      case Some(cmd: org.apache.spark.sql.execution.command.RunnableCommand) =>
        import scala.jdk.CollectionConverters._
        val rows = cmd.run(spark)
        spark.createDataFrame(rows.asJava, StructType(cmd.output.map(a =>
          org.apache.spark.sql.types.StructField(a.name, a.dataType,
            a.nullable))))
      case _ => spark.sql(text)
    }
}
