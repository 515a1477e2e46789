package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{StringType, StructType}

/** The MAINTENANCE + DDL SQL surface — the statements a user of the
  * reference actually types on Databricks, parsed into this engine's
  * own commands so the reference's operational vocabulary runs here AS
  * SQL, not only as Scala calls:
  *
  *   OPTIMIZE t                          -> Optimize.compact
  *   OPTIMIZE t ZORDER BY (a, b)         -> Optimize.zorder
  *   RESTORE TABLE t TO VERSION AS OF v  -> DeletionVectors.restore
  *   VACUUM t RETAIN v VERSIONS          -> DeletionVectors.vacuum
  *   VACUUM t RETAIN n VERSIONS|HOURS
  *     DRY RUN                           -> report, touch nothing
  *   ALTER TABLE t CLUSTER BY (...)|NONE -> liquid-clustering decl:
  *                                          plain OPTIMIZE re-clusters
  *   REORG TABLE t APPLY (PURGE)         -> materialize DV deletes
  *                                          into rewritten files
  *   CREATE TABLE d SHALLOW CLONE s      -> SnapshotCommit.clone
  *   CONVERT TO DELTA t [NO STATISTICS]  -> in-place migration: v1 =
  *                                          current files carried,
  *                                          stats from footers
  *   ALTER TABLE t DROP COLUMN(S) ...    -> logical removal via the
  *                                          schema ledger (files keep
  *                                          the bytes; time travel
  *                                          below still serves them)
  *   ALTER TABLE t ADD CONSTRAINT n      -> Delta CHECK constraint:
  *     CHECK (expr)                         history validated at ADD,
  *   ALTER TABLE t DROP CONSTRAINT          enforced on every
  *     [IF EXISTS] n                        versioned write
  *   DESCRIBE HISTORY t                  -> per-version audit rows
  *                                          (constant-time, from the
  *                                          commit-time _meta sidecar)
  *   DESCRIBE DETAIL t                   -> one row of table facts
  *                                          (same sidecars, same cost)
  *   DELETE FROM t [WHERE pred]          -> DeletionVectors.delete (a
  *                                          DV mark, no data rewrite)
  *   UPDATE t SET c = e, ... [WHERE p]   -> touched-file rewrite commit
  *   SELECT ... FROM t VERSION AS OF v   -> DV-history time travel
  *                                          (plan-level on the injected
  *                                          parser; view-bound on live
  *                                          sessions)
  *   CREATE OR REFRESH MATERIALIZED VIEW n
  *     (CONSTRAINT c EXPECT (expr)
  *        [ON VIOLATION FAIL UPDATE|DROP ROW], ...)?
  *     (CLUSTER BY (cols))? (COMMENT "...")? (TBLPROPERTIES (...))?
  *     AS query                          -> Pipeline MaterializedView arm
  *                                          (the reference's gold files
  *                                          run near-verbatim — see
  *                                          g15/g16 and [[parseCreateMv]])
  *   MERGE INTO t USING s ON t.k = s.k   -> TOUCHED-FILE merge commit
  *     WHEN MATCHED THEN UPDATE SET *       (upsert; + NOT MATCHED BY
  *     WHEN NOT MATCHED THEN INSERT *        SOURCE THEN DELETE = full
  *     [WHEN NOT MATCHED BY SOURCE            sync; WHEN MATCHED THEN
  *      THEN DELETE]                          DELETE = keyed delete)
  *   MERGE INTO t [AS a] USING s [AS b]  -> the GENERAL grammar:
  *     ON t.k1 = s.k1 AND t.k2 = s.k2       multi-column keys,
  *     WHEN MATCHED AND cond THEN            first-match conditional
  *       UPDATE SET c = expr, ... | DELETE   clauses, explicit SET
  *     WHEN NOT MATCHED AND cond THEN        assignments, INSERT column
  *       INSERT (cols) VALUES (exprs)        lists with null-fill
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
class GraftSqlParser(delegate: ParserInterface,
    session: SparkSession = null) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.maintenance(sqlText).getOrElse {
      val plan = delegate.parsePlan(sqlText)
      // `FROM t VERSION AS OF v` parses into RelationTimeTravel, which
      // v1 analysis rejects — resolve it against the engine's
      // deletion-vector history instead (the session is the one the
      // extension was built for; a bare-delegate construction skips).
      if (session == null) plan
      else GraftSqlParser.resolveTimeTravel(session, plan)
    }
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
  * ones) with its commit timestamp, operation, file count, total live
  * bytes, row count and current-flag. CONSTANT-TIME per version: every
  * column is served from the `_meta` audit sidecar the commit recorded
  * at stage time (one tiny file read per version, no per-data-file
  * `getFileStatus`), and the candidate versions come from ONE listing
  * of the `_commits` directory rather than probing 1..current — at a
  * million files x V versions the old shape was millions of
  * NameNode/blob round-trips per statement; this is V+1. Versions
  * predating the sidecar (or manifest-mode versions, whose carried
  * refs record no physical size) fall back to the legacy per-file
  * listing for the missing columns — counted in [[legacyStatusCalls]]
  * so a test can pin that a `_meta`-bearing table issues none.
  */
final case class GraftHistoryCommand(table: String)
  extends LeafRunnableCommand {
  import org.apache.spark.sql.types.{BooleanType, LongType}
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp_ms", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)(),
    AttributeReference("rows", LongType, nullable = false)(),
    AttributeReference("is_current", BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val sc = graft.storage.SnapshotCommit
    val cur = sc.register(spark, table).getOrElse(sys.error(
      s"DESCRIBE HISTORY $table: table has no published version"))
    val fs = sc.rootDir(spark, table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    sc.publishedVersions(spark, table).flatMap { v =>
      sc.resolveDir(spark, table, v).map { d =>
        def legacyBytes(): Long = {
          val files = sc.listData(spark, d)
          GraftHistoryCommand.legacyStatusCalls.addAndGet(files.size)
          files.map(f => fs.getFileStatus(f._2).getLen).sum
        }
        sc.versionMeta(spark, d) match {
          case Some(m) =>
            val bytes = if (m.bytes >= 0) m.bytes else legacyBytes()
            Row(v, m.tsMs, m.operation, m.nFiles, bytes, m.rows, v == cur)
          case None => // pre-_meta version: degrade, don't fail
            val files = sc.listData(spark, d)
            GraftHistoryCommand.legacyStatusCalls.addAndGet(files.size)
            val bytes = files.map(f => fs.getFileStatus(f._2).getLen).sum
            val ts = scala.util.Try(
              fs.getFileStatus(d).getModificationTime).getOrElse(-1L)
            Row(v, ts, "UNKNOWN", files.size.toLong, bytes, -1L, v == cur)
        }
      }
    }
  }
  override def simpleString(maxFields: Int): String =
    s"GraftHistory $table"
}

object GraftHistoryCommand {
  /** Per-data-file status calls made by legacy fallbacks — a test probe
    * pinning that `_meta`-served history makes NONE. */
  private[graft] val legacyStatusCalls =
    new java.util.concurrent.atomic.AtomicLong()
}

object GraftSqlParser {

  // Table names: the engine's snapshot tables are single-part
  // identifiers (optionally backquoted).
  private val Ident = "`?([A-Za-z_][A-Za-z0-9_]*)`?"
  private val OptimizeRe =
    s"(?is)\\s*OPTIMIZE\\s+$Ident\\s*".r
  // Delta's `REORG TABLE t APPLY (PURGE)`: materialize pending DV
  // deletes into rewritten files (the statement Databricks documents
  // for purging deletion vectors before e.g. a vacuum of sensitive
  // rows).
  private val ReorgRe =
    (s"(?is)\\s*REORG\\s+TABLE\\s+$Ident\\s+APPLY" +
      "\\s*\\(\\s*PURGE\\s*\\)\\s*").r
  private val ZorderRe =
    s"(?is)\\s*OPTIMIZE\\s+$Ident\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\)\\s*".r
  private val RestoreRe =
    s"(?is)\\s*RESTORE\\s+TABLE\\s+$Ident\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*".r
  private val RestoreTsRe =
    (s"(?is)\\s*RESTORE\\s+TABLE\\s+$Ident\\s+TO\\s+TIMESTAMP\\s+AS" +
      "\\s+OF\\s+'([^']+)'\\s*").r
  // ALTER ... SET TBLPROPERTIES on the versioned surface: properties
  // live in the snapshot-root `_properties` sidecar (what OPTIMIZE and
  // clones consult) AND, when a catalog entry exists, in the catalog —
  // one statement keeps both in step.
  private val SetPropsRe =
    (s"(?is)\\s*ALTER\\s+TABLE\\s+$Ident\\s+SET\\s+TBLPROPERTIES" +
      "\\s*\\((.*)\\)\\s*").r
  // ALTER ... ADD COLUMN(S) — schema evolution on the versioned
  // surface: a metadata-only commit (every file carries) plus a ledger
  // entry in the root `_properties` sidecar; time travel below the
  // alter keeps serving the old schema. Plain catalog tables delegate
  // to Spark's own AlterTableAddColumnsCommand.
  private val AddColsRe =
    (s"(?is)\\s*ALTER\\s+TABLE\\s+$Ident\\s+ADD\\s+COLUMNS?" +
      "\\s*\\((.+)\\)\\s*").r
  // ALTER ... DROP COLUMN(S) — logical removal through the schema
  // ledger: a metadata-only commit; the files keep the column's bytes
  // (Delta's drop is logical too) and time travel below the alter
  // still serves it.
  private val DropColsRe =
    (s"(?is)\\s*ALTER\\s+TABLE\\s+$Ident\\s+DROP\\s+COLUMNS?" +
      "\\s*\\(?\\s*([A-Za-z_][A-Za-z0-9_,\\s`]*?)\\s*\\)?\\s*").r
  // ALTER ... ADD/DROP CONSTRAINT — Delta's CHECK constraints:
  // `delta.constraints.<name>` properties in the root `_properties`
  // sidecar, validated against EXISTING data at ADD time and enforced
  // on every versioned write (INSERT/OVERWRITE/COPY/UPDATE/MERGE).
  private val AddConstraintRe =
    (s"(?is)\\s*ALTER\\s+TABLE\\s+$Ident\\s+ADD\\s+CONSTRAINT\\s+" +
      s"$Ident\\s+CHECK\\s*\\((.+)\\)\\s*").r
  private val DropConstraintRe =
    (s"(?is)\\s*ALTER\\s+TABLE\\s+$Ident\\s+DROP\\s+CONSTRAINT\\s+" +
      s"(IF\\s+EXISTS\\s+)?$Ident\\s*").r
  private val VacuumRe =
    s"(?is)\\s*VACUUM\\s+$Ident\\s+RETAIN\\s+(\\d+)\\s+VERSIONS\\s*".r
  // Delta's actual retention form: fold delete versions whose commit
  // timestamp (the sidecar's `_ts:` sentinels) is older than n hours.
  private val VacuumHoursRe =
    s"(?is)\\s*VACUUM\\s+$Ident\\s+RETAIN\\s+(\\d+)\\s+HOURS\\s*".r
  // Delta's `VACUUM ... DRY RUN`: report what a vacuum would touch,
  // touch nothing.
  private val VacuumDryRe =
    (s"(?is)\\s*VACUUM\\s+$Ident\\s+RETAIN\\s+(\\d+)\\s+" +
      "(VERSIONS|HOURS)\\s+DRY\\s+RUN\\s*").r
  // Databricks' liquid-clustering declaration: record the clustering
  // columns (Delta's `clusteringColumns` vocabulary) so a later plain
  // `OPTIMIZE t` re-clusters instead of merely compacting.
  private val AlterClusterByRe =
    (s"(?is)\\s*ALTER\\s+TABLE\\s+$Ident\\s+CLUSTER\\s+BY" +
      "\\s*\\(([^)]+)\\)\\s*").r
  private val AlterClusterNoneRe =
    s"(?is)\\s*ALTER\\s+TABLE\\s+$Ident\\s+CLUSTER\\s+BY\\s+NONE\\s*".r
  // CTAS through the commit protocol: every created table is versioned
  // (time travel, DESCRIBE HISTORY, stats skipping) out of the box.
  // Multipart names never match (the '.' breaks the ident) and delegate.
  private val CtasRe =
    (s"(?is)\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?TABLE\\s+$Ident" +
      "\\s+AS\\s+(.+)").r
  // INSERT INTO as an append COMMIT (new files + previous files carried
  // by name). The body must open with a query keyword; a column-list
  // INSERT parses to a loud exec-time error on versioned targets (a
  // silent delegate would write raw files INTO the immutable version
  // directory).
  private val InsertRe =
    (s"(?is)\\s*INSERT\\s+INTO\\s+(?:TABLE\\s+)?$Ident" +
      "\\s+((?:SELECT|VALUES|TABLE|FROM|WITH)\\b.*)").r
  // `INSERT INTO t (a, b) <query>` — a COLUMN LIST (identifiers only,
  // no nested parens) followed by a query body: unnamed target columns
  // null-fill, Spark's semantics. Distinguished from the parenthesized-
  // query form below by requiring a non-empty body after the ')'.
  private val InsertColsListRe =
    (s"(?is)\\s*INSERT\\s+INTO\\s+(?:TABLE\\s+)?$Ident" +
      "\\s*\\(([^()]*)\\)\\s*((?:SELECT|VALUES|TABLE|FROM|WITH|\\().*)").r
  // `INSERT INTO t (SELECT ...)` — Spark's parenthesized-query body.
  private val InsertParenRe =
    (s"(?is)\\s*INSERT\\s+INTO\\s+(?:TABLE\\s+)?$Ident" +
      "\\s*(\\(\\s*(?:SELECT|WITH|VALUES|TABLE|FROM)\\b.*)").r
  // INSERT OVERWRITE = a full-replace commit under the SAME schema
  // (positional alignment like INSERT INTO); history survives, the DV
  // sidecar does not carry (its coordinates name the replaced files).
  private val InsertOverwriteRe =
    (s"(?is)\\s*INSERT\\s+OVERWRITE\\s+(?:TABLE\\s+)?$Ident" +
      "\\s+((?:SELECT|VALUES|TABLE|FROM|WITH)\\b.*)").r
  // COPY INTO — Databricks' idempotent batch ingest: load a path's
  // files into a versioned table as an append commit, SKIPPING files a
  // previous COPY already loaded (the `_copy:` sidecar ledger);
  // `COPY_OPTIONS ('force' = 'true')` reloads regardless.
  private val CopyIntoRe =
    (s"(?is)\\s*COPY\\s+INTO\\s+$Ident\\s+FROM\\s+'([^']+)'" +
      "\\s+FILEFORMAT\\s*=\\s*([A-Za-z]+)" +
      "(?:\\s+FORMAT_OPTIONS\\s*\\(([^)]*)\\))?" +
      "(?:\\s+COPY_OPTIONS\\s*\\(([^)]*)\\))?\\s*").r
  private val CloneRe =
    s"(?is)\\s*CREATE\\s+TABLE\\s+$Ident\\s+SHALLOW\\s+CLONE\\s+$Ident\\s*".r
  // CONVERT TO DELTA — Databricks' in-place migration statement: an
  // existing plain parquet table becomes a versioned table METADATA-
  // ONLY (version 1 = its current files carried by name; per-file
  // min/max stats from the parquet footers, no data scan — skipping,
  // time travel and DESCRIBE HISTORY work from birth). `NO STATISTICS`
  // skips the footer pass, Delta's grammar. Converting an
  // already-versioned table is a NO-OP (Delta's rule). Partitioned /
  // multi-directory tables fail loudly: partition values live in
  // directory names a flat carry would lose.
  private val ConvertRe =
    (s"(?is)\\s*CONVERT\\s+TO\\s+DELTA\\s+$Ident" +
      "(\\s+NO\\s+STATISTICS)?\\s*").r
  private val ConvertAnyRe = "(?is)\\s*CONVERT\\s+TO\\s+DELTA\\b.*".r
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
  private val DetailRe =
    s"(?is)\\s*DESCRIBE\\s+DETAIL\\s+$Ident\\s*".r
  // Row-level DML: DELETE marks rows dead in the deletion-vector
  // sidecar (no data rewrite — Delta's DV-enabled DELETE); UPDATE is a
  // touched-file rewrite like MERGE.
  private val DeleteRe =
    s"(?is)\\s*DELETE\\s+FROM\\s+$Ident(?:\\s+WHERE\\s+(.+?))?\\s*".r
  private val UpdateHeadRe =
    s"(?is)\\s*UPDATE\\s+$Ident\\s+SET\\s+(.+)".r
  // Any other MERGE INTO routes to the GENERAL grammar below (multi-key
  // ON, conditional WHEN clauses, explicit SET / INSERT column lists) —
  // and fails loudly there on anything not understood, never silently
  // delegating a MERGE to Spark's (v2-only) parser.
  private val MergeGeneralHead = ("(?is)\\s*MERGE\\s+INTO\\s+" +
    s"$Ident(?:\\s+(?:AS\\s+)?$Ident)?\\s+USING\\s+" +
    s"$Ident(?:\\s+(?:AS\\s+)?$Ident)?\\s+ON\\s+(.*?)" +
    "\\s+(WHEN\\s+(?:NOT\\s+)?MATCHED\\b.*)").r
  private val MergeAnyRe = "(?is)\\s*MERGE\\s+INTO\\b.*".r
  // The statement every reference gold file opens with
  // (`/root/reference/scripts/gold/fact_order_items.sql:1`).
  private val CreateMvRe =
    "(?is)\\s*CREATE\\s+OR\\s+REFRESH\\s+MATERIALIZED\\s+VIEW\\s+" +
      "([\\w.`]+)\\s+(.*)" match { case p => p.r }

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

  /** The maintenance grammar; None -> not ours, delegate. A trailing
    * statement terminator is stripped up front — every reference SQL
    * file ends with one, and each arm's regex anchors to the end. */
  def maintenance(sqlText0: String): Option[LogicalPlan] = {
    val sqlText = sqlText0.replaceFirst("(?s);\\s*$", "")
    maintenanceStmt(sqlText)
  }

  private def maintenanceStmt(sqlText: String): Option[LogicalPlan] = sqlText match {
    case ZorderRe(tbl, cols) =>
      val cs = cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
        .filter(_.nonEmpty).toSeq
      Some(GraftMaintenanceCommand(s"OPTIMIZE $tbl ZORDER", { spark =>
        graft.storage.Optimize.zorder(spark, tbl, cs)
        Seq("table" -> tbl, "zordered_by" -> cs.mkString(","))
      }))
    case ReorgRe(tbl) =>
      Some(GraftMaintenanceCommand(s"REORG $tbl", { spark =>
        val dv = graft.storage.DeletionVectors
        val pending = dv.version(spark, tbl)
        dv.compact(spark, tbl)
        Seq("table" -> tbl, "operation" -> "REORG APPLY (PURGE)",
          "purged_through_version" -> pending.toString)
      }))
    case OptimizeRe(tbl) =>
      Some(GraftMaintenanceCommand(s"OPTIMIZE $tbl", { spark =>
        // A table that declared clustering columns (ALTER TABLE ...
        // CLUSTER BY — Databricks liquid clustering) re-clusters on
        // plain OPTIMIZE, Databricks' behavior; everything else
        // bin-packs.
        val clusterCols = graft.storage.SnapshotCommit
          .properties(spark, tbl).get(ClusteringColsProp)
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .filter(_.nonEmpty)
        clusterCols match {
          case Some(cs) =>
            graft.storage.Optimize.zorder(spark, tbl, cs)
            Seq("table" -> tbl, "clustered_by" -> cs.mkString(","))
          case None =>
            val (before, after) =
              graft.storage.Optimize.compact(spark, tbl)
            Seq("table" -> tbl, "files_before" -> before.toString,
              "files_after" -> after.toString)
        }
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
    case RestoreTsRe(tbl, ts) =>
      Some(GraftMaintenanceCommand(s"RESTORE $tbl (timestamp)", { spark =>
        // Same delete-history semantics as the VERSION form, anchored
        // by the `_ts:` timeline (latest version <= ts, Delta's rule);
        // the no-history and sub-floor failures come from the shared
        // machinery.
        val hwm = graft.storage.DeletionVectors.version(spark, tbl)
        require(hwm > 0,
          s"RESTORE $tbl: table has no delete-version history to roll " +
            "back (this statement restores DELETE history; appends are " +
            "separate snapshot versions)")
        val v = graft.storage.DeletionVectors
          .versionAtTimestamp(spark, tbl, parseTsMs(spark, ts))
        graft.storage.DeletionVectors.restore(spark, tbl, v)
        Seq("table" -> tbl, "restored_to_version" -> v.toString,
          "anchor" -> ts)
      }))
    case SetPropsRe(tbl, pairs) =>
      val props = splitTop(pairs, ",").map {
        case PropPairRe(k, v) => k -> v
        case other => sys.error(
          s"TBLPROPERTIES entry not understood: '${other.trim}'")
      }.toMap
      require(props.nonEmpty, "SET TBLPROPERTIES needs at least one pair")
      Some(GraftMaintenanceCommand(s"SET TBLPROPERTIES $tbl", { spark =>
        graft.storage.SnapshotCommit.setProperties(spark, tbl, props)
        // Keep the catalog entry (when one exists) in step — SHOW
        // TBLPROPERTIES reads it; absent-table is fine (properties
        // declared before first adoption are a documented path). A
        // REAL catalog failure propagates — swallowing it would leave
        // sidecar and catalog silently out of step (the sidecar write
        // above is durable either way, and re-running the statement is
        // idempotent).
        if (spark.sessionState.catalog.getTempView(tbl).isEmpty &&
            spark.catalog.tableExists(tbl)) {
          // Through the catalog API, never spark.sql — an ALTER
          // statement would re-enter this very parser on an injected
          // session (infinite recursion).
          val cat = spark.sessionState.catalog
          val meta = cat.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(tbl))
          cat.alterTable(meta.copy(properties = meta.properties ++ props))
        }
        Seq("table" -> tbl, "properties_set" -> props.size.toString)
      }))
    case CopyIntoRe(tbl, path, fmt, fmtOpts, copyOpts) =>
      def pairs(txt: String): Map[String, String] =
        if (txt == null || txt.trim.isEmpty) Map.empty
        else splitTop(txt, ",").map {
          case PropPairRe(k, v) => k -> v
          case other => sys.error(
            s"COPY INTO options entry not understood: '${other.trim}'")
        }.toMap
      Some(GraftMaintenanceCommand(s"COPY INTO $tbl", { spark =>
        val (v, files, rows) = runCopyInto(spark, tbl, path,
          fmt.toUpperCase, pairs(fmtOpts), pairs(copyOpts))
        Seq("table" -> tbl, "operation" -> "COPY INTO",
          "files_loaded" -> files.toString,
          "rows_loaded" -> rows.toString,
          "version" -> (if (v >= 0) v.toString else "unchanged"))
      }))
    case AddColsRe(tbl, colsDdl) =>
      Some(GraftMaintenanceCommand(s"ADD COLUMNS $tbl", { spark =>
        val v = runAddColumns(spark, tbl, colsDdl)
        Seq("table" -> tbl, "operation" -> "ADD COLUMNS",
          (if (v >= 0) "version" -> v.toString
           else "mode" -> "delegated (plain catalog table)"))
      }))
    case DropColsRe(tbl, colsTxt) =>
      val cols = colsTxt.split(",")
        .map(_.trim.stripPrefix("`").stripSuffix("`"))
        .filter(_.nonEmpty).toSeq
      Some(GraftMaintenanceCommand(s"DROP COLUMNS $tbl", { spark =>
        val v = runDropColumns(spark, tbl, cols)
        Seq("table" -> tbl, "operation" -> "DROP COLUMNS",
          "columns" -> cols.mkString(","), "version" -> v.toString)
      }))
    case AddConstraintRe(tbl, name, cond) =>
      Some(GraftMaintenanceCommand(s"ADD CONSTRAINT $tbl", { spark =>
        import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
        val key = ConstraintPropPrefix + name.toLowerCase
        require(!graft.storage.SnapshotCommit.properties(spark, tbl)
          .contains(key),
          s"ALTER TABLE $tbl ADD CONSTRAINT: constraint $name " +
            "already exists (DROP CONSTRAINT first)")
        // Delta validates HISTORY first: an existing live row that
        // violates the check fails the ALTER — a constraint must never
        // be born broken. NULL results pass (SQL's CHECK rule:
        // violated only when the predicate is FALSE).
        val live =
          if (graft.storage.SnapshotCommit.currentVersion(spark, tbl)
              .isDefined)
            graft.storage.DeletionVectors.read(spark, tbl)
          else {
            require(spark.catalog.tableExists(tbl),
              s"ALTER TABLE $tbl ADD CONSTRAINT: table not found")
            spark.table(tbl)
          }
        val bad = live.filter(not(coalesce(expr(cond).cast("boolean"),
          lit(true)))).limit(1).collect()
        require(bad.isEmpty,
          s"ALTER TABLE $tbl ADD CONSTRAINT $name: an existing row " +
            s"violates CHECK ($cond): ${bad.mkString}")
        graft.storage.SnapshotCommit.setProperties(spark, tbl,
          Map(key -> cond))
        Seq("table" -> tbl, "constraint" -> name, "check" -> cond)
      }))
    case DropConstraintRe(tbl, ifExists, name) =>
      Some(GraftMaintenanceCommand(s"DROP CONSTRAINT $tbl", { spark =>
        val key = ConstraintPropPrefix + name.toLowerCase
        val had = graft.storage.SnapshotCommit.properties(spark, tbl)
          .contains(key)
        require(had || ifExists != null,
          s"ALTER TABLE $tbl DROP CONSTRAINT: no constraint named " +
            s"$name (use IF EXISTS)")
        graft.storage.SnapshotCommit.removeProperties(spark, tbl,
          _ == key)
        Seq("table" -> tbl, "constraint" -> name,
          "dropped" -> had.toString)
      }))
    case VacuumDryRe(tbl, n, unit) =>
      Some(GraftMaintenanceCommand(s"VACUUM $tbl DRY RUN", { spark =>
        val dv = graft.storage.DeletionVectors
        val cutoff =
          if (unit.equalsIgnoreCase("HOURS"))
            dv.vacuumHoursCutoff(spark, tbl, n.toLong)
          else math.max(dv.version(spark, tbl) - n.toLong, 0L)
        val would = if (cutoff > 0)
          dv.vacuumDryRun(spark, tbl, cutoff) else Seq.empty
        Seq("table" -> tbl,
          "would_vacuum_through_version" -> cutoff.toString,
          "files_to_rewrite" -> would.size.toString) ++
          would.map(f => "file" -> f)
      }))
    case AlterClusterNoneRe(tbl) =>
      Some(GraftMaintenanceCommand(s"CLUSTER BY NONE $tbl", { spark =>
        graft.storage.SnapshotCommit.removeProperties(spark, tbl,
          _ == ClusteringColsProp)
        Seq("table" -> tbl, "clustering" -> "none")
      }))
    case AlterClusterByRe(tbl, colsTxt) =>
      val cs = colsTxt.split(",")
        .map(_.trim.stripPrefix("`").stripSuffix("`"))
        .filter(_.nonEmpty).toSeq
      require(cs.nonEmpty && cs.size <= 4,
        s"CLUSTER BY $tbl: 1-4 clustering columns (got ${cs.size}) — " +
          "the Z-order interleave caps at 4 keys, Databricks' limit")
      Some(GraftMaintenanceCommand(s"CLUSTER BY $tbl", { spark =>
        // Columns must exist NOW — a typo'd key silently disabling
        // every future OPTIMIZE would be a trap.
        val schema = graft.storage.SnapshotCommit.readData(spark, tbl)
          .schema.fieldNames
        cs.foreach(c => require(schema.exists(_.equalsIgnoreCase(c)),
          s"CLUSTER BY $tbl: no column $c"))
        graft.storage.SnapshotCommit.setProperties(spark, tbl,
          Map(ClusteringColsProp -> cs.mkString(",")))
        // Keep SHOW TBLPROPERTIES in step (the SetPropsRe discipline).
        if (spark.sessionState.catalog.getTempView(tbl).isEmpty &&
            spark.catalog.tableExists(tbl)) {
          val cat = spark.sessionState.catalog
          val meta = cat.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(tbl))
          cat.alterTable(meta.copy(properties = meta.properties +
            (ClusteringColsProp -> cs.mkString(","))))
        }
        Seq("table" -> tbl, "clustering_columns" -> cs.mkString(","))
      }))
    case VacuumHoursRe(tbl, h) =>
      Some(GraftMaintenanceCommand(s"VACUUM $tbl (hours)", { spark =>
        val cutoff = graft.storage.DeletionVectors
          .vacuumRetainHours(spark, tbl, h.toLong)
        Seq("table" -> tbl, "retained_hours" -> h,
          "vacuumed_through_version" -> cutoff.toString)
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
    case ConvertRe(tbl, noStats) =>
      Some(GraftMaintenanceCommand(s"CONVERT $tbl", { spark =>
        val (v, files, mode) = runConvert(spark, tbl,
          withStats = noStats == null)
        Seq("table" -> tbl, "operation" -> "CONVERT TO DELTA",
          "version" -> v.toString, "files" -> files.toString,
          "statistics" -> mode)
      }))
    case ConvertAnyRe() => sys.error(
      "CONVERT TO DELTA takes a single-part table identifier " +
        "(optionally followed by NO STATISTICS): the parquet.`/path` " +
        "and PARTITIONED BY forms are not supported — register the " +
        "directory as an unpartitioned table first")
    case CtasRe(orReplace, tbl, query) =>
      Some(GraftMaintenanceCommand(s"CTAS $tbl", { spark =>
        val v = runCtas(spark, tbl, query, replace = orReplace != null)
        Seq("table" -> tbl,
          "operation" -> (if (orReplace != null) "REPLACE TABLE AS SELECT"
                          else "CREATE TABLE AS SELECT"),
          "version" -> v.toString)
      }))
    case InsertOverwriteRe(tbl, query) =>
      Some(insertCommand(tbl, query, cols = None, overwrite = true))
    case InsertRe(tbl, query) =>
      Some(insertCommand(tbl, query, cols = None))
    case InsertColsListRe(tbl, colsTxt, query) =>
      val cols = colsTxt.split(",")
        .map(_.trim.stripPrefix("`").stripSuffix("`"))
        .filter(_.nonEmpty).toSeq
      require(cols.nonEmpty &&
        cols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
        s"INSERT INTO $tbl: column list not understood: ($colsTxt)")
      require(cols.map(_.toLowerCase).distinct.size == cols.size,
        s"INSERT INTO $tbl repeats a column: ($colsTxt)")
      Some(insertCommand(tbl, query, cols = Some(cols)))
    case InsertParenRe(tbl, query) =>
      Some(insertCommand(tbl, query, cols = None))
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
    case DetailRe(tbl) =>
      // Delta's `DESCRIBE DETAIL`: one row of table-level facts, served
      // from the CURRENT version's `_meta` audit sidecar plus the root
      // sidecars — constant-time like HISTORY (no per-data-file status;
      // a pre-_meta or manifest version reports -1 bytes rather than
      // paying a per-file walk).
      Some(GraftMaintenanceCommand(s"DETAIL $tbl", { spark =>
        val sc = graft.storage.SnapshotCommit
        val v = sc.register(spark, tbl).getOrElse(sys.error(
          s"DESCRIBE DETAIL $tbl: table has no published version"))
        val dir = sc.resolveDir(spark, tbl, v).getOrElse(sys.error(
          s"DESCRIBE DETAIL $tbl: version v$v has no directory"))
        val meta = sc.versionMeta(spark, dir)
        val props = sc.properties(spark, tbl)
        Seq(
          "name" -> tbl,
          "format" -> "parquet (graft snapshot)",
          "location" -> dir.toString,
          "version" -> v.toString,
          "numFiles" -> meta.map(_.nFiles.toString).getOrElse("-1"),
          "sizeInBytes" -> meta.map(_.bytes.toString).getOrElse("-1"),
          "numRows" -> meta.map(_.rows.toString).getOrElse("-1"),
          "lastModified" -> meta.map(_.tsMs.toString).getOrElse("-1"),
          "lastOperation" -> meta.map(_.operation).getOrElse("UNKNOWN"),
          "deleteVersion" ->
            graft.storage.DeletionVectors.version(spark, tbl).toString
        ) ++ props.toSeq.sortBy(_._1).map { case (k, vv) =>
          s"properties.$k" -> vv }
      }))
    case DeleteRe(tbl, pred) =>
      Some(GraftMaintenanceCommand(s"DELETE FROM $tbl", { spark =>
        import org.apache.spark.sql.functions.{expr, lit}
        // DV delete: data files untouched, matched coordinates land in
        // the sidecar — Delta's deletion-vector DELETE. No WHERE =
        // delete everything (still metadata + a coordinate scan, never
        // a rewrite); time travel to the pre-delete state stays free.
        val p = Option(pred).map(expr).getOrElse(lit(true))
        val v = graft.storage.DeletionVectors.delete(spark, tbl, p)
        Seq("table" -> tbl, "operation" -> "DELETE",
          "delete_version" -> v.toString)
      }))
    case UpdateHeadRe(tbl, setsAndWhere) =>
      // Split SET assignments from the optional WHERE at top level (an
      // '=' RHS may itself contain WHERE only inside parens/strings).
      val wIdx = topLevelIndexOf(setsAndWhere, "WHERE")
      val setsText =
        if (wIdx < 0) setsAndWhere else setsAndWhere.substring(0, wIdx)
      val predText =
        if (wIdx < 0) None
        else Some(setsAndWhere.substring(wIdx + "WHERE".length).trim)
      val sets = splitTop(setsText, ",").map {
        case AssignRe(q, c, e) =>
          require(q == null || q.equalsIgnoreCase(tbl),
            s"UPDATE SET lhs must name a column of $tbl, got $q.$c")
          (c, e)
        case other =>
          sys.error(s"UPDATE SET assignment not understood: '${other.trim}'")
      }
      require(sets.nonEmpty, "UPDATE needs at least one SET assignment")
      require(sets.map(_._1.toLowerCase).distinct.size == sets.size,
        s"UPDATE SET assigns a column twice: $setsText")
      Some(GraftMaintenanceCommand(s"UPDATE $tbl", { spark =>
        val v = runUpdate(spark, tbl, sets, predText)
        Seq("table" -> tbl, "operation" -> "UPDATE",
          "version" -> v.toString)
      }))
    case CreateMvRe(name, rest) =>
      Some(parseCreateMv(name.replace("`", ""), rest))
    case text if MergeAnyRe.matches(text) =>
      // Not one of the canonical star forms above: the general grammar
      // (which throws, with the offending clause named, on anything it
      // does not understand — a MERGE never silently delegates).
      Some(parseGeneralMerge(text))
    case _ => None
  }

  // ----- general MERGE grammar (multi-key ON, conditional clauses,
  // ----- explicit SET assignments and INSERT column lists) -----

  private sealed trait MatchedAction
  private case object UpdateAll extends MatchedAction
  private final case class UpdateSet(sets: Seq[(String, String)])
    extends MatchedAction
  private case object DeleteRow extends MatchedAction
  private final case class MatchedClause(cond: Option[String],
    action: MatchedAction)

  private sealed trait InsertAction
  private case object InsertAll extends InsertAction
  private final case class InsertCols(cols: Seq[String], vals: Seq[String])
    extends InsertAction
  private final case class NotMatchedClause(cond: Option[String],
    action: InsertAction)

  /** Split on a separator at paren-depth 0, outside string literals —
    * `sep` is either a single char (",") or a word ("AND", matched
    * case-insensitively at word boundaries). */
  private def splitTop(s: String, sep: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var last = 0; var i = 0
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inStr) { if (ch == '\'') inStr = false; i += 1 }
      else ch match {
        case '\'' => inStr = true; i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ if depth == 0 && sep.length == 1 && ch == sep.charAt(0) =>
          out += s.substring(last, i); last = i + 1; i += 1
        case _ if depth == 0 && sep.length > 1 &&
            s.regionMatches(true, i, sep, 0, sep.length) &&
            (i == 0 || !isWordChar(s.charAt(i - 1))) &&
            (i + sep.length >= s.length ||
              !isWordChar(s.charAt(i + sep.length))) =>
          out += s.substring(last, i); last = i + sep.length
          i += sep.length
        case _ => i += 1
      }
    }
    out += s.substring(last)
    out.toSeq
  }

  private val OnEqRe =
    s"(?is)\\s*$Ident\\s*\\.\\s*$Ident\\s*=\\s*$Ident\\s*\\.\\s*$Ident\\s*".r
  private val MatchedClauseRe =
    "(?is)\\s*WHEN\\s+MATCHED(?:\\s+AND\\s+(.*?))?\\s+THEN\\s+(.*?)\\s*".r
  private val NotMatchedClauseRe =
    "(?is)\\s*WHEN\\s+NOT\\s+MATCHED(?:\\s+AND\\s+(.*?))?\\s+THEN\\s+(.*?)\\s*".r
  private val BySourceRe =
    "(?is)\\s*WHEN\\s+NOT\\s+MATCHED\\s+BY\\s+SOURCE\\b.*".r
  private val UpdateAllRe = "(?is)\\s*UPDATE\\s+SET\\s+\\*\\s*".r
  private val UpdateSetRe = "(?is)\\s*UPDATE\\s+SET\\s+(.+?)\\s*".r
  private val DeleteActRe = "(?is)\\s*DELETE\\s*".r
  private val InsertAllRe = "(?is)\\s*INSERT\\s+\\*\\s*".r
  private val InsertColsRe =
    "(?is)\\s*INSERT\\s*\\(([^)]*)\\)\\s*VALUES\\s*\\((.*)\\)\\s*".r
  private val AssignRe =
    s"(?is)\\s*(?:$Ident\\s*\\.\\s*)?$Ident\\s*=\\s*(.+?)\\s*".r

  /** Parse the general MERGE form. The grammar accepts what Databricks
    * users actually write — `MERGE INTO t [AS a] USING s [AS b] ON
    * <conjunction of same-named key equalities> (WHEN [NOT] MATCHED
    * [AND <cond>] THEN <action>)+` with actions `UPDATE SET *`,
    * `UPDATE SET c = expr, ...`, `DELETE`, `INSERT *`, `INSERT (cols)
    * VALUES (exprs)` — and FAILS LOUDLY, naming the clause, on
    * everything else (rename-on-merge ON clauses, conditional NOT
    * MATCHED BY SOURCE, CASE expressions containing a bare THEN in a
    * clause condition). Clause semantics are Delta's: per matched pair
    * the FIRST clause whose condition holds applies (none → row kept
    * unchanged); per unmatched source row the first holding NOT MATCHED
    * clause inserts (none → dropped). */
  private def parseGeneralMerge(text: String): LogicalPlan = text match {
    case MergeGeneralHead(tgt, tA, src, sA, onText, clausesText) =>
      // ON: conjunction of equalities, each resolving to one SHARED key
      // column (the same-name rule and loud failure as mergeKey).
      val keys = splitTop(onText, "AND").map {
        case OnEqRe(q1, c1, q2, c2) => mergeKey(tgt, tA, src, sA, q1, c1, q2, c2)
        case other => sys.error(
          s"MERGE ON clause not understood (need `t.k = s.k [AND ...]`): " +
            s"'${other.trim}'")
      }
      require(keys.nonEmpty, "MERGE needs at least one ON key")
      require(keys.map(_.toLowerCase).distinct.size == keys.size,
        s"MERGE ON clause repeats a key: ${keys.mkString(", ")}")
      // Clause boundaries: top-level `WHEN [NOT] MATCHED` tokens.
      val whenRe = "(?i)\\bWHEN\\s+(?:NOT\\s+)?MATCHED\\b".r
      val starts = whenRe.findAllMatchIn(clausesText).map(_.start).toSeq
      val pieces = starts.zipAll(starts.drop(1), 0, clausesText.length)
        .map { case (a, b) => clausesText.substring(a, b).trim }
      val matched = scala.collection.mutable.ArrayBuffer.empty[MatchedClause]
      val notMatched =
        scala.collection.mutable.ArrayBuffer.empty[NotMatchedClause]
      pieces.foreach {
        case BySourceRe() => sys.error(
          "WHEN NOT MATCHED BY SOURCE is supported only in the canonical " +
            "full-sync form (UPDATE SET * / INSERT * / THEN DELETE, " +
            "unconditional)")
        case NotMatchedClauseRe(cond, action) =>
          notMatched += NotMatchedClause(Option(cond).map(_.trim),
            parseInsertAction(action))
        case MatchedClauseRe(cond, action) =>
          matched += MatchedClause(Option(cond).map(_.trim),
            parseMatchedAction(action, tgt, tA))
        case other => sys.error(s"MERGE clause not understood: '$other'")
      }
      require(matched.nonEmpty || notMatched.nonEmpty,
        "MERGE needs at least one WHEN clause")
      GraftMaintenanceCommand(s"MERGE $src -> $tgt (general)", { spark =>
        val v = runMergeGeneral(spark, tgt, Option(tA).getOrElse(tgt),
          src, Option(sA).getOrElse(src), keys.toList, matched.toList,
          notMatched.toList)
        Seq("table" -> tgt, "merged_from" -> src,
          "keys" -> keys.mkString(","), "mode" -> "general",
          "version" -> v.toString)
      })
    case _ => sys.error(
      "MERGE statement not understood: expected `MERGE INTO t [AS a] " +
        "USING s [AS b] ON t.k = s.k [AND ...] WHEN ...`")
  }

  private def parseMatchedAction(a: String, tgt: String,
      tA: String): MatchedAction = a match {
    case UpdateAllRe() => UpdateAll
    case DeleteActRe() => DeleteRow
    case UpdateSetRe(sets) =>
      val parsed = splitTop(sets, ",").map {
        case AssignRe(q, c, e) =>
          // A qualified assignment lhs must qualify the TARGET — silently
          // treating `SET s.c = ...` as the target's `c` would mask a
          // user error Delta rejects.
          require(q == null || q.equalsIgnoreCase(tgt) ||
            (tA != null && q.equalsIgnoreCase(tA)),
            s"MERGE UPDATE SET lhs must name a target column, got $q.$c")
          (c, e)
        case other => sys.error(
          s"MERGE UPDATE SET assignment not understood: '${other.trim}'")
      }
      require(parsed.map(_._1.toLowerCase).distinct.size == parsed.size,
        s"MERGE UPDATE SET assigns a column twice: $sets")
      UpdateSet(parsed)
    case other => sys.error(s"MERGE MATCHED action not understood: '$other'")
  }

  private def parseInsertAction(a: String): InsertAction = a match {
    case InsertAllRe() => InsertAll
    case InsertColsRe(cols, vals) =>
      val cs = cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
        .filter(_.nonEmpty).toSeq
      val vs = splitTop(vals, ",").map(_.trim)
      require(cs.nonEmpty && cs.size == vs.size,
        s"MERGE INSERT column/value arity mismatch: ($cols) vs ($vals)")
      require(cs.map(_.toLowerCase).distinct.size == cs.size,
        s"MERGE INSERT repeats a column: $cols")
      InsertCols(cs, vs)
    case other =>
      sys.error(s"MERGE NOT MATCHED action not understood: '$other'")
  }

  // ----- CREATE OR REFRESH MATERIALIZED VIEW -----

  /** Index of the first occurrence of `word` at paren-depth 0, outside
    * single- and double-quoted strings; -1 if none. */
  private def topLevelIndexOf(s: String, word: String): Int = {
    var depth = 0; var q1 = false; var q2 = false; var i = 0
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < s.length) {
      val ch = s.charAt(i)
      if (q1) { if (ch == '\'') q1 = false }
      else if (q2) { if (ch == '"') q2 = false }
      else ch match {
        case '\'' => q1 = true
        case '"' => q2 = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 &&
            s.regionMatches(true, i, word, 0, word.length) &&
            (i == 0 || !isWordChar(s.charAt(i - 1))) &&
            (i + word.length >= s.length ||
              !isWordChar(s.charAt(i + word.length))) =>
          return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  /** Strip the DLT virtual-schema prefix `LIVE.` (DLT's own resolution
    * rule: `LIVE.x` names the pipeline-visible dataset `x`) — but only
    * OUTSIDE string literals, backquoted identifiers and SQL comments: a
    * regex replaceAll also rewrote matches inside literals (`'LIVE.x'`
    * silently became `'x'` — data alteration, ADVICE r15). Same scanner
    * discipline as [[topLevelIndexOf]]/[[splitTop]].
    */
  private[graft] def stripLivePrefix(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    var q1 = false; var q2 = false; var bt = false
    var lineC = false; var blockC = false
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < s.length) {
      val ch = s.charAt(i)
      if (lineC) { if (ch == '\n') lineC = false; out += ch; i += 1 }
      else if (blockC) {
        if (ch == '*' && i + 1 < s.length && s.charAt(i + 1) == '/') {
          out ++= "*/"; blockC = false; i += 2
        } else { out += ch; i += 1 }
      }
      else if (q1) { if (ch == '\'') q1 = false; out += ch; i += 1 }
      else if (q2) { if (ch == '"') q2 = false; out += ch; i += 1 }
      else if (bt) { if (ch == '`') bt = false; out += ch; i += 1 }
      else if (ch == '\'') { q1 = true; out += ch; i += 1 }
      else if (ch == '"') { q2 = true; out += ch; i += 1 }
      else if (ch == '`') { bt = true; out += ch; i += 1 }
      else if (ch == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        lineC = true; out += ch; i += 1
      }
      else if (ch == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        blockC = true; out += ch; i += 1
      }
      else if (s.regionMatches(true, i, "LIVE", 0, 4) &&
          (i == 0 || !isWordChar(s.charAt(i - 1)))) {
        // The prefix only strips when the token is followed (over
        // optional whitespace) by '.': `LIVE` as a plain identifier or
        // `LIVES.x` pass through untouched.
        var j = i + 4
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (j < s.length && s.charAt(j) == '.') {
          var k = j + 1
          while (k < s.length && s.charAt(k).isWhitespace) k += 1
          i = k // drop "LIVE . " entirely
        } else { out += ch; i += 1 }
      }
      else { out += ch; i += 1 }
    }
    out.toString
  }

  /** Is position `pos` of `s` inside a single/double-quoted literal or a
    * SQL comment? (Backquoted identifiers cannot legally contain the
    * statement keywords the callers guard, so they are not tracked.) */
  private def inQuotedOrComment(s: String, pos: Int): Boolean = {
    var i = 0
    var q1 = false; var q2 = false; var lineC = false; var blockC = false
    while (i < pos && i < s.length) {
      val ch = s.charAt(i)
      if (lineC) { if (ch == '\n') lineC = false }
      else if (blockC) {
        if (ch == '*' && i + 1 < s.length && s.charAt(i + 1) == '/') {
          blockC = false; i += 1
        }
      }
      else if (q1) { if (ch == '\'') q1 = false }
      else if (q2) { if (ch == '"') q2 = false }
      else ch match {
        case '\'' => q1 = true
        case '"' => q2 = true
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          lineC = true
        case '/' if i + 1 < s.length && s.charAt(i + 1) == '*' =>
          blockC = true
        case _ => ()
      }
      i += 1
    }
    q1 || q2 || lineC || blockC
  }

  /** Index just past the ')' matching the '(' at `open`. */
  private def pastBalanced(s: String, open: Int): Int = {
    var depth = 0; var q1 = false; var q2 = false; var i = open
    while (i < s.length) {
      val ch = s.charAt(i)
      if (q1) { if (ch == '\'') q1 = false }
      else if (q2) { if (ch == '"') q2 = false }
      else ch match {
        case '\'' => q1 = true
        case '"' => q2 = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i + 1
        case _ => ()
      }
      i += 1
    }
    sys.error(s"unbalanced parentheses in: $s")
  }

  private val ConstraintRe =
    ("(?is)\\s*CONSTRAINT\\s+`?(\\w+)`?\\s+EXPECT\\s*\\((.*)\\)" +
      "\\s*(?:ON\\s+VIOLATION\\s+(FAIL\\s+UPDATE|DROP\\s+ROW))?\\s*").r
  private val ClusterByRe = "(?is)^CLUSTER\\s+BY\\s*\\(([^)]*)\\)\\s*(.*)".r
  private val CommentRe =
    "(?is)^COMMENT\\s+(?:\"([^\"]*)\"|'([^']*)')\\s*(.*)".r
  private val TblPropsStartRe = "(?is)^TBLPROPERTIES\\s*\\(.*".r
  private val PropPairRe = "(?is)\\s*'([^']*)'\\s*=\\s*'([^']*)'\\s*".r

  /** Parse `CREATE OR REFRESH MATERIALIZED VIEW name (CONSTRAINT ...)?
    * CLUSTER BY (...)? COMMENT "..."? TBLPROPERTIES (...)? AS <query>` —
    * the reference's gold-file statement form
    * (`fact_order_items.sql:1-19`) — and execute it through the
    * Pipeline's MaterializedView arm: EXPECT constraints become the
    * expectations triad (`ON VIOLATION FAIL UPDATE` → fail, which
    * aborts the refresh BEFORE the catalog is touched so the prior
    * version survives; `ON VIOLATION DROP ROW` → drop; bare EXPECT →
    * warn), CLUSTER BY takes the range/Z-order clustered write path,
    * COMMENT and TBLPROPERTIES are recorded as table properties. In the
    * query body, the DLT virtual schema `LIVE.x` resolves to the
    * session-visible dataset `x` (prefix stripped — DLT's own
    * resolution rule); real 2/3-part names pass through to the session
    * catalog untouched. The statement is idempotent: each run is a full
    * refresh (CREATE **OR REFRESH** semantics).
    */
  private def parseCreateMv(name: String, rest: String): LogicalPlan = {
    val body = rest.trim.stripSuffix(";")
    val asIdx = topLevelIndexOf(body, "AS")
    require(asIdx >= 0, "CREATE MATERIALIZED VIEW needs AS <query>")
    var header = body.substring(0, asIdx).trim
    val query = body.substring(asIdx + 2)
    // optional (CONSTRAINT ..., ...) block
    val constraints =
      if (!header.startsWith("(")) Seq.empty[(String, String, String)]
      else {
        val end = pastBalanced(header, 0)
        val block = header.substring(1, end - 1)
        header = header.substring(end).trim
        splitTop(block, ",").map {
          case ConstraintRe(n, e, viol) =>
            (n, e, Option(viol).map(_.replaceAll("\\s+", " ").toUpperCase)
              .getOrElse("WARN"))
          case other => sys.error(
            s"MATERIALIZED VIEW constraint not understood: '${other.trim}'")
        }
      }
    var clusterCols = Seq.empty[String]
    var comment = Option.empty[String]
    var props = Map.empty[String, String]
    while (header.nonEmpty) header match {
      case ClusterByRe(cols, tail) =>
        clusterCols = cols.split(",")
          .map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty).toSeq
        header = tail.trim
      case CommentRe(c1, c2, tail) =>
        comment = Option(c1).orElse(Option(c2))
        header = tail.trim
      case h if TblPropsStartRe.matches(h) =>
        val open = h.indexOf('(')
        val end = pastBalanced(h, open)
        props = splitTop(h.substring(open + 1, end - 1), ",").map {
          case PropPairRe(k, v) => k -> v
          case other => sys.error(
            s"TBLPROPERTIES entry not understood: '${other.trim}'")
        }.toMap
        header = h.substring(end).trim
      case other =>
        sys.error(s"MATERIALIZED VIEW header not understood at: '$other'")
    }
    val liveResolved = stripLivePrefix(query)
    GraftMaintenanceCommand(s"CREATE MV $name", { spark =>
      import org.apache.spark.sql.functions.expr
      val dq = graft.dq.Expectations
      val exps = constraints.map { case (n, e, viol) =>
        if (viol.startsWith("FAIL")) dq.fail(n, expr(e))
        else if (viol.startsWith("DROP")) dq.drop(n, expr(e))
        else dq.warn(n, expr(e))
      }
      new graft.pipeline.Pipeline()
        .register(graft.pipeline.Dataset(name, Nil,
          (sp, _) => sp.sql(liveResolved),
          expectations = exps,
          materialize = graft.pipeline.Materialize.MaterializedView,
          clusterBy = clusterCols,
          tableProperties = props ++ comment.map("comment" -> _),
          // One build pass: gold MVs are multi-join facts — validate
          // against the staged copy, never re-run the join tree.
          validateStaged = exps.nonEmpty))
        .run(spark)
      Seq("table" -> name,
        "operation" -> "CREATE OR REFRESH MATERIALIZED VIEW",
        "constraints" -> exps.size.toString,
        "clustered_by" -> clusterCols.mkString(","))
    })
  }

  /** The source keys' per-column [min, max] envelope as a pushable
    * predicate — the probe-pruning bounds (see the runMerge probe
    * comment). One 1-row aggregate over the source. None when ANY key
    * column has no non-null value: such a source equi-matches nothing,
    * so the caller can skip the probe scan outright. */
  private def sourceKeyRange(src: DataFrame,
      keys: Seq[String]): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit, max, min}
    val aggs = keys.flatMap(k =>
      Seq(min(col(k)).as(s"_lo_$k"), max(col(k)).as(s"_hi_$k")))
    val r = src.agg(aggs.head, aggs.tail: _*).head()
    if (keys.indices.exists(i => r.isNullAt(2 * i))) None
    else Some(keys.zipWithIndex.map { case (k, i) =>
      col(k) >= lit(r.get(2 * i)) && col(k) <= lit(r.get(2 * i + 1))
    }.reduce(_ && _))
  }

  /** Execute a general MERGE with the same touched-file economics as
    * [[runMerge]]: probe which files hold a live matched key (skipped
    * entirely when no WHEN MATCHED clause exists — an insert-only MERGE
    * touches nothing), rewrite only those files' live rows through the
    * clause cascade, carry everything else by name. Row algebra is
    * Delta's:
    *
    *  - each matched (target, source) pair takes the FIRST matched
    *    clause whose condition holds — implemented as one clause-index
    *    column (`when(c1, 1).when(c2, 2)... else 0`) driving a per-column
    *    CASE cascade; index 0 (no clause) keeps the target row verbatim,
    *    delete-clause indices filter the row out;
    *  - unmatched target rows in touched files rewrite unchanged;
    *  - each unmatched SOURCE row takes the first NOT MATCHED clause
    *    whose condition holds (none → dropped); explicit INSERT column
    *    lists null-fill unnamed target columns, and every value casts to
    *    the target column's type (Delta's implicit cast-on-write).
    *
    * Unmatched-source detection anti-joins the source against the FULL
    * live key set (column-pruned scan) — a key matched only by
    * DV-deleted rows legitimately inserts. Delta's cardinality rule is
    * enforced whenever a matched clause could apply (skipped for the
    * pure unconditional-DELETE form): duplicate source keys fail loudly
    * BEFORE any write.
    */
  private def runMergeGeneral(spark: SparkSession, tgt: String, tA: String,
      src: String, sA: String, keys: Seq[String],
      matched: Seq[MatchedClause], notMatched: Seq[NotMatchedClause]): Long = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.{col, count, expr, lit, when}
    val sc = graft.storage.SnapshotCommit
    val dv = graft.storage.DeletionVectors
    val IdxCol = "_graft_clause"
    sc.register(spark, tgt)
    // Materialize a NON-DETERMINISTIC source once per statement — the
    // source feeds the dup-check, the probe and the rewrite as SEPARATE
    // jobs, and one that evaluates differently between them (rand()-
    // derived views, sampled inputs) could disagree with its own key
    // set: a key probed but absent from the rewrite silently drops the
    // target row it displaced from the carried files. Deterministic
    // sources (the common case) skip the persist — the same conditional
    // the Pipeline incremental arm applies (Delta's materializeSource).
    val srcDf0 = spark.table(src)
    val mustPin = graft.pipeline.Pipeline.nonDeterministic(srcDf0)
    val srcDf = if (mustPin) srcDf0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else srcDf0
    try {
    keys.foreach(k => require(
      srcDf.columns.exists(_.equalsIgnoreCase(k)),
      s"MERGE source $src has no key column $k"))
    val needDupCheck = matched.exists(c =>
      c.cond.isDefined || c.action != DeleteRow)
    if (needDupCheck) {
      val dup = srcDf.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).limit(1).count()
      require(dup == 0,
        s"MERGE source $src has duplicate keys on ${keys.mkString(",")} — " +
          "updates would be nondeterministic (Delta's multiple-matches " +
          "error)")
    }
    sc.commit(spark, tgt, operation = "MERGE") { dir =>
      // All phases derive inside the staging closure — a lost claim
      // rebases onto the winner's rows (see runMerge).
      val stage = new org.apache.hadoop.fs.Path(dir)
      val cur = sc.currentLocation(spark, tgt).getOrElse(
        sys.error(s"MERGE target $tgt has no published version"))
      val allFiles = sc.listData(spark, cur)
      val rawSchema = sc.readData(spark, tgt).schema
      keys.foreach(k => require(
        rawSchema.fieldNames.exists(_.equalsIgnoreCase(k)),
        s"MERGE target $tgt has no key column $k"))
      val srcKeys = srcDf.select(keys.map(col): _*).distinct()
      // Probe — only when a matched clause can change a target row.
      // Pre-restricted to the source keys' per-column [min, max] (the
      // runMerge source-stats pruning, one conjunct per key) when the
      // target carries a stats sidecar; stats-less targets skip the
      // range agg (it could prune nothing there).
      lazy val rangeOpt = // lazy: an insert-only MERGE never probes
        if (graft.storage.StatsSkipping.loadStats(spark, cur)
            .exists(_.nonEmpty)) sourceKeyRange(srcDf, keys)
        else Some(lit(true))
      val touched: Set[String] =
        if (matched.isEmpty) Set.empty
        else rangeOpt match {
          case None => Set.empty
          case Some(rangePred) =>
            dv.readWithProvenance(spark, tgt, "_graft_file")
              .filter(rangePred)
              .select(keys.map(col) :+ col("_graft_file"): _*)
              .join(srcKeys, keys, "left_semi")
              .select("_graft_file").distinct()
              .collect().map(_.getString(0)).toSet
        }
      val touchedPhys = allFiles.collect {
        case (n, p) if touched(n) => p.toString }
      val touchedLive =
        if (touchedPhys.isEmpty) sc.readData(spark, tgt).limit(0)
        else dv.mask(spark, tgt, spark.read.schema(rawSchema)
          .parquet(touchedPhys: _*))
      def clauseIndex(conds: Seq[Option[String]]): Column = {
        var idx: Column = lit(0)
        for (i <- conds.indices.reverse)
          idx = when(conds(i).map(expr).getOrElse(lit(true)), lit(i + 1))
            .otherwise(idx)
        idx
      }
      // Matched pairs through the clause cascade — the joined frame and
      // delete-clause indices are hoisted so the change-data-feed arm
      // below can derive its images from the SAME construction.
      val deleteIdx = matched.zipWithIndex.collect {
        case (MatchedClause(_, DeleteRow), i) => i + 1 }
      // The post-cascade value of column `f` for a matched pair.
      def cascadeCol(f: org.apache.spark.sql.types.StructField): Column = {
        var v: Column = col(s"$tA.${f.name}").cast(f.dataType)
        for ((cl, i) <- matched.zipWithIndex) cl.action match {
          case UpdateAll =>
            v = when(col(IdxCol) === i + 1,
              col(s"$sA.${f.name}").cast(f.dataType)).otherwise(v)
          case UpdateSet(sets) =>
            sets.find(_._1.equalsIgnoreCase(f.name)).foreach {
              case (_, e) => v = when(col(IdxCol) === i + 1,
                expr(e).cast(f.dataType)).otherwise(v)
            }
          case DeleteRow => ()
        }
        v.as(f.name)
      }
      val withIdxOpt: Option[org.apache.spark.sql.DataFrame] =
        if (matched.isEmpty) None
        else {
          val t = touchedLive.alias(tA)
          val s = srcDf.alias(sA)
          val keyCond = keys.map(k =>
            col(s"$tA.$k") === col(s"$sA.$k")).reduce(_ && _)
          Some(t.join(s, keyCond, "inner")
            .withColumn(IdxCol, clauseIndex(matched.map(_.cond))))
        }
      val matchedOut: org.apache.spark.sql.DataFrame = withIdxOpt match {
        case None => touchedLive.limit(0)
        case Some(withIdx) =>
          val survivors =
            if (deleteIdx.isEmpty) withIdx
            else withIdx.filter(
              !col(IdxCol).isin(deleteIdx.map(Int.box): _*))
          survivors.select(rawSchema.fields.toSeq.map(cascadeCol): _*)
      }
      // Unmatched target rows of touched files rewrite unchanged.
      val keptTarget = touchedLive.join(srcKeys, keys, "left_anti")
      // Unmatched SOURCE rows. When the probe ran, the touched subset
      // contains EVERY live matched key by construction (a matched
      // key's rows make their file touched) — so the anti-join needs
      // only the touched files' keys, not a second full-table key
      // scan; an insert-only MERGE (no probe) pays the full live-key
      // scan, its only target read.
      val insertOut: org.apache.spark.sql.DataFrame = if (notMatched.isEmpty)
        touchedLive.limit(0)
      else {
        val liveKeys =
          (if (matched.nonEmpty) touchedLive
           else dv.read(spark, tgt))
            .select(keys.map(col): _*).distinct()
        val unmatched = srcDf.alias(sA).join(liveKeys, keys, "left_anti")
          .withColumn(IdxCol, clauseIndex(notMatched.map(_.cond)))
          .filter(col(IdxCol) > 0)
        unmatched.select(rawSchema.fields.toSeq.map { f =>
          var v: Column = lit(null).cast(f.dataType)
          for ((cl, i) <- notMatched.zipWithIndex) {
            val e: Option[Column] = cl.action match {
              case InsertAll => Some(col(s"$sA.${f.name}"))
              case InsertCols(cols, vals) =>
                val j = cols.indexWhere(_.equalsIgnoreCase(f.name))
                if (j >= 0) Some(expr(vals(j))) else None
            }
            e.foreach(c => v = when(col(IdxCol) === i + 1,
              c.cast(f.dataType)).otherwise(v))
          }
          v.as(f.name)
        }: _*)
      }
      val mergeOut = matchedOut.unionByName(keptTarget)
        .unionByName(insertOut)
      enforceConstraints(spark, tgt, mergeOut, "MERGE INTO")
      mergeOut.write.parquet(dir)
      allFiles.foreach { case (n, p) =>
        if (!touched(n))
          sc.carry(spark, p, new org.apache.hadoop.fs.Path(stage, n))
      }
      // MERGE consumes a change version; with delta.enableChangeDataFeed
      // its row images record at DML time (Delta's _change_data), and
      // WITHOUT the property the feed fails LOUDLY on a range covering
      // it instead of silently omitting the merge's changes
      // (changesBetween's _op dispatch).
      val v = dv.stampVersion(spark, tgt, stage, op = "MERGE",
        added = Nil, dropped = touched)
      if (dv.cdfEnabled(spark, tgt)) {
        import org.apache.spark.sql.functions.{array, explode, struct}
        val matchedImgs = withIdxOpt.map { withIdx =>
          val changed = withIdx.filter(col(IdxCol) > 0)
          val isDel =
            if (deleteIdx.isEmpty) lit(false)
            else col(IdxCol).isin(deleteIdx.map(Int.box): _*)
          val pre = struct((rawSchema.fields.toSeq.map(f =>
            col(s"$tA.${f.name}").cast(f.dataType).as(f.name)) :+
            when(isDel, lit("delete"))
              .otherwise(lit("update_preimage")).as("change_type")): _*)
          val post = struct((rawSchema.fields.toSeq.map(cascadeCol) :+
            lit("update_postimage").as("change_type")): _*)
          // A delete emits its pre-image only; an update both images —
          // one pass over the matched pairs.
          changed.select(explode(when(isDel, array(pre))
            .otherwise(array(pre, post))).as("_img"))
            .select(col("_img.*"))
        }
        val insertImgs =
          if (notMatched.isEmpty) None
          else Some(insertOut.withColumn("change_type", lit("insert")))
        (matchedImgs.toSeq ++ insertImgs.toSeq)
          .reduceOption(_.unionByName(_))
          .foreach(img => dv.recordImages(spark, tgt, v,
            img.withColumn("commit_version", lit(v))))
      }
      graft.storage.StatsSkipping.refreshStats(spark, cur, stage)
      sc.carryBatchId(spark, cur, stage)
    }
    } finally if (mustPin) srcDf.unpersist(false)
    dv.realign(spark, tgt)
    sc.register(spark, tgt)
      .getOrElse(sys.error(s"MERGE into $tgt left no published version"))
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
    // Conditional source materialization — see runMergeGeneral: the
    // source feeds the dup-check, the probe and the rewrite as separate
    // jobs, so a non-deterministic one must evaluate once.
    val srcDf0 = spark.table(src)
    val mustPin = graft.pipeline.Pipeline.nonDeterministic(srcDf0)
    val srcDf = if (mustPin) srcDf0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else srcDf0
    try {
    require(srcDf.columns.contains(key),
      s"MERGE source $src has no column $key")
    if (!delete) {
      val dup = srcDf.groupBy(col(key)).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).limit(1).count()
      require(dup == 0,
        s"MERGE source $src has duplicate keys on $key — UPDATE SET * " +
          "would be nondeterministic (Delta's multiple-matches error)")
    }
    sc.commit(spark, tgt, operation = "MERGE") { dir =>
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
        enforceConstraints(spark, tgt, aligned, "MERGE INTO")
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
        // Phase 1 — probe: which files hold a LIVE matched key. The
        // semi-join carries no literal bounds StatsSkippingRule could
        // prune with, so when the target HAS a stats sidecar the probe
        // scan is pre-restricted to the SOURCE KEYS' [min, max] —
        // Delta's source-stats file pruning: one tiny agg on the source
        // buys a range that pushdown lands on the scan, where the
        // sidecar prunes to the intersecting files (StorageSpec pins
        // the file count). Semantically redundant (the semi-join
        // already implies it) — pure IO; a stats-less target skips the
        // agg outright (the range could prune nothing there, and the
        // extra job per statement is real cost in per-micro-batch
        // MERGE loops — st22's shape). Null keys never equi-match; an
        // all-null/empty source matches nothing and skips the probe
        // scan entirely.
        val statsPresent = graft.storage.StatsSkipping
          .loadStats(spark, cur).exists(_.nonEmpty)
        val range =
          if (statsPresent) sourceKeyRange(srcDf, Seq(key))
          else Some(lit(true))
        val touched: Set[String] =
          range match {
            case None => Set.empty
            case Some(rangePred) => dv
              .readWithProvenance(spark, tgt, "_graft_file")
              .filter(rangePred)
              .select(col(key), col("_graft_file"))
              .join(srcKeys, Seq(key), "left_semi")
              .select("_graft_file").distinct()
              .collect().map(_.getString(0)).toSet
          }
        // Phase 2 — rewrite ONLY the touched files' live rows.
        val rawSchema = sc.readData(spark, tgt).schema
        val touchedPhys = allFiles.collect {
          case (n, p) if touched(n) => p.toString }
        val touchedLive =
          if (touchedPhys.isEmpty) sc.readData(spark, tgt).limit(0)
          else dv.mask(spark, tgt, spark.read.schema(rawSchema)
            .parquet(touchedPhys: _*))
        // def, not val: the DELETE form's source may legitimately carry
        // only the key column, and this select must not analyze there.
        def aligned = srcDf.select(rawSchema.fieldNames.toSeq.map(col): _*)
        val merged =
          if (delete)
            touchedLive.join(srcKeys, Seq(key), "left_anti")
          else
            touchedLive.join(srcKeys, Seq(key), "left_anti")
              .unionByName(aligned)
        enforceConstraints(spark, tgt, merged, "MERGE INTO")
        merged.write.parquet(dir)
        // Phase 3 — carry the untouched files by name (no data IO) plus
        // the DV / stats / stream-progress sidecars.
        allFiles.foreach { case (n, p) =>
          if (!touched(n))
            sc.carry(spark, p, new org.apache.hadoop.fs.Path(stage, n))
        }
        // Same feed contract as the general form above: images with
        // delta.enableChangeDataFeed, loud failure without.
        val v = dv.stampVersion(spark, tgt, stage, op = "MERGE",
          added = Nil, dropped = touched)
        if (dv.cdfEnabled(spark, tgt)) {
          import org.apache.spark.sql.functions.lit
          val img =
            if (delete)
              // MATCHED DELETE: the removed rows' pre-images.
              touchedLive.join(srcKeys, Seq(key), "left_semi")
                .withColumn("change_type", lit("delete"))
            else {
              // Upsert: every live matched key lives in the touched
              // subset by construction, so its distinct keys split the
              // source into updates (pre from the target, post from the
              // source) and inserts.
              val liveKeys = touchedLive.select(col(key)).distinct()
              touchedLive.join(srcKeys, Seq(key), "left_semi")
                .withColumn("change_type", lit("update_preimage"))
                .unionByName(aligned
                  .join(liveKeys, Seq(key), "left_semi")
                  .withColumn("change_type", lit("update_postimage")))
                .unionByName(aligned
                  .join(liveKeys, Seq(key), "left_anti")
                  .withColumn("change_type", lit("insert")))
            }
          dv.recordImages(spark, tgt, v,
            img.withColumn("commit_version", lit(v)))
        }
        graft.storage.StatsSkipping.refreshStats(spark, cur, stage)
        sc.carryBatchId(spark, cur, stage)
      }
    }
    } finally if (mustPin) srcDf.unpersist(false)
    dv.realign(spark, tgt) // re-point (or drop) the <tgt>__dv table
    sc.register(spark, tgt)
      .getOrElse(sys.error(s"MERGE into $tgt left no published version"))
  }

  /** Execute `UPDATE t SET c = e, ... [WHERE pred]` as a TOUCHED-FILE
    * rewrite commit (Delta's UPDATE shape): probe which files hold a
    * LIVE row matching the predicate, rewrite only those files' live
    * rows (matching rows take the assignments, each cast to its
    * column's type; non-matching rows pass through verbatim), carry
    * every untouched file plus the `_dv`/`_stats`/`_batchid` sidecars
    * by name. Write IO ∝ files holding matched rows; no WHERE updates
    * everything (a full rewrite, by definition). Assignments may
    * reference the row's own columns (`SET v = v + 1`). All phases
    * derive inside the staging closure — a lost optimistic claim
    * rebases onto the winner's rows, like MERGE.
    */
  private def runUpdate(spark: SparkSession, tbl: String,
      sets: Seq[(String, String)], predText: Option[String]): Long = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.{col, expr, lit, when}
    val sc = graft.storage.SnapshotCommit
    val dv = graft.storage.DeletionVectors
    sc.register(spark, tbl)
    sc.commit(spark, tbl, operation = "UPDATE") { dir =>
      val stage = new org.apache.hadoop.fs.Path(dir)
      val cur = sc.currentLocation(spark, tbl).getOrElse(
        sys.error(s"UPDATE target $tbl has no published version"))
      val allFiles = sc.listData(spark, cur)
      val rawSchema = sc.readData(spark, tbl).schema
      sets.foreach { case (c, _) =>
        require(rawSchema.fieldNames.exists(_.equalsIgnoreCase(c)),
          s"UPDATE target $tbl has no column $c") }
      def pred: Column = predText.map(expr).getOrElse(lit(true))
      val probe = dv.readWithProvenance(spark, tbl, "_graft_file")
        .filter(pred)
      // The predicate evaluates in TWO jobs (file probe, then the
      // per-row rewrite inside touched files): a non-deterministic one
      // could match rows in files the probe never selected — a silent
      // lost update. Fail loudly instead (Delta rejects these too).
      require(!graft.pipeline.Pipeline.nonDeterministic(probe.toDF()),
        s"UPDATE $tbl: WHERE predicate must be deterministic " +
          "(rand()/sampled subqueries evaluate differently between the " +
          "file probe and the rewrite)")
      val touched: Set[String] = probe
        .select("_graft_file").distinct()
        .collect().map(_.getString(0)).toSet
      val touchedPhys = allFiles.collect {
        case (n, p) if touched(n) => p.toString }
      val touchedLive =
        if (touchedPhys.isEmpty) sc.readData(spark, tbl).limit(0)
        else dv.mask(spark, tbl, spark.read.schema(rawSchema)
          .parquet(touchedPhys: _*))
      val updated = touchedLive.select(rawSchema.fields.toSeq.map { f =>
        sets.find(_._1.equalsIgnoreCase(f.name)) match {
          case Some((_, e)) =>
            when(pred, expr(e).cast(f.dataType))
              .otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }: _*)
      enforceConstraints(spark, tbl, updated, "UPDATE")
      updated.write.parquet(dir)
      allFiles.foreach { case (n, p) =>
        if (!touched(n))
          sc.carry(spark, p, new org.apache.hadoop.fs.Path(stage, n))
      }
      val v = dv.stampVersion(spark, tbl, stage, op = "UPDATE",
        added = Nil, dropped = touched)
      // Record the pre/post images (Delta's _change_data) when the
      // table opted in via delta.enableChangeDataFeed — Delta's gate,
      // and the recording's extra bounded scan of the touched files is
      // paid only by tables that asked for a feed. Derived in ONE scan
      // (each matched row explodes into its pre and post image — a
      // union would read the touched files twice).
      if (dv.cdfEnabled(spark, tbl)) {
        import org.apache.spark.sql.functions.{array, explode, lit, struct}
        def image(tag: String, applySets: Boolean) = struct(
          (rawSchema.fields.toSeq.map { f =>
            sets.find(_._1.equalsIgnoreCase(f.name)) match {
              case Some((_, e)) if applySets =>
                expr(e).cast(f.dataType).as(f.name)
              case _ => col(f.name).cast(f.dataType).as(f.name)
            }
          } :+ lit(tag).as("change_type")): _*)
        dv.recordImages(spark, tbl, v, touchedLive.filter(pred)
          .select(explode(array(image("update_preimage", false),
            image("update_postimage", true))).as("_img"))
          .select(col("_img.*"))
          .withColumn("commit_version", lit(v)))
      }
      graft.storage.StatsSkipping.refreshStats(spark, cur, stage)
      sc.carryBatchId(spark, cur, stage)
    }
    dv.realign(spark, tbl)
    sc.register(spark, tbl)
      .getOrElse(sys.error(s"UPDATE of $tbl left no published version"))
  }

  /** Execute `ALTER TABLE t ADD COLUMNS (...)` — schema evolution on
    * the versioned surface (the most common ALTER after SET
    * TBLPROPERTIES). The widened column set is METADATA: one commit
    * carries every data file by name (no data IO — pre-widening files
    * null-fill the new columns on read, standard parquet evolution),
    * stamps the change axis (`_op:ALTER` — table_changes skips it, it
    * moves no rows), and records the widened DDL in the schema ledger
    * (`graft.schema.v<version>` in the root `_properties` sidecar; the
    * first ALTER also records `v0` = the original schema, so `VERSION
    * AS OF` below the alter serves the OLD column set — Delta's
    * time-travel schema semantics). Narrowing/renaming is rejected:
    * only additive evolution keeps every historical file readable.
    * A plain (non-versioned) catalog table delegates to Spark's own
    * AlterTableAddColumnsCommand; returns the published version, or -1
    * for the delegated path.
    */
  private def runAddColumns(spark: SparkSession, tbl: String,
      colsDdl: String): Long = {
    import org.apache.spark.sql.types.StructType
    val sc = graft.storage.SnapshotCommit
    val dv = graft.storage.DeletionVectors
    val newCols = StructType.fromDDL(colsDdl)
    require(newCols.nonEmpty, s"ADD COLUMNS $tbl: no columns parsed " +
      s"from ($colsDdl)")
    if (sc.currentVersion(spark, tbl).isEmpty) {
      // Plain catalog table: Spark's own ALTER (native parquet schema
      // evolution). Through the command, never spark.sql — an injected
      // session would recurse into this parser.
      org.apache.spark.sql.execution.command.AlterTableAddColumnsCommand(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl),
        newCols.fields.toSeq).run(spark)
      return -1L
    }
    sc.register(spark, tbl)
    val old = sc.readData(spark, tbl).schema
    newCols.fieldNames.foreach(c => require(
      !old.fieldNames.exists(_.equalsIgnoreCase(c)),
      s"ADD COLUMNS $tbl: column $c already exists"))
    val widened = StructType((old.fields ++ newCols.fields).toSeq)
    var stamped = -1L
    sc.commit(spark, tbl, operation = "ADD COLUMNS") { dir =>
      val stage = new org.apache.hadoop.fs.Path(dir)
      val cur = sc.currentLocation(spark, tbl).getOrElse(
        sys.error(s"ADD COLUMNS target $tbl has no published version"))
      sc.carryData(spark, cur, stage)
      graft.storage.StatsSkipping.refreshStats(spark, cur, stage)
      sc.carryBatchId(spark, cur, stage)
      stamped = dv.stampVersion(spark, tbl, stage, op = "ALTER",
        added = Nil)
    }
    val ledger = sc.schemaVersions(spark, tbl)
    sc.setProperties(spark, tbl,
      Map(s"${sc.SchemaPropPrefix}$stamped" -> widened.toDDL) ++
        (if (ledger.isEmpty)
          Map(s"${sc.SchemaPropPrefix}0" -> old.toDDL)
        else Map.empty))
    dv.realign(spark, tbl)
    // The commit's own registration re-declared the catalog BEFORE the
    // ledger existed (footers still say the old columns) — re-declare
    // explicitly now; other sessions pick the ledger up through
    // pointAt's moved-location repair on their next register.
    if (spark.sessionState.catalog.getTempView(tbl).isEmpty &&
        spark.catalog.tableExists(tbl)) {
      val id = org.apache.spark.sql.catalyst.TableIdentifier(tbl)
      spark.sessionState.catalog.alterTableDataSchema(id, widened)
      spark.sql(s"REFRESH TABLE $tbl")
    } else if (spark.sessionState.catalog.getTempView(tbl).isDefined) {
      // Manifest-mode registration: the view the commit re-created
      // predates the ledger — rebuild it under the widened schema.
      val paths = sc.dataFiles(spark, tbl).map(_._2.toString)
      if (paths.nonEmpty)
        spark.read.schema(widened).parquet(paths: _*)
          .createOrReplaceTempView(tbl)
    }
    sc.register(spark, tbl)
    stamped
  }

  /** Execute `ALTER TABLE t DROP COLUMN(S) ...` — LOGICAL removal
    * through the schema ledger, Delta's drop-column shape: one
    * metadata-only commit carries every data file by name (the files
    * keep the column's bytes — no rewrite, which is the whole point at
    * 100 TB), stamps the change axis (`_op:ALTER`, moves no rows), and
    * records the narrowed DDL in the ledger. Live reads project the
    * narrowed column set; `VERSION AS OF` below the alter still serves
    * the dropped column FROM the carried files (readDataAs reads the
    * effective historical schema by name). Guards: the column must
    * exist, at least one column must remain, and a column referenced
    * by a CHECK constraint cannot be dropped (Delta's rule — drop the
    * constraint first). Versioned tables only: a plain catalog parquet
    * table cannot serve a narrowed projection without the ledger, so
    * the statement requires the snapshot surface (CONVERT first).
    */
  private def runDropColumns(spark: SparkSession, tbl: String,
      cols: Seq[String]): Long = {
    import org.apache.spark.sql.types.StructType
    val sc = graft.storage.SnapshotCommit
    val dv = graft.storage.DeletionVectors
    require(cols.nonEmpty, s"DROP COLUMNS $tbl: no columns named")
    require(sc.currentVersion(spark, tbl).isDefined,
      s"ALTER TABLE $tbl DROP COLUMN: not a versioned table — " +
        "CONVERT TO DELTA first (a plain parquet table cannot serve " +
        "a logically-narrowed schema)")
    sc.register(spark, tbl)
    val old = sc.readData(spark, tbl).schema
    cols.foreach(c => require(
      old.fieldNames.exists(_.equalsIgnoreCase(c)),
      s"DROP COLUMNS $tbl: no column $c"))
    val dropped = cols.map(_.toLowerCase).toSet
    val narrowed = StructType(old.fields.toSeq.filterNot(f =>
      dropped(f.name.toLowerCase)))
    require(narrowed.nonEmpty,
      s"DROP COLUMNS $tbl: cannot drop every column")
    constraintsOf(spark, tbl).foreach { case (name, cond) =>
      val lc = cond.toLowerCase
      cols.foreach(c => require(
        !lc.matches(s"(?s).*\\b${java.util.regex.Pattern
          .quote(c.toLowerCase)}\\b.*"),
        s"DROP COLUMNS $tbl: column $c is referenced by CHECK " +
          s"constraint $name ($cond) — DROP CONSTRAINT first"))
    }
    var stamped = -1L
    sc.commit(spark, tbl, operation = "DROP COLUMNS") { dir =>
      val stage = new org.apache.hadoop.fs.Path(dir)
      val cur = sc.currentLocation(spark, tbl).getOrElse(
        sys.error(s"DROP COLUMNS target $tbl has no published version"))
      sc.carryData(spark, cur, stage)
      graft.storage.StatsSkipping.refreshStats(spark, cur, stage)
      sc.carryBatchId(spark, cur, stage)
      stamped = dv.stampVersion(spark, tbl, stage, op = "ALTER",
        added = Nil)
    }
    val ledger = sc.schemaVersions(spark, tbl)
    sc.setProperties(spark, tbl,
      Map(s"${sc.SchemaPropPrefix}$stamped" -> narrowed.toDDL) ++
        (if (ledger.isEmpty)
          Map(s"${sc.SchemaPropPrefix}0" -> old.toDDL)
        else Map.empty))
    dv.realign(spark, tbl)
    // Re-declare under the narrowed schema (the commit's registration
    // predates the ledger entry) — the ADD COLUMNS pattern, except
    // alterTableDataSchema REFUSES dropped columns, so narrow via the
    // drop+recreate re-declare pointAt's narrowing arm uses (same
    // metadata and location — the table's identity continues).
    if (spark.sessionState.catalog.getTempView(tbl).isEmpty &&
        spark.catalog.tableExists(tbl)) {
      val id = org.apache.spark.sql.catalyst.TableIdentifier(tbl)
      val cat0 = spark.sessionState.catalog.getTableMetadata(id)
      // The entry must be EXTERNAL before the drop: dropping a MANAGED
      // table DELETES its location — which by now is the live version
      // directory (a saveAsTable-then-CONVERT table stays MANAGED
      // through pointAt's ALTER SET LOCATION). Every snapshot table's
      // data lifecycle belongs to the commit protocol, not the
      // catalog, so EXTERNAL is also simply the truthful type.
      val cat = cat0.copy(schema = narrowed,
        tableType =
          org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL)
      if (cat0.tableType !=
          org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL)
        spark.sessionState.catalog.alterTable(
          cat0.copy(tableType = org.apache.spark.sql.catalyst.catalog
            .CatalogTableType.EXTERNAL))
      spark.sessionState.catalog.dropTable(id,
        ignoreIfNotExists = true, purge = false)
      spark.sessionState.catalog.createTable(cat, ignoreIfExists = true)
      spark.sql(s"REFRESH TABLE $tbl")
    } else if (spark.sessionState.catalog.getTempView(tbl).isDefined) {
      val paths = sc.dataFiles(spark, tbl).map(_._2.toString)
      if (paths.nonEmpty)
        spark.read.schema(narrowed).parquet(paths: _*)
          .createOrReplaceTempView(tbl)
    }
    sc.register(spark, tbl)
    stamped
  }

  /** Execute `CREATE [OR REPLACE] TABLE t AS <query>` as a snapshot
    * commit — the statement that previously fell through to Spark's
    * plain `saveAsTable` and bypassed the commit protocol entirely (no
    * version chain, no stats, no time travel). Here every CTAS'd table
    * is a versioned table out of the box: the query's output commits as
    * the next version through [[graft.storage.StatsSkipping
    * .commitWithStats]] with per-file stats on EVERY output column
    * (Delta records stats on its leading columns at write; the sidecar
    * encoder simply skips types it cannot stat), so DESCRIBE HISTORY,
    * VERSION AS OF and default-path skipping work immediately.
    * Plain CREATE fails on an existing table (Delta's TABLE_OR_VIEW_
    * ALREADY_EXISTS); OR REPLACE commits a full-overwrite version —
    * history survives, the deletion-vector sidecar does not carry (its
    * coordinates name the replaced files).
    */
  private def runCtas(spark: SparkSession, tbl: String, query: String,
      replace: Boolean): Long = {
    val sc = graft.storage.SnapshotCommit
    val existing = sc.register(spark, tbl)
    require(replace || (existing.isEmpty && !spark.catalog.tableExists(tbl)),
      s"CREATE TABLE $tbl: table already exists " +
        "(use CREATE OR REPLACE TABLE to commit a replacing version)")
    val df = spark.sql(query)
    require(!df.isStreaming, s"CTAS $tbl cannot run a streaming query")
    val statsCols = df.schema.fieldNames.toSeq
    val op =
      if (replace && existing.isDefined) "REPLACE TABLE AS SELECT"
      else "CREATE TABLE AS SELECT"
    graft.storage.StatsSkipping.commitWithStats(spark, tbl, statsCols,
      operation = op) { stage =>
      df.write.mode("overwrite").parquet(stage)
      // A REPLACE moves no stream progress: shed the _batchid marker
      // here and the sink's next crash-replay re-appends an already-
      // committed batch (the carryBatchId contract — INSERT OVERWRITE
      // carries it for the same reason).
      sc.currentLocation(spark, tbl).foreach(prev =>
        sc.carryBatchId(spark, prev, new org.apache.hadoop.fs.Path(stage)))
    }
    graft.storage.DeletionVectors.realign(spark, tbl) // replace drops _dv
    if (replace) { // the change axis, schema ledger and constraints
      // reset with it (REPLACE is a new table definition — Delta
      // drops CHECK constraints there, unlike INSERT OVERWRITE which
      // keeps and enforces them)
      graft.storage.DeletionVectors.pruneImages(spark, tbl, Long.MaxValue)
      sc.removeProperties(spark, tbl, k =>
        k.startsWith(sc.SchemaPropPrefix) ||
          k.startsWith(ConstraintPropPrefix))
    }
    sc.register(spark, tbl)
      .getOrElse(sys.error(s"CTAS of $tbl left no published version"))
  }

  /** The INSERT command wrapper: versioned path when the target is (or
    * can become) snapshot-managed, Spark's own insertInto otherwise. */
  private def insertCommand(tbl: String, query: String,
      cols: Option[Seq[String]], overwrite: Boolean = false)
      : GraftMaintenanceCommand = {
    val op = if (overwrite) "INSERT OVERWRITE" else "INSERT"
    GraftMaintenanceCommand(s"$op $tbl", { spark =>
      val v = runInsert(spark, tbl, query, overwrite, cols)
      Seq("table" -> tbl, "operation" -> op,
        (if (v >= 0) "version" -> v.toString
         else "mode" -> "delegated (plain catalog table)"))
    })
  }

  /** Delta's CHECK-constraint property namespace (the literal key
    * format Delta records: `delta.constraints.<name>` = expr). */
  private[graft] val ConstraintPropPrefix = "delta.constraints."

  /** The liquid-clustering declaration (Delta's `clusteringColumns`
    * vocabulary): comma-separated columns a plain OPTIMIZE
    * re-clusters by. */
  private[graft] val ClusteringColsProp = "clusteringColumns"

  /** The table's recorded CHECK constraints, name -> expression. One
    * sidecar-file read; tables without a `_properties` sidecar pay a
    * single existence probe. */
  private def constraintsOf(spark: SparkSession,
      tbl: String): Map[String, String] =
    graft.storage.SnapshotCommit.properties(spark, tbl).collect {
      case (k, v) if k.startsWith(ConstraintPropPrefix) =>
        k.drop(ConstraintPropPrefix.length) -> v
    }

  /** Enforce every CHECK constraint on the rows a statement is about
    * to commit — Delta's write-time invariant, surfaced before the
    * staged write so a violation aborts the whole commit and publishes
    * nothing. NULL predicate results PASS (SQL's CHECK rule: violated
    * only when FALSE). Cost: zero for tables with no constraints (one
    * property probe); with constraints, one extra pass over the NEW /
    * rewritten rows per constraint — write-proportional, never
    * table-proportional.
    */
  private def enforceConstraints(spark: SparkSession, tbl: String,
      rows: DataFrame, stmt: String): Unit = {
    val cs = constraintsOf(spark, tbl)
    if (cs.isEmpty) return
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    cs.foreach { case (name, cond) =>
      val bad = rows.filter(not(coalesce(expr(cond).cast("boolean"),
        lit(true)))).limit(1).collect()
      if (bad.nonEmpty) sys.error(
        s"$stmt $tbl: CHECK constraint $name ($cond) violated by " +
          s"row ${bad.mkString} — nothing was committed")
    }
  }

  /** Can `tbl` be adopted into the versioned surface — an existing,
    * non-view, unpartitioned catalog table whose files live in one flat
    * directory ([[graft.storage.DeletionVectors.ensureSnapshot]]'s
    * requirements, probed instead of thrown)? */
  private def canAdopt(spark: SparkSession, tbl: String): Boolean =
    spark.sessionState.catalog.getTempView(tbl).isEmpty &&
      spark.catalog.tableExists(tbl) && scala.util.Try {
        val meta = spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(tbl))
        meta.partitionColumnNames.isEmpty && {
          val files = spark.table(tbl).inputFiles
          files.nonEmpty && files.map(f =>
            new org.apache.hadoop.fs.Path(f).getParent.toUri.getPath)
            .distinct.sizeIs == 1
        }
      }.getOrElse(false)

  /** Execute `CONVERT TO DELTA t [NO STATISTICS]` — the in-place
    * migration statement, metadata-only: version 1 = the table's
    * current files carried by name (hard link / manifest ref, zero
    * data IO), the catalog repointed at the published version, and —
    * unless NO STATISTICS — a per-file min/max `_stats` sidecar built
    * from the parquet FOOTERS on every column (one footer read per
    * file, the cost Delta's own CONVERT pays; never a data scan), so
    * default-path skipping, metadata-only aggregates, time travel and
    * DESCRIBE HISTORY all work from the first post-convert second.
    * Converting an already-versioned table is a NO-OP returning the
    * current version (Delta's rule — CONVERT is idempotent).
    * Partitioned or multi-directory tables fail loudly: hive
    * partition VALUES live in directory names, which a flat file
    * carry would silently lose (the [[graft.storage.DeletionVectors
    * .ensureSnapshot]] contract, surfaced at statement level).
    * Returns (published version, files carried, stats mode).
    */
  private def runConvert(spark: SparkSession, tbl: String,
      withStats: Boolean): (Long, Long, String) = {
    val sc = graft.storage.SnapshotCommit
    sc.register(spark, tbl) match {
      case Some(v) => (v, 0L, "no-op (already a versioned table)")
      case None =>
        require(spark.sessionState.catalog.getTempView(tbl).isEmpty,
          s"CONVERT TO DELTA $tbl: cannot convert a temp view")
        require(spark.catalog.tableExists(tbl),
          s"CONVERT TO DELTA $tbl: table not found")
        val meta = spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(tbl))
        require(meta.tableType !=
            org.apache.spark.sql.catalyst.catalog.CatalogTableType.VIEW,
          s"CONVERT TO DELTA $tbl: cannot convert a view")
        require(meta.partitionColumnNames.isEmpty,
          s"CONVERT TO DELTA $tbl: hive-partitioned tables are not " +
            s"supported (partition columns " +
            s"${meta.partitionColumnNames.mkString(", ")} live in " +
            "directory names a flat file carry would lose)")
        val files0 = spark.table(tbl).inputFiles
        require(files0.nonEmpty,
          s"CONVERT TO DELTA $tbl: table has no files")
        require(files0.map(f => new org.apache.hadoop.fs.Path(f)
            .getParent.toUri.getPath).distinct.sizeIs == 1,
          s"CONVERT TO DELTA $tbl: files span multiple directories " +
            "(partitioned or bucketed-by-path layout); conversion " +
            "carries a single flat directory")
        val nFiles = files0.length.toLong
        // Re-derived per attempt: commit may re-invoke after a lost
        // optimistic claim, and the list must reflect the then-current
        // catalog state.
        def carryAll(stage: String): Unit = {
          val to = new org.apache.hadoop.fs.Path(stage)
          spark.table(tbl).inputFiles.foreach { f =>
            val src = new org.apache.hadoop.fs.Path(
              new org.apache.hadoop.fs.Path(f).toUri.getPath)
            sc.carry(spark, src, new org.apache.hadoop.fs.Path(to,
              src.getName))
          }
        }
        if (withStats)
          graft.storage.StatsSkipping.commitWithStats(spark, tbl,
            spark.table(tbl).schema.fieldNames.toSeq,
            operation = "CONVERT")(carryAll)
        else sc.commit(spark, tbl, operation = "CONVERT")(carryAll)
        (sc.register(spark, tbl).getOrElse(sys.error(
          s"CONVERT TO DELTA $tbl left no published version")),
          nFiles,
          if (withStats) "footer-derived" else "none (NO STATISTICS)")
    }
  }

  /** Execute `INSERT INTO t <query>` as an APPEND commit: the query's
    * rows write as new files, every previous file carries by name (hard
    * link / manifest ref — no data IO), and the `_dv`/`_stats`/
    * `_batchid` sidecars ride along exactly as they do through MERGE —
    * deleted rows stay deleted, skipping keeps pruning, exactly-once
    * sink replay survives. A plain catalog table is ADOPTED into the
    * versioned surface on its first INSERT (version 1 = its files
    * carried, the Delta CONVERT shape) — and when it CANNOT adopt
    * (empty, partitioned, multi-directory, or a view), the statement
    * falls back to Spark's own `insertInto` with the same alignment
    * (review r16: the unconditional adopt broke the plain
    * `CREATE TABLE t (...); INSERT INTO t VALUES ...` flow). Columns
    * align to the target BY POSITION with a cast — SQL INSERT
    * semantics — or by the explicit COLUMN LIST with unnamed target
    * columns null-filled; arity mismatches fail loudly. `overwrite =
    * true` (INSERT OVERWRITE) commits a FULL-REPLACE version instead:
    * nothing carries (the DV sidecar's coordinates name the replaced
    * files, so it is dropped with them), stats recompute for the new
    * files, and history keeps the replaced version readable until
    * prune. Returns the published version, or -1 for the plain-catalog
    * fallback.
    */
  private def runInsert(spark: SparkSession, tbl: String, query: String,
      overwrite: Boolean = false,
      cols: Option[Seq[String]] = None): Long = {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.StructType
    val sc = graft.storage.SnapshotCommit
    val dv = graft.storage.DeletionVectors
    val stmt = if (overwrite) "INSERT OVERWRITE" else "INSERT INTO"
    val src = spark.sql(query)
    require(!src.isStreaming, s"$stmt $tbl cannot run a streaming query")
    def alignTo(target: StructType): DataFrame = cols match {
      case None =>
        require(src.schema.length == target.length,
          s"$stmt $tbl: query produces ${src.schema.length} columns, " +
            s"table has ${target.length}")
        src.toDF(target.fieldNames.toIndexedSeq: _*)
          .select(target.fields.toSeq.map(f =>
            col(f.name).cast(f.dataType).as(f.name)): _*)
      case Some(cs) =>
        require(cs.size == src.schema.length,
          s"$stmt $tbl: column list names ${cs.size} columns, the " +
            s"query produces ${src.schema.length}")
        cs.foreach(c => require(
          target.fieldNames.exists(_.equalsIgnoreCase(c)),
          s"$stmt target $tbl has no column $c"))
        src.toDF(cs.toIndexedSeq: _*).select(target.fields.toSeq.map { f =>
          cs.find(_.equalsIgnoreCase(f.name)) match {
            case Some(c) => col(c).cast(f.dataType).as(f.name)
            case None => lit(null).cast(f.dataType).as(f.name)
          }
        }: _*)
    }
    if (sc.currentVersion(spark, tbl).isEmpty && !canAdopt(spark, tbl)) {
      // Plain-catalog fallback: Spark's own insert (loud on views and
      // missing tables) — the versioned path needs files to adopt.
      // Built through the DataFrame writer, never back through this
      // parser (a spark.sql delegate would recurse on an injected
      // session).
      val aligned = alignTo(spark.table(tbl).schema)
      // Constraints declared before first adoption (the documented
      // pre-adoption properties path) still gate the delegated insert.
      enforceConstraints(spark, tbl, aligned, stmt)
      val w = aligned.write
      (if (overwrite) w.mode("overwrite") else w).insertInto(tbl)
      return -1L
    }
    dv.ensureSnapshot(spark, tbl) // adopt a plain table on first INSERT
    sc.register(spark, tbl)
    sc.commit(spark, tbl,
      operation = if (overwrite) "INSERT OVERWRITE" else "WRITE") { dir =>
      val stage = new org.apache.hadoop.fs.Path(dir)
      // Aligned INSIDE the closure: a rebase re-reads the then-current
      // target schema (a concurrent widening commit could change it).
      val aligned = alignTo(sc.readData(spark, tbl).schema)
      enforceConstraints(spark, tbl, aligned, stmt)
      aligned.write.mode("overwrite").parquet(dir)
      if (overwrite) {
        // Replace semantics: fresh content, fresh stats, progress
        // marker carried (maintenance/replace moves no stream progress).
        // The change axis RESETS with the dropped sidecar (documented
        // divergence: Delta's CDF spans a REPLACE; here the feed
        // restarts at the replaced state), so recorded images go too.
        graft.storage.StatsSkipping.recomputeStats(spark, stage,
          aligned.schema.fieldNames.toSeq)
        sc.currentLocation(spark, tbl).foreach(prev =>
          sc.carryBatchId(spark, prev, stage))
        dv.pruneImages(spark, tbl, Long.MaxValue)
        sc.removeProperties(spark, tbl,
          _.startsWith(sc.SchemaPropPrefix)) // fresh content, fresh schema
      } else {
        // The fresh files are exactly what is in the stage BEFORE the
        // carry; the version stamp's _add: sentinels name them so
        // table_changes can serve this insert.
        val appended = sc.listData(spark, stage).map(_._1)
        sc.currentLocation(spark, tbl).foreach { prev =>
          sc.carryData(spark, prev, stage)
          graft.storage.StatsSkipping.refreshStats(spark, prev, stage)
          sc.carryBatchId(spark, prev, stage)
        }
        dv.stampVersion(spark, tbl, stage, op = "WRITE",
          added = appended)
      }
    }
    dv.realign(spark, tbl)
    sc.register(spark, tbl)
      .getOrElse(sys.error(s"$stmt $tbl left no published version"))
  }

  /** Execute `COPY INTO t FROM '<path>' FILEFORMAT = CSV|JSON|PARQUET`
    * — Databricks' idempotent batch-ingest statement. The source
    * directory's data files (recursive, underscore/dot entries
    * skipped) are diffed against the table's `_copy:` ledger; only
    * NEVER-LOADED files read (CSV/JSON under the target's schema —
    * COPY aligns by name/position to an existing table, Databricks'
    * contract; parquet by name with cast) and commit as one append
    * version (`_op:COPY`, so table_changes serves the load as inserts).
    * Re-running the statement is a NO-OP (zero files, no commit) — the
    * exactly-once discipline the streaming sink's `_batchid` gives
    * micro-batches, generalized to ad-hoc loads. `COPY_OPTIONS
    * ('force'='true')` reloads everything. Returns (version or -1 when
    * nothing loaded, files loaded, rows loaded).
    */
  private def runCopyInto(spark: SparkSession, tbl: String, path: String,
      fmt: String, fmtOpts: Map[String, String],
      copyOpts: Map[String, String]): (Long, Long, Long) = {
    val sc = graft.storage.SnapshotCommit
    val dv = graft.storage.DeletionVectors
    require(sc.currentVersion(spark, tbl).isDefined ||
      spark.catalog.tableExists(tbl),
      s"COPY INTO $tbl: target table does not exist (COPY INTO loads " +
        "into an existing table — CREATE TABLE ... AS first)")
    dv.ensureSnapshot(spark, tbl)
    sc.register(spark, tbl)
    val force = copyOpts.exists { case (k, v2) =>
      k.equalsIgnoreCase("force") && v2.equalsIgnoreCase("true") }
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"COPY INTO $tbl: source path $path " +
      "does not exist")
    def walk(p: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) walk(st.getPath)
        else Seq(st.getPath.toUri.getPath)
      }
    val all = (if (fs.getFileStatus(root).isDirectory) walk(root)
      else Seq(root.toUri.getPath)).sorted
    val loaded = if (force) Set.empty[String]
      else dv.copiedSources(spark, tbl)
    val fresh = all.filterNot(loaded)
    if (fresh.isEmpty) return (-1L, 0L, 0L)
    val target = sc.readData(spark, tbl).schema
    val reader = spark.read.options(fmtOpts)
    val src = fmt match {
      case "CSV" => reader.schema(target).csv(fresh: _*)
      case "JSON" => reader.schema(target).json(fresh: _*)
      case "PARQUET" =>
        val raw = reader.parquet(fresh: _*)
        target.fieldNames.foreach(c => require(
          raw.columns.exists(_.equalsIgnoreCase(c)),
          s"COPY INTO $tbl: source parquet has no column $c"))
        raw.select(target.fields.toSeq.map(f =>
          org.apache.spark.sql.functions.col(f.name)
            .cast(f.dataType).as(f.name)): _*)
      case other => sys.error(
        s"COPY INTO $tbl: FILEFORMAT $other not supported " +
          "(CSV, JSON, PARQUET)")
    }
    var rows = 0L
    sc.commit(spark, tbl, operation = "COPY INTO") { dir =>
      val stage = new org.apache.hadoop.fs.Path(dir)
      enforceConstraints(spark, tbl, src, "COPY INTO")
      src.write.mode("overwrite").parquet(dir)
      val appended = sc.listData(spark, stage).map(_._1)
      rows = spark.read.parquet(
        appended.map(n => new org.apache.hadoop.fs.Path(stage, n)
          .toString): _*).count()
      sc.currentLocation(spark, tbl).foreach { prev =>
        sc.carryData(spark, prev, stage)
        graft.storage.StatsSkipping.refreshStats(spark, prev, stage)
        sc.carryBatchId(spark, prev, stage)
      }
      dv.stampVersion(spark, tbl, stage, op = "COPY",
        added = appended, copied = fresh)
    }
    dv.realign(spark, tbl)
    sc.register(spark, tbl)
    (dv.version(spark, tbl), fresh.size.toLong, rows)
  }

  /** Parse a SQL timestamp string ('yyyy-MM-dd[ HH:mm:ss[.SSS]]') to
    * epoch millis in the SESSION time zone — the zone Spark itself
    * would cast the literal under. */
  private[graft] def parseTsMs(spark: SparkSession, s: String): Long = {
    val zone = java.time.ZoneId.of(spark.conf.get(
      "spark.sql.session.timeZone",
      java.util.TimeZone.getDefault.getID))
    val t = s.trim
    val ldt =
      if (t.matches("\\d{4}-\\d{2}-\\d{2}"))
        java.time.LocalDate.parse(t).atStartOfDay()
      else java.time.LocalDateTime.parse(t.replace(' ', 'T'))
    ldt.atZone(zone).toInstant.toEpochMilli
  }

  /** Resolve `FROM t VERSION AS OF v` / `FROM t TIMESTAMP AS OF ts`
    * (which Spark parses into a
    * [[org.apache.spark.sql.catalyst.analysis.RelationTimeTravel]] node
    * that v1 analysis rejects) against the engine's own time-travel
    * axis: the node rewrites to [[graft.storage.DeletionVectors.readAt]]
    * over the named table — version 0 is the pre-delete state, version
    * v the table as of delete version v (b4's semantics, now reachable
    * as plain SQL). A TIMESTAMP anchor resolves to the latest delete
    * version committed at or before it (Delta's rule) through the
    * sidecar's `_ts:` sentinels
    * ([[graft.storage.DeletionVectors.versionAtTimestamp]] — loud
    * failure before the table's first commit or on a pre-sentinel
    * timeline). `table_changes(t, v1, v2)` — Delta's CDC TVF — rewrites
    * to [[graft.storage.DeletionVectors.changesBetween]]. Non-numeric
    * versions, unparseable timestamps and multipart names delegate to
    * Spark's error path untouched.
    */
  private[graft] def resolveTimeTravel(spark: SparkSession,
      plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel =>
      (tt.relation, tt.timestamp, tt.version) match {
        case (u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation,
            None, Some(v))
          if u.multipartIdentifier.length == 1 &&
            v.forall(_.isDigit) && v.nonEmpty =>
          graft.storage.DeletionVectors
            .readAt(spark, u.multipartIdentifier.head, v.toLong)
            .queryExecution.analyzed
        case (u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation,
            Some(ts), None) if u.multipartIdentifier.length == 1 =>
          import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
          import org.apache.spark.sql.types.{StringType, TimestampType}
          val ms: Option[Long] = ts match {
            case Literal(s, StringType) =>
              scala.util.Try(parseTsMs(spark, s.toString)).toOption
            case Literal(us: Long, TimestampType) => Some(us / 1000L)
            case Cast(Literal(s, StringType), TimestampType, _, _) =>
              scala.util.Try(parseTsMs(spark, s.toString)).toOption
            case _ => None
          }
          ms.map(m => graft.storage.DeletionVectors
            .readAtTimestamp(spark, u.multipartIdentifier.head, m)
            .queryExecution.analyzed).getOrElse(tt)
        case _ => tt
      }
    case tvf: org.apache.spark.sql.catalyst.analysis
        .UnresolvedTableValuedFunction
      if tvf.name.length == 1 &&
        tvf.name.head.equalsIgnoreCase("table_changes") =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      tvf.functionArgs match {
        case Seq(Literal(t, org.apache.spark.sql.types.StringType),
            Literal(v1, _), Literal(v2, _)) =>
          val tbl = t.toString
          (changeBound(spark, tbl, v1.toString, isStart = true),
            changeBound(spark, tbl, v2.toString, isStart = false)) match {
            case (Some(from), Some(to)) =>
              graft.storage.DeletionVectors
                .changesBetween(spark, tbl, from, to)
                .queryExecution.analyzed
            case _ => sys.error(
              "table_changes bounds must each be a version number or " +
                s"a timestamp string; got: ('${v1}', '${v2}')")
          }
        case _ => sys.error(
          "table_changes takes (table-name string, from, to) literals " +
            "— each bound a version number or a timestamp string; " +
            s"got: ${tvf.functionArgs}")
      }
  }

  /** One `table_changes` bound: a digit string is a version number;
    * anything else must parse as a session-zone timestamp and resolves
    * on the change axis — the START bound to the latest version
    * strictly before it ([[graft.storage.DeletionVectors
    * .changeStartAtTimestamp]]'s exclusive-from contract, so versions
    * committed AT the instant are served), the END bound to the latest
    * version at-or-before it (Delta's rule). None = not a bound (the
    * caller's loud-error path); resolution failures on a VALID
    * timestamp (partial timeline, pre-creation, beyond-latest)
    * propagate loudly.
    */
  private def changeBound(spark: SparkSession, tbl: String, s: String,
      isStart: Boolean): Option[Long] =
    if (s.nonEmpty && s.forall(_.isDigit)) Some(s.toLong)
    else scala.util.Try(parseTsMs(spark, s)).toOption.map { ms =>
      if (isStart) graft.storage.DeletionVectors
        .changeStartAtTimestamp(spark, tbl, ms)
      else graft.storage.DeletionVectors
        .versionAtTimestamp(spark, tbl, ms)
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
      case _ =>
        // Time-travel / CDC-TVF phrases on a live session: the injected
        // parser resolves these at plan level; a live session cannot
        // hand Spark a raw plan, so each phrase is bound to a temp view
        // over the engine frame and the query runs with the views in
        // place. Matches inside string literals/comments are left
        // VERBATIM and register no view (ADVICE r15: the raw
        // replaceAllIn silently altered a query that merely CONTAINED
        // the phrase in a literal, and registered temp views as a side
        // effect). Sequential single pass — never recursive, so a
        // literal-only occurrence cannot loop.
        val TtRe =
          s"(?is)\\b(FROM|JOIN)\\s+$Ident\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)".r
        val TsRe = (s"(?is)\\b(FROM|JOIN)\\s+$Ident\\s+TIMESTAMP\\s+AS" +
          "\\s+OF\\s+'([^']+)'").r
        val TvfRe = ("(?is)\\btable_changes\\s*\\(\\s*'" +
          "([A-Za-z_][A-Za-z0-9_]*)'\\s*,\\s*" +
          "(\\d+|'[^']+')\\s*,\\s*(\\d+|'[^']+')\\s*\\)").r
        def verbatim(m: scala.util.matching.Regex.Match) =
          scala.util.matching.Regex.quoteReplacement(m.matched)
        var cur = text
        cur = TtRe.replaceAllIn(cur, m =>
          if (inQuotedOrComment(cur, m.start)) verbatim(m)
          else {
            val (kw, tbl, v) = (m.group(1), m.group(2), m.group(3))
            val view = s"${tbl}_asof_$v"
            graft.storage.DeletionVectors.readAt(spark, tbl, v.toLong)
              .createOrReplaceTempView(view)
            s"$kw $view"
          })
        cur = TsRe.replaceAllIn(cur, m =>
          if (inQuotedOrComment(cur, m.start)) verbatim(m)
          else {
            // Resolution is versionAtTimestamp's latest-version-<=-ts
            // rule (Delta's), against the sidecar's `_ts:` sentinels.
            val (kw, tbl, ts) = (m.group(1), m.group(2), m.group(3))
            val v = graft.storage.DeletionVectors
              .versionAtTimestamp(spark, tbl, parseTsMs(spark, ts))
            val view = s"${tbl}_asof_$v"
            graft.storage.DeletionVectors.readAt(spark, tbl, v)
              .createOrReplaceTempView(view)
            s"$kw $view"
          })
        cur = TvfRe.replaceAllIn(cur, m =>
          if (inQuotedOrComment(cur, m.start)) verbatim(m)
          else {
            val (tbl, a1, a2) = (m.group(1), m.group(2), m.group(3))
            def bound(a: String, isStart: Boolean): Long =
              changeBound(spark, tbl,
                a.stripPrefix("'").stripSuffix("'"), isStart)
                .getOrElse(sys.error(
                  s"table_changes('$tbl', ...): bound $a is neither a " +
                    "version number nor a parseable timestamp"))
            val (v1, v2) =
              (bound(a1, isStart = true), bound(a2, isStart = false))
            val view = s"${tbl}_changes_${v1}_$v2"
            graft.storage.DeletionVectors
              .changesBetween(spark, tbl, v1, v2)
              .createOrReplaceTempView(view)
            view
          })
        spark.sql(cur)
    }
}
