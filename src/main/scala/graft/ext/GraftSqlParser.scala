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
    case _ => None
  }

  /** Run a statement on a LIVE session (whose parser was fixed at
    * build): maintenance statements execute through the same grammar
    * the injected parser uses; anything else falls through to
    * `spark.sql`. */
  def sql(spark: SparkSession, text: String): DataFrame =
    maintenance(text) match {
      case Some(cmd: GraftMaintenanceCommand) =>
        import scala.jdk.CollectionConverters._
        val rows = cmd.run(spark)
        spark.createDataFrame(rows.asJava, StructType(cmd.output.map(a =>
          org.apache.spark.sql.types.StructField(a.name, a.dataType,
            a.nullable))))
      case _ => spark.sql(text)
    }
}
