package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParameterContext}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StructType}

import graft.operators.{DeletionVectors => DV}

/** SQL maintenance statements for graft-dv tables — the operational
  * half of the lakehouse SQL surface (DML and time travel are
  * [[DvDml]]/[[DvTimeTravelRule]]):
  *
  * {{{
  *   VACUUM ev                                -- default retention
  *   VACUUM ev RETAIN 168 HOURS KEEP 3 VERSIONS
  *   OPTIMIZE ev                              -- fold blobs + purge
  * }}}
  *
  * Neither statement exists in Spark's grammar (they are the
  * Delta-shaped operational verbs), so this layer owns a TINY
  * recognizer for exactly these two shapes and routes everything else
  * to the session parser unchanged: [[GraftSqlParser]] wraps the
  * parser for extension-built sessions (`injectParser`, the Delta
  * pattern), and [[graft.GraftSql.sql]] consults the recognizer first
  * for driver-owned ones. The commands resolve their target through
  * the session catalog at RUN time (graft-dv provider check) and fail
  * loudly on anything else — a typo'd table name never
  * silently no-ops.
  *
  * `OPTIMIZE` = [[DV.compactBlobs]] (fold each file's delta blobs)
  * then [[DV.purge]] at the default 25% threshold (rewrite only files
  * past it) — the bounded-write maintenance sweep, never a table
  * rewrite. `VACUUM` maps RETAIN n HOURS → the age grace window and
  * KEEP k VERSIONS → manifest retention.
  */
object DvMaintenanceSql {

  private val VacuumRe =
    """(?is)\s*VACUUM\s+([\w.`]+)(?:\s+RETAIN\s+(\d+)\s+HOURS)?(?:\s+KEEP\s+(\d+)\s+VERSIONS)?\s*;?\s*""".r
  private val OptimizeRe = """(?is)\s*OPTIMIZE\s+([\w.`]+)\s*;?\s*""".r

  /** The two maintenance shapes, or None for anything else. */
  def parse(text: String): Option[LogicalPlan] = text match {
    case VacuumRe(ident, hours, keepV) =>
      Some(DvVacuumCommand(ident, Option(hours).map(_.toLong),
        Option(keepV).map(_.toInt)))
    case OptimizeRe(ident) => Some(DvOptimizeCommand(ident))
    case _ => None
  }

  private[plans] def rootOf(session: SparkSession,
      identText: String): String = {
    val ident = session.sessionState.sqlParser
      .parseMultipartIdentifier(identText)
    DvDml.dvCatalogRoot(session, ident).getOrElse(
      throw new IllegalArgumentException(
        s"$identText is not a graft-dv catalog table — VACUUM/OPTIMIZE " +
          "operate on graft-dv tables only"))
  }
}

/** `VACUUM t [RETAIN n HOURS] [KEEP k VERSIONS]` — reclaim data files
  * referenced by no retained manifest (and dead tombstone dirs),
  * shielding files younger than the retention window.
  */
case class DvVacuumCommand(identText: String, retainHours: Option[Long],
    keepVersions: Option[Int]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("data_files_deleted", LongType, nullable = false)(),
    AttributeReference("tombstone_dirs_deleted", LongType,
      nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val root = DvMaintenanceSql.rootOf(session, identText)
    val (d, b) = DV.vacuum(session, root, keepVersions.getOrElse(1),
      retainHours.map(_ * 3600L * 1000L)
        .getOrElse(DV.DefaultVacuumGraceMs))
    Seq(Row(d, b))
  }
}

/** `OPTIMIZE t` — fold delta blobs, then rewrite files past the
  * deleted-fraction threshold behind one CAS manifest flip.
  */
case class DvOptimizeCommand(identText: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("blob_dirs_compacted", LongType, nullable = false)(),
    AttributeReference("blobs_folded", LongType, nullable = false)(),
    AttributeReference("files_rewritten", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val root = DvMaintenanceSql.rootOf(session, identText)
    val (dirs, inputs) = DV.compactBlobs(session, root)
    val partCols = DV.partitionColsOf(session, root)
    val rewritten =
      if (partCols.isEmpty) 0L
      else DV.purge(session, root, partCols, 0.25, () => ()).size.toLong
    Seq(Row(dirs, inputs, rewritten))
  }
}

/** Session-parser wrapper for extension-built sessions
  * (`injectParser`): recognizes the two maintenance statements,
  * delegates every other surface verbatim.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    DvMaintenanceSql.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(sqlText: String,
      parameters: ParameterContext): LogicalPlan =
    DvMaintenanceSql.parse(sqlText)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, parameters))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(
      sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(
      sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
