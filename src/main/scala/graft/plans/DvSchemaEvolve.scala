package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, MergeIntoTable, SubqueryAlias}
import org.apache.spark.sql.types.StructType

import graft.operators.{DeletionVectors => DV}

/** MERGE schema evolution (the Delta `autoMerge` shape, opt-in via
  * `spark.graft.dv.schema.autoMerge=true`): a `MERGE INTO` whose
  * SOURCE carries columns the target lacks WIDENS the target first —
  * one metadata-only `ADD COLUMNS` manifest flip (nullable; old files
  * null-fill, exactly the append-side evolution rule) — and then the
  * statement resolves normally, so `WHEN NOT MATCHED INSERT *` /
  * `WHEN MATCHED UPDATE SET *` cover the new columns instead of
  * failing analysis.
  *
  * The widening runs PRE-analysis (the star expansion binds against
  * the target's resolved schema, so it must already be wide) on the
  * PARSED plan, for both catalog faces:
  *  - session-catalog `USING graft-dv` names (the V1 command path);
  *  - path-addressed DSv2 idents (`graftdv.`/root``) — the catalog
  *    re-loads the table per statement, so the widened schema is
  *    what Spark's own `RewriteMergeIntoTable` resolves against.
  * Off by default: silent schema growth on a typo'd source column is
  * exactly what an opt-in flag exists to prevent.
  */
object DvSchemaEvolve {

  def autoMergeOn(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.dv.schema.autoMerge")
      .contains("true")

  /** If `plan` is a MERGE — or an `INSERT INTO ... BY NAME` — into a
    * graft-dv table, autoMerge is on, and the (independently
    * analyzed) source carries new columns: widen the target. No-op
    * otherwise; never throws on non-dv targets. Positional INSERTs
    * are deliberately excluded: widening changes the target's arity,
    * so only the BY NAME form has unambiguous evolution semantics
    * (the Delta rule).
    */
  def maybeWiden(spark: SparkSession, plan: LogicalPlan): Unit =
    plan match {
      case m: MergeIntoTable if autoMergeOn(spark) =>
        widen(spark, m.targetTable, m.sourceTable)
      case i: org.apache.spark.sql.catalyst.plans.logical
          .InsertIntoStatement
          if autoMergeOn(spark) && i.byName && !i.overwrite &&
            i.userSpecifiedCols.isEmpty =>
        widen(spark, i.table, i.query)
      case _ => ()
    }

  private def widen(spark: SparkSession, target: LogicalPlan,
      source: LogicalPlan): Unit =
    targetRoot(spark, target).foreach { root =>
      val src =
        try spark.sessionState.analyzer.execute(source).schema
        catch { case _: Exception => return } // source won't resolve
      val have = DV.read(spark, root).schema.fieldNames.toSet
      val extra = src.fields.filterNot(f => have.contains(f.name))
      if (extra.nonEmpty) {
        DV.alterAddColumns(spark, root,
          StructType(extra.map(_.copy(nullable = true)))): Unit
        // bring a session-catalog entry (V1 name) in step so the
        // statement's own resolution sees the widened schema
        target.collectFirst {
          case u: UnresolvedRelation => u.multipartIdentifier
        }.foreach { ident =>
          if (DvDml.dvCatalogRoot(spark, ident).isDefined)
            DvAlterColumns.refreshCatalogSchema(spark, ident, root)
        }
      }
    }

  /** The graft-dv root a MERGE target resolves to: a session-catalog
    * `USING graft-dv` name, or a path-addressed ident of a registered
    * DSv2 graft catalog (`<cat>.`/abs/path``).
    */
  private def targetRoot(spark: SparkSession,
      t: LogicalPlan): Option[String] = t match {
    case SubqueryAlias(_, child) => targetRoot(spark, child)
    case u: UnresolvedRelation =>
      val parts = u.multipartIdentifier
      DvDml.dvCatalogRoot(spark, parts).orElse {
        if (parts.length == 2 && parts(1).contains("/") &&
            spark.conf.getOption(
              s"spark.sql.catalog.${parts.head}")
              .contains("graft.sources.GraftDvCatalog") &&
            DV.exists(spark, parts(1)))
          Some(parts(1))
        else None
      }
    case _ => None
  }
}
