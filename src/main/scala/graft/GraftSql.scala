package graft

import org.apache.spark.sql.{DataFrame, GraftPlanApi, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedTable
import org.apache.spark.sql.catalyst.plans.logical.{AddColumns, DeleteFromTable, MergeIntoTable, UpdateTable}
import org.apache.spark.sql.functions.lit

import graft.plans.{DvDml, DvDmlRule}

/** SQL entry point with DML routed to the graft-dv lakehouse layer.
  *
  * For a session built with the engine's extensions
  * (`spark.sql.extensions=graft.functions.GraftExtensions`), plain
  * `spark.sql("DELETE FROM ev WHERE ...")` already works — the
  * injected [[graft.plans.DvDmlRule]] swaps the resolved statement in
  * the analyzer's resolution window. This wrapper serves sessions the
  * engine does NOT build (the harness driver owns its session, and
  * `experimental.extraOptimizations` runs AFTER checkAnalysis has
  * rejected DML on a V1 relation): it parses with the session's own
  * parser, lets the session's own analyzer RESOLVE the statement
  * (conditions, assignments, MERGE star expansion — all standard
  * Spark), applies the same swap rule, and executes. Everything that
  * is not a DML statement over a graft-dv table — SELECTs, DDL, DML
  * on other sources — delegates verbatim to `spark.sql`, so this is a
  * drop-in superset.
  *
  * Error surfaces are unchanged: an unresolvable statement (bad
  * column, bad table) never matches the rule's `resolved` guard and
  * falls through to `spark.sql`, which raises the standard analyzer
  * error.
  */
object GraftSql {

  def sql(spark: SparkSession, text: String): DataFrame = {
    // maintenance statements (VACUUM/OPTIMIZE) are not in Spark's
    // grammar at all — recognize them before the parser rejects them
    graft.plans.DvMaintenanceSql.parse(text) match {
      case Some(cmd) => return GraftPlanApi.ofRows(spark, cmd)
      case None => ()
    }
    val parsed = spark.sessionState.sqlParser.parsePlan(text)
    // time travel swaps on the PARSED plan: Spark's own resolution
    // throws UNSUPPORTED_FEATURE.TIME_TRAVEL for non-DSv2 relations
    // before any post-resolution hook could run
    val pre = graft.plans.DvTimeTravelRule(spark)(parsed)
    parsed match {
      case _: DeleteFromTable | _: UpdateTable | _: MergeIntoTable =>
        val analyzed = spark.sessionState.analyzer.execute(pre)
        val routed = DvDmlRule(analyzed)
        if ((routed eq analyzed) && (pre eq parsed)) spark.sql(text)
        else GraftPlanApi.ofRows(spark, routed)
      case ac: AddColumns =>
        routeAddColumns(spark, ac).getOrElse(spark.sql(text))
      case _ =>
        if (pre eq parsed) spark.sql(text)
        else GraftPlanApi.ofRows(spark, pre)
    }
  }

  /** `ALTER TABLE t ADD COLUMNS (...)` on a graft-dv catalog table:
    * widen the MANIFEST schema (one metadata-only CAS flip — the
    * schema-in-log rule, [[graft.operators.DeletionVectors
    * .alterAddColumns]]), then update the catalog entry's stored
    * schema so `spark.table` serves the new column immediately.
    * Constraints shared with the append-side evolution: columns add
    * as NULLABLE only (old files null-fill — a NOT NULL add would be
    * retroactively violated), top-level only, no FIRST/AFTER, no
    * DEFAULT. Non-graft-dv targets fall through to Spark's own ALTER.
    */
  private def routeAddColumns(spark: SparkSession,
      ac: AddColumns): Option[DataFrame] = ac.table match {
    case u: UnresolvedTable =>
      DvDml.dvCatalogRoot(spark, u.multipartIdentifier).map { root =>
        val fields = ac.columnsToAdd.map { q =>
          require(q.path.isEmpty,
            "graft-dv supports adding TOP-LEVEL columns only " +
              s"(got ${q.name.mkString(".")})")
          require(q.position.isEmpty,
            "graft-dv adds columns at the END of the schema — " +
              "FIRST/AFTER positioning is not supported")
          require(q.default.isEmpty,
            "graft-dv added columns carry no DEFAULT (old files " +
              "null-fill; bake defaults into the writing query)")
          require(q.nullable,
            s"added column ${q.colName} must be nullable: existing " +
              "files null-fill it (the parquet missing-column rule)")
          val meta = q.comment.map(c =>
              new org.apache.spark.sql.types.MetadataBuilder()
                .putString("comment", c).build())
            .getOrElse(org.apache.spark.sql.types.Metadata.empty)
          org.apache.spark.sql.types.StructField(
            q.colName, q.dataType, nullable = true, meta)
        }
        val v = graft.operators.DeletionVectors.alterAddColumns(spark,
          root, org.apache.spark.sql.types.StructType(fields))
        // keep the CATALOG's stored schema in step so the very next
        // spark.table(...) serves the added column (the stored schema
        // is a validated subset view otherwise)
        import org.apache.spark.sql.catalyst.TableIdentifier
        val tid = u.multipartIdentifier match {
          case Seq(t) => Some(TableIdentifier(t))
          case Seq(db, t) => Some(TableIdentifier(t, Some(db)))
          case Seq(c, db, t) if c.equalsIgnoreCase("spark_catalog") =>
            Some(TableIdentifier(t, Some(db)))
          case _ => None
        }
        tid.foreach { id =>
          val cat = spark.sessionState.catalog
          cat.alterTableDataSchema(id,
            graft.operators.DeletionVectors.read(spark, root).schema)
          cat.refreshTable(id)
        }
        spark.range(1).select(lit(v).as("version"))
      }
    case _ => None
  }
}
