package graft

import org.apache.spark.sql.{DataFrame, GraftPlanApi, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{AddColumns, AnalyzeColumn, DeleteFromTable, MergeIntoTable, UpdateTable}

import graft.plans.DvDmlRule

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
        // MERGE schema evolution (opt-in): widen the target BEFORE
        // analysis so star actions cover the source's new columns
        graft.plans.DvSchemaEvolve.maybeWiden(spark, parsed)
        val analyzed = spark.sessionState.analyzer.execute(pre)
        val routed = DvDmlRule(analyzed)
        if ((routed eq analyzed) && (pre eq parsed)) spark.sql(text)
        else GraftPlanApi.ofRows(spark, routed)
      case ac: AddColumns =>
        graft.plans.DvAlterColumns.route(spark, ac)
          .map(cmd => GraftPlanApi.ofRows(spark, cmd))
          .getOrElse(spark.sql(text))
      case rc: org.apache.spark.sql.catalyst.plans.logical.RenameColumn =>
        graft.plans.DvAlterColumns.routeRename(spark, rc)
          .map(cmd => GraftPlanApi.ofRows(spark, cmd))
          .getOrElse(spark.sql(text))
      case dc: org.apache.spark.sql.catalyst.plans.logical.DropColumns =>
        graft.plans.DvAlterColumns.routeDrop(spark, dc)
          .map(cmd => GraftPlanApi.ofRows(spark, cmd))
          .getOrElse(spark.sql(text))
      case at: org.apache.spark.sql.catalyst.plans.logical.AnalyzeTable =>
        graft.plans.DvAnalyze.route(spark, at)
          .map(cmd => GraftPlanApi.ofRows(spark, cmd))
          .getOrElse(spark.sql(text))
      case ac: AnalyzeColumn =>
        graft.plans.DvAnalyzeColumns.route(spark, ac)
          .map(cmd => GraftPlanApi.ofRows(spark, cmd))
          .getOrElse(spark.sql(text))
      case i: org.apache.spark.sql.catalyst.plans.logical
          .InsertIntoStatement =>
        // INSERT BY NAME schema evolution (opt-in, same autoMerge
        // flag): widen the target before re-analysis
        graft.plans.DvSchemaEvolve.maybeWiden(spark, i)
        spark.sql(text)
      case _ =>
        if (pre eq parsed) spark.sql(text)
        else GraftPlanApi.ofRows(spark, pre)
    }
  }

}
