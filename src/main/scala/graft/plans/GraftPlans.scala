package graft.plans

import org.apache.spark.sql.{DataFrame, GraftPlanApi, SparkSession, SparkSessionExtensions}

/** DataFrame-level API + registration for the engine's custom logical
  * operators (currently [[AsofJoin]]).
  *
  * Two install paths, mirroring [[graft.functions.GraftFunctions]]:
  *  - [[install]] for `SparkSession.builder.withExtensions` /
  *    `spark.sql.extensions=graft.functions.GraftExtensions`;
  *  - [[ensureStrategy]] for sessions the engine doesn't build (the
  *    driver owns the session in this harness) — idempotent append to
  *    `spark.experimental.extraStrategies`, the public per-session
  *    planner hook.
  */
object GraftPlans {

  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughAsofJoin)
    ext.injectOptimizerRule(s => DvScanRule(s))
    // SQL DML (DELETE/UPDATE/MERGE) on graft-dv tables: must swap in
    // the RESOLUTION window — checkAnalysis rejects DML over a V1
    // relation before any optimizer rule could run. Driver-owned
    // sessions get the same routing via graft.GraftSql.sql.
    ext.injectResolutionRule(_ => DvDmlRule)
    // SQL time travel (VERSION/TIMESTAMP AS OF): must swap BEFORE the
    // resolution batch (ResolveRelations itself throws on time travel
    // over a V1 relation) — the Hints batch precedes Resolution.
    ext.injectHintResolutionRule(s => DvTimeTravelRule(s))
    // ALTER TABLE ... ADD COLUMNS on graft-dv: ResolveSessionCatalog
    // converts (and rejects) the v2 AddColumns inside the Resolution
    // batch itself, so — like time travel — the swap must run in the
    // HINTS batch, on the parsed plan.
    ext.injectHintResolutionRule(s => DvAlterRule(s))
    // SQL maintenance statements (VACUUM/OPTIMIZE): not in Spark's
    // grammar — a delegating parser wrapper recognizes exactly the
    // two shapes (the Delta injectParser pattern).
    ext.injectParser((s, delegate) => new GraftSqlParser(s, delegate))
  }

  /** Idempotent per-session strategy + optimizer-rule registration. */
  def ensureStrategy(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsofJoinStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(PushFilterThroughAsofJoin))
      spark.experimental.extraOptimizations = opts :+ PushFilterThroughAsofJoin
  }

  /** Idempotent per-session install of the DV-table placeholder swap
    * ([[DvScanRule]]): catalog/`format("graft-dv")` reads get the
    * manifest-fed masked plan instead of the row-RDD fallback.
    */
  def ensureDvScan(spark: SparkSession): Unit = {
    val opts = spark.experimental.extraOptimizations
    val present = opts.exists {
      case DvScanRule(s) => s eq spark
      case _ => false
    }
    if (!present)
      spark.experimental.extraOptimizations = opts :+ DvScanRule(spark)
  }

  /** Opt-in, per-session install of the summary-table rewrite
    * ([[MvRewriteRule]]). Separate from [[ensureStrategy]] on purpose:
    * a registered summary may only affect plans of the session that
    * asked for it (see [[MvCatalog]]).
    */
  def ensureMvRewrite(spark: SparkSession): Unit = {
    val opts = spark.experimental.extraOptimizations
    val present = opts.exists {
      case MvRewriteRule(s) => s eq spark
      case _ => false
    }
    if (!present)
      spark.experimental.extraOptimizations = opts :+ MvRewriteRule(spark)
  }

  /** `left ASOF JOIN right ON left[keyL] = right[keyR] AND
    * left[timeL] >= right[timeR]` (inner; latest right row wins).
    * Column names resolve against each side, so the two sides may
    * share names — disambiguate with renames before joining if the
    * OUTPUT needs distinct names.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyL: String, timeL: String,
      keyR: String, timeR: String): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = GraftPlanApi.analyzed(left)
    val rPlan = GraftPlanApi.analyzed(right)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name).mkString(", ")}"))
    GraftPlanApi.ofRows(spark,
      AsofJoin(lPlan, rPlan,
        attr(lPlan, keyL), attr(rPlan, keyR),
        attr(lPlan, timeL), attr(rPlan, timeR)))
  }
}
