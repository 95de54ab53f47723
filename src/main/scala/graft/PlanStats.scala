package graft

import org.apache.spark.sql.SparkSession

/** Plan-evidence dump: one markdown row per headline query with the
  * physical-plan facts that matter at 100 TB — shuffle (Exchange)
  * count, join strategy mix, and whole-stage-codegen coverage. Run:
  *
  *   sbt "runMain graft.PlanStats /root/testdata/sf0.001"
  *
  * The output table is checked into PLANS.md (§ headline plan survey)
  * so plan regressions show up in review diffs, not just in runtime.
  */
object PlanStats {
  /** Simple-mode plans tag codegen'd operators `*(stageId) Op`; the
    * number of DISTINCT stage ids = whole-stage-codegen span count.
    */
  private def distinctCodegenStages(plan: String): Int =
    """\*\((\d+)\)""".r.findAllMatchIn(plan).map(_.group(1)).toSet.size

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // static plans: with AQE on, executedPlan is an un-finalized
      // AdaptiveSparkPlan and WholeStageCodegen spans aren't visible
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("| query | exchanges | BHJ | SMJ | SHJ | BNLJ | codegen spans |")
    println("|---|---|---|---|---|---|---|")
    queries.Registry.headline.foreach { name =>
      try {
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
        def c(p: String) = p.r.findAllIn(plan).size
        println(s"| $name | ${c("Exchange ")} | ${c("BroadcastHashJoin")} | " +
          s"${c("SortMergeJoin")} | ${c("ShuffledHashJoin")} | " +
          s"${c("BroadcastNestedLoopJoin")} | ${distinctCodegenStages(plan)} |")
      } catch {
        case e: Throwable => println(s"| $name | ERROR ${e.getClass.getSimpleName} | | | | | |")
      }
      // sink/DDL queries may leave views or tables; plans only, no cleanup needed
    }
    spark.stop()
  }
}
