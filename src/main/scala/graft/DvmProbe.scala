package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for the dv_sql_merge lifecycle (round 16):
  * splits one benched rep into MERGE-statement vs read-back aggregate,
  * and times the opportunistic maintenance hooks standalone. Not part
  * of any query path; delete-safe.
  */
object DvmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{DeletionVectors => DV, TextOps}
    import graft.sources.Tables
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[dvmprobe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // mirror dvSqlMerge's setup (fresh root per run, not the memo)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_dvmprobe_" +
      System.identityHashCode(spark)
    val ev = Tables.events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    time("init") { DV.init(spark, ev, root, "day") }
    spark.conf.set("spark.sql.catalog.graftdv",
      "graft.sources.GraftDvCatalog")
    graft.plans.GraftPlans.ensureDvScan(spark)
    val tbl = s"graftdv.`$root`"
    val upd = ev.filter(TextOps.h60(
        concat(lit("dvsmu_"), col("event_id").cast("string"))) % 6 === 0)
      .withColumn("value", col("value") + 1000)
    val ins = ev.filter(TextOps.h60(
        concat(lit("dvsmi_"), col("event_id").cast("string"))) % 40 === 0)
      .withColumn("event_id", col("event_id") + lit(2000000000L))
      .withColumn("user_id", col("user_id") + lit(20000000L))
    upd.unionByName(ins).createOrReplaceTempView("dvmprobe_src")
    for (rep <- 1 to 3) {
      time(s"rep$rep merge") {
        spark.sql(
          s"""MERGE INTO $tbl t USING dvmprobe_src s
             |ON t.event_id = s.event_id
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      }
      time(s"rep$rep aggregate") {
        spark.table(tbl)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"rep$rep autoPack") { DV.autoPackFiles(spark, root) }
      time(s"rep$rep autoRefresh") { DV.autoRefreshIndex(spark, root) }
      ev.filter(lit(false)).createOrReplaceTempView("dvmprobe_empty")
      time(s"rep$rep merge-empty") {
        spark.sql(
          s"""MERGE INTO $tbl t USING dvmprobe_empty s
             |ON t.event_id = s.event_id
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      }
      val updOnly = ev.filter(TextOps.h60(
          concat(lit("dvsmu_"), col("event_id").cast("string"))) % 6 === 0)
        .withColumn("value", col("value") + 1000)
      updOnly.createOrReplaceTempView("dvmprobe_upd")
      time(s"rep$rep merge-updonly") {
        spark.sql(
          s"""MERGE INTO $tbl t USING dvmprobe_upd s
             |ON t.event_id = s.event_id
             |WHEN MATCHED THEN UPDATE SET *""".stripMargin).collect()
      }
    }
    spark.stop()
  }
}
