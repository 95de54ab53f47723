package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main for the quality_classifier iteration loop
  * (round 16): interleaved A/B of the round-15 DataFrame-weights shape
  * (O) vs the driver-array + collect shape (N). Not part of any query
  * path; delete-safe.
  */
object QclProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.TextOps
    import graft.sources.Tables
    val QC_NB = 4096
    val QC_ITERS = 8

    def perDocDf() = Tables.documents(spark, sfDir)
      .select(col("doc_id"), (col("lang") === "en").cast("int").as("y"),
        explode(TextOps.words(col("text"))).as("word"))
      .select(col("doc_id"), col("y"), (TextOps.h31(col("word")) % QC_NB).as("b"))
      .groupBy(col("doc_id"), col("y"), col("b"))
      .agg(count(lit(1)).as("n"))
      .persist()

    def sigma(xq: Column): Column =
      lit(1.0) / (lit(1.0) + exp(-(xq.cast("double") * lit(1e-9))))

    // round-15 shape
    def runO(): Unit = {
      val perDoc = perDocDf()
      def forward(w: DataFrame): DataFrame =
        perDoc.join(broadcast(w), Seq("b"))
          .groupBy(col("doc_id"), col("y"))
          .agg(sum(col("n") * col("wq")).as("xq"))
      var w = perDoc.select(col("b")).distinct().withColumn("wq", lit(0L))
      for (_ <- 0 until QC_ITERS) {
        val resid = forward(w).select(col("doc_id"),
          floor((col("y").cast("double") - sigma(col("xq"))) * 1e5)
            .cast("long").as("rq"))
        val grad = perDoc.join(resid, Seq("doc_id"))
          .groupBy(col("b")).agg(sum(col("n") * col("rq")).as("gq"))
        w = w.join(broadcast(grad), Seq("b"), "left").na.fill(0L, Seq("gq"))
          .select(col("b"), (col("wq") + col("gq")).as("wq"))
          .localCheckpoint()
      }
      forward(w)
        .select(col("doc_id"), col("y").as("is_en"),
          round(sigma(col("xq")), 6).as("p_target"))
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }

    // round-16 candidate
    def runN(): Unit = {
      val perDoc = perDocDf()
      val wArr = new Array[Long](QC_NB)
      def wAt(b: Column): Column =
        element_at(typedlit(wArr.toIndexedSeq), (b + 1).cast("int"))
      def forward() =
        perDoc
          .groupBy(col("doc_id"), col("y"))
          .agg(sum(col("n") * wAt(col("b"))).as("xq"))
      for (_ <- 0 until QC_ITERS) {
        val resid = forward().select(col("doc_id"),
          floor((col("y").cast("double") - sigma(col("xq"))) * 1e5)
            .cast("long").as("rq"))
        val grad = perDoc.join(resid, Seq("doc_id"))
          .groupBy(col("b")).agg(sum(col("n") * col("rq")).as("gq"))
          .collect()
        grad.foreach(r =>
          wArr(r.getAs[Number]("b").intValue) += r.getAs[Number]("gq").longValue)
      }
      forward()
        .select(col("doc_id"), col("y").as("is_en"),
          round(sigma(col("xq")), 6).as("p_target"))
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }

    // round-16 candidate W: doc_id-partitioned cache + per-iteration
    // window (no join, no per-iteration corpus exchange) + driver
    // weights via literal array + 4096-row grad collect
    def runW(): Unit = {
      import org.apache.spark.sql.expressions.Window
      val perDoc = Tables.documents(spark, sfDir)
        .select(col("doc_id"), (col("lang") === "en").cast("int").as("y"),
          explode(TextOps.words(col("text"))).as("word"))
        .select(col("doc_id"), col("y"), (TextOps.h31(col("word")) % QC_NB).as("b"))
        .groupBy(col("doc_id"), col("y"), col("b"))
        .agg(count(lit(1)).as("n"))
        .repartition(col("doc_id"))
        .persist()
      val wArr = new Array[Long](QC_NB)
      def wAt(b: Column): Column =
        element_at(typedlit(wArr.toIndexedSeq), (b + 1).cast("int"))
      val byDoc = Window.partitionBy(col("doc_id"))
      for (_ <- 0 until QC_ITERS) {
        val grad = perDoc
          .withColumn("xq", sum(col("n") * wAt(col("b"))).over(byDoc))
          .select(col("b"), col("n"),
            floor((col("y").cast("double") - sigma(col("xq"))) * 1e5)
              .cast("long").as("rq"))
          .groupBy(col("b")).agg(sum(col("n") * col("rq")).as("gq"))
          .collect()
        grad.foreach(r =>
          wArr(r.getAs[Number]("b").intValue) += r.getAs[Number]("gq").longValue)
      }
      perDoc
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(col("n") * wAt(col("b"))).as("xq"))
        .select(col("doc_id"), col("y").as("is_en"),
          round(sigma(col("xq")), 6).as("p_target"))
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }

    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime()
      f()
      (System.nanoTime() - t0) / 1e9
    }
    // warmups
    runO(); runW()
    val os = collection.mutable.ArrayBuffer[Double]()
    val ws = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 5) { os += time(runO _); ws += time(runW _) }
    System.err.println(f"[qclprobe] O reps=${os.map(x => f"$x%.2f").mkString(",")} min=${os.min}%.2f")
    System.err.println(f"[qclprobe] W reps=${ws.map(x => f"$x%.2f").mkString(",")} min=${ws.min}%.2f")
    runN _ : Unit // keep N referenced
    spark.stop()
  }
}
