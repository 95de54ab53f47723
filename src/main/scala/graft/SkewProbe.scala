package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AQE skew-join evidence probe (round 7, the verdict's #7).
  *
  * `join_skew_salted` demonstrates MANUAL skew mitigation (dim
  * replicated S ways, fact routed by a deterministic salt). Spark's
  * AQE does the same adaptively: `OptimizeSkewedJoin` splits an
  * oversized shuffle partition into multiple reader splits by mapper
  * ranges and replicates the other side's partition across them —
  * salting without touching the query. This probe runs THE SAME
  * skewed join three ways at 100x events (~10M rows, 90% of them on
  * one hot key) and reports wall + per-task maxima, so the PLANS.md
  * comparison is measured, not asserted:
  *
  *  1. `smj-noaqe`   — AQE off, broadcast off: the naive plan; the hot
  *                     key's entire volume lands on one reducer task.
  *  2. `smj-aqe-skew`— AQE on with skew-join thresholds sized for the
  *                     probe volume: the hot partition splits.
  *  3. `salted-S16`  — the manual `join_skew_salted` shape, AQE off.
  *
  * (With a 997-row dim the PRODUCTION answer is a broadcast join — no
  * shuffle of the fact at all; both mitigation variants exist for the
  * case where the build side does NOT fit, so the probe disables
  * broadcast everywhere to make the big-side shuffle happen at probe
  * scale.)
  *
  * All three variants must produce identical aggregates (asserted) —
  * the probe is also a correctness cross-check of the salting rewrite.
  */
object SkewProbe {

  private final class TaskMaxListener extends SparkListener {
    val maxDurMs = new AtomicLong
    val maxShuffleReadRecords = new AtomicLong
    val tasks = new AtomicLong
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        tasks.incrementAndGet()
        maxDurMs.accumulateAndGet(te.taskInfo.duration, math.max)
        maxShuffleReadRecords.accumulateAndGet(
          m.shuffleReadMetrics.recordsRead, math.max)
      }
    }
    def reset(): Unit = { maxDurMs.set(0); maxShuffleReadRecords.set(0); tasks.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_PROBE_SCALE", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new TaskMaxListener
    spark.sparkContext.addSparkListener(listener)

    // 100x events via disjoint user replicas (the ScaleProbe layout);
    // reuse the probe corpus if a ScaleProbe run already wrote it
    val evPath = s"/tmp/graft_scale$scale/events.parquet"
    val fs = new org.apache.hadoop.fs.Path(evPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(evPath))) {
      val evBase = graft.sources.Tables.events(spark, sfDir)
      val maxUid = evBase.agg(max(col("user_id"))).head.getLong(0) + 1
      val maxEid = evBase.agg(max(col("event_id"))).head.getLong(0) + 1
      (0 until scale).map { k =>
        evBase.withColumn("user_id", col("user_id") + lit(k * maxUid))
          .withColumn("event_id", col("event_id") + lit(k * maxEid))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(evPath)
    }
    // 90% of rows land on hot key 0; the rest spread over 996 cold keys
    val fact = spark.read.parquet(evPath)
      .withColumn("k",
        when(pmod(col("user_id"), lit(10)) < 9, 0L)
          .otherwise(pmod(col("user_id"), lit(997))))
      .select(col("k"), col("value"))
    val nFact = fact.count()
    System.err.println(s"[skew] fact rows: $nFact (hot-key share ~90%)")
    import spark.implicits._
    val dim = (0L until 997L).map(k => (k, if (k == 0) "hot" else "cold"))
      .toDF("k", "label")

    def plain(): DataFrame =
      fact.join(dim, Seq("k"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("v"))

    def salted(s: Int): DataFrame = {
      val dimS = dim.withColumn("salt", explode(sequence(lit(0), lit(s - 1))))
      val factS = fact.withColumn("salt", pmod(spark_partition_id().cast("long") +
        monotonically_increasing_id(), lit(s)).cast("int"))
      factS.join(dimS, Seq("k", "salt"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("v"))
    }

    def withConfs(confs: Map[String, String])(body: => (Seq[String], Double)): (Seq[String], Double) = {
      val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val noBroadcast = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

    def run(name: String, confs: Map[String, String], df: () => DataFrame): Seq[String] = {
      val (rows, secs) = withConfs(noBroadcast ++ confs) {
        spark.catalog.clearCache()
        listener.reset()
        val t0 = System.nanoTime()
        val out = df().collect().map(_.toSeq.mkString("|")).sorted.toSeq
        (out, (System.nanoTime() - t0) / 1e9)
      }
      System.err.println(
        f"[skew] $name%-14s wall=${secs}%7.2fs tasks=${listener.tasks.get}%4d " +
          f"maxTask=${listener.maxDurMs.get / 1000.0}%6.2fs " +
          f"maxTaskShufRecords=${listener.maxShuffleReadRecords.get}%,d")
      rows
    }

    val aqeOff = Map("spark.sql.adaptive.enabled" -> "false")
    val aqeSkew = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      // size the detector for probe volume: hot partition ~9M rows x
      // ~20B ≈ 180MB shuffled; default threshold (256MB) would not fire
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m")

    val warm = run("warmup", aqeOff, plain) // absorb codegen/scan caches
    val r1 = run("smj-noaqe", aqeOff, plain)
    val r2 = run("smj-aqe-skew", aqeSkew, plain)
    val r3 = run("salted-S16", aqeOff, () => salted(16))
    require(r1 == warm && r1 == r2 && r1 == r3,
      "variants disagree — skew mitigation changed the answer")
    System.err.println("[skew] all variants agree on the aggregate (asserted)")
    spark.stop()
  }
}
