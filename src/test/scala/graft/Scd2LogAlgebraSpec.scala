package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.Scd2Log

/** The change-log's crash-safety claim is algebraic: state is a pure
  * function of the SET of log records, so replays, compactions, and
  * the non-atomic compaction window (compacted slice written, inputs
  * not yet deleted) must all be invisible to the rebuild. This spec
  * drives RANDOM interleavings of those operations and checks the
  * invariant after every step — the adversarial schedules a fixture
  * test can't enumerate.
  */
class Scd2LogAlgebraSpec extends SparkSpec {
  import spark.implicits._

  private val NB = 4L // buckets

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // one micro-batch's rows: unique event_ids within the RUN (batch b
  // owns ids [100b, 100b+size)); user spread drives bucket fan-out
  private def batchRows(b: Int, size: Int): Seq[(Long, Long, Long)] =
    (0 until size).map(i => (100L * b + i, (b * 7 + i * 3) % 11L, b * 1000L + i))

  private def write(rows: Seq[(Long, Long, Long)], accDir: String, b: Int): Unit =
    Scd2Log.appendSlice(
      rows.toDF("event_id", "user_id", "v")
        .withColumn("bucket", pmod(col("user_id"), lit(NB))),
      accDir, b.toLong)

  private def existingBuckets(accDir: String): Seq[Long] =
    (0L until NB).filter(b => new java.io.File(s"$accDir/bucket=$b").exists())

  test("random replay/compact/crash-compact schedules never change the rebuilt set") {
    val opGen = Gen.frequency(
      5 -> Gen.const("append"),
      3 -> Gen.const("replay"),
      2 -> Gen.const("compact"),
      2 -> Gen.const("crash-compact"))
    (0 until 3).foreach { run =>
      val accDir = Files.createTempDirectory(s"graft_scd2alg$run").toString
      var nextBatch = 0
      var sizes = Map.empty[Int, Int] // batch -> emitted size (for replays)
      var model = Map.empty[Long, (Long, Long, Long)] // event_id -> row
      val ops = samples(opGen, 10, 42L + 100L * run)
      ops.zipWithIndex.foreach { case (op, step) =>
        op match {
          case "append" =>
            val rows = batchRows(nextBatch, 3 + (step % 4))
            write(rows, accDir, nextBatch)
            sizes += nextBatch -> rows.size
            model ++= rows.map(r => r._1 -> r)
            nextBatch += 1
          case "replay" if nextBatch > 0 =>
            val b = step % nextBatch // any earlier batch, re-emitted verbatim
            write(batchRows(b, sizes(b)), accDir, b)
          case "compact" =>
            Scd2Log.compact(spark, accDir, existingBuckets(accDir),
              900 + step, compactAfter = 1)
          case "crash-compact" if existingBuckets(accDir).nonEmpty =>
            // the non-atomic window: compacted slice lands, inputs stay
            val bs = existingBuckets(accDir)
            val p = s"$accDir/bucket=${bs(step % bs.size)}"
            spark.read.option("basePath", accDir).parquet(p)
              .drop("bucket", "slice").dropDuplicates("event_id")
              .localCheckpoint(true)
              .write.mode("overwrite").parquet(s"$p/slice=c${800 + step}")
          case _ => () // replay/crash before any append: no-op
        }
        if (existingBuckets(accDir).nonEmpty) {
          val got = Scd2Log.touchedLog(spark, accDir, existingBuckets(accDir))
            .select(col("event_id"), col("user_id"), col("v"))
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          assert(got.length == got.map(_._1).distinct.length,
            s"run=$run step=$step ($op): rebuild yielded duplicate event_ids")
          assert(got.toSet == model.values.toSet,
            s"run=$run step=$step ($op): rebuilt set diverged from the model")
        }
      }
    }
  }
}
