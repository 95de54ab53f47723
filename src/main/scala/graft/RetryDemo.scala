package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Task-retry semantics demo (run in its own JVM by RetrySemanticsSpec).
  *
  * The reference schedules every Airflow task with `retries: 1` and a
  * retry delay (`/root/reference/dags/dag.py:17-18`) — a transient
  * failure reruns the task once before the DAG run is failed. Spark's
  * equivalent is task-attempt retry: `spark.task.maxFailures` (here via
  * the `local[threads, maxFailures]` master) reruns a FAILED TASK on
  * another attempt while the job keeps going; only when one task fails
  * maxFailures times does the job abort. Driver/stage-level recovery for
  * the scheduled-ingest pipeline is covered separately by streaming
  * checkpoint restart (StreamingSpec).
  *
  * This main creates a `local[2, 2]` context, runs a 4-partition job in
  * which partition 0 ALWAYS throws on task attempt 0 and succeeds on
  * attempt 1, and prints the result plus the observed failure count.
  * Success of the job at all is the proof: with the default
  * single-attempt local master the same job dies.
  */
object RetryDemo {
  /** Counts throws on the executor side. Valid only because local mode
    * runs tasks in the driver JVM — on a cluster this would stay 0 on
    * the driver; the accumulator below is the distributed-safe channel,
    * and its final value of ZERO is itself the semantics under test:
    * Spark discards accumulator updates from failed task attempts.
    */
  val thrown = new java.util.concurrent.atomic.AtomicInteger(0)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2, 2]") // 2 threads, maxFailures=2 → one retry per task
      .appName("graft-retry-demo")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val failures: LongAccumulator = spark.sparkContext.longAccumulator("injected-failures")
    val sum = spark.sparkContext
      .parallelize(1L to 1000L, 4)
      .mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc.partitionId() == 0 && tc.attemptNumber() == 0) {
          thrown.incrementAndGet()
          failures.add(1)
          throw new RuntimeException("injected transient failure (attempt 0)")
        }
        it
      }
      .sum()
    // 1..1000 sums to 500500 — exactness proves the failed attempt's
    // partial output was discarded and the retry's output counted once.
    // thrown == 1: the failure genuinely happened (local-mode static).
    // failures.value == 0: Spark dropped the FAILED attempt's
    // accumulator update — the exactly-once accounting contract.
    println(s"retry_demo sum=${sum.toLong} thrown=${thrown.get} acc_failures=${failures.value}")
    spark.stop()
    if (sum.toLong == 500500L && thrown.get == 1 && failures.value == 0L) sys.exit(0)
    else sys.exit(1)
  }
}
