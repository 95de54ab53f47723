package graft

import scala.sys.process._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.7 retry semantics: the reference's per-task `retries: 1`
  * (`dags/dag.py:17-18`) maps to Spark task-attempt retry
  * (`spark.task.maxFailures` / `local[n, maxFailures]`).
  *
  * maxFailures is fixed at SparkContext creation, and the suite-shared
  * session deliberately runs the default single-attempt local master —
  * so the demo runs in its own short-lived JVM (tests fork, so
  * java.class.path is the full test classpath). RetryDemo injects a
  * deterministic attempt-0 failure into one partition of a 4-partition
  * job; exit 0 means the job survived the failure, the task reran, and
  * the result was exact (no duplicated partition output).
  */
class RetrySemanticsSpec extends AnyFunSuite {
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("a task failing on attempt 0 is retried and the job result is exact") {
    val java = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val cmd = Seq(java) ++ addOpens ++
      Seq("-Xmx2g", "-Dspark.ui.enabled=false", "-cp", cp, "graft.RetryDemo")
    val out = new StringBuilder
    val rc = Process(cmd).!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    assert(rc == 0, s"RetryDemo exited $rc; stdout:\n$out")
    assert(out.toString.contains("sum=500500 thrown=1 acc_failures=0"), out.toString)
  }
}
