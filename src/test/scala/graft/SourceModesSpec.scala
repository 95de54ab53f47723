package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.SparkException
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The three malformed-input policies of the JSON/CSV readers over one
  * fixture: PERMISSIVE quarantines (the `source_corrupt_records`
  * gate query), DROPMALFORMED silently drops, FAILFAST throws. The
  * reference's per-row try/except is PERMISSIVE-without-the-audit;
  * a production pipeline needs the quarantine count.
  */
class SourceModesSpec extends SparkSpec {

  private lazy val path: String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_modes_fixture"
    Tables.nation(spark, "/root/testdata/sf0.001").write.mode("overwrite").json(p)
    Files.writeString(Paths.get(s"$p/garbage.json"),
      "{\"n_nationkey\": oops}\nnot json at all\n{\"n_nationkey\": 1,\n")
    p
  }

  private val schema =
    "n_nationkey INT, n_name STRING, n_regionkey INT, _corrupt_record STRING"

  private def read(mode: String): DataFrame =
    spark.read.schema(schema).option("mode", mode)
      .option("columnNameOfCorruptRecord", "_corrupt_record").json(path)

  private lazy val goodRows: Long =
    Tables.nation(spark, "/root/testdata/sf0.001").count()

  test("PERMISSIVE keeps every line and quarantines the malformed ones") {
    val df = read("PERMISSIVE").cache()
    assert(df.filter(col("_corrupt_record").isNotNull).count() === 3)
    assert(df.filter(col("_corrupt_record").isNull).count() === goodRows)
    df.unpersist()
  }

  test("DROPMALFORMED silently drops the malformed lines") {
    // the corrupt column must not be selected in this mode (Spark
    // requires a cached/complete scan for it); count the survivors
    val df = spark.read
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .option("mode", "DROPMALFORMED").json(path)
    assert(df.count() === goodRows)
  }

  test("FAILFAST refuses the batch") {
    val e = intercept[SparkException] {
      spark.read
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .option("mode", "FAILFAST").json(path).count()
    }
    assert(e.getMessage.contains("MALFORMED_RECORD") ||
      e.getCause != null, s"unexpected: ${e.getMessage.take(200)}")
  }
}
