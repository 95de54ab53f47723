package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors => DV}

/** PROTOCOL GATING (the Delta table-features shape, feature-granular):
  * a manifest written under a capability — column mapping, partition
  * evolution, CDF update images — records that capability as REQUIRED,
  * and a reader lacking it fails loudly at open instead of misreading
  * the layout (serving physical names, binding old-generation paths to
  * wrong columns, folding a feed without its update images).
  */
class DvProtocolSpec extends SparkSpec {

  private def fresh(): (String, DataFrame) = {
    val root = Files.createTempDirectory("graft_dvproto").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(200)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .localCheckpoint()
    DV.init(spark, ev, root, "day")
    (root, ev)
  }

  private def withReaderFeatures[T](feats: String)(body: => T): T = {
    spark.conf.set("spark.graft.dv.readerFeatures", feats)
    try body finally spark.conf.unset("spark.graft.dv.readerFeatures")
  }

  test("a pre-feature table carries no requirement and reads under " +
      "ANY reader; each capability's first use records it exactly once") {
    val (root, _) = fresh()
    // even a featureless reader opens a plain table
    withReaderFeatures("") {
      assert(DV.read(spark, root).count() == 200)
    }
    DV.alterRenameColumn(spark, root, "value", "amount"): Unit
    DV.alterDropColumn(spark, root, "props"): Unit
    val feats = DV.detail(spark, root)._1("features")
    assert(feats == "column-mapping",
      s"two mapping verbs must record the feature once, got: $feats")
  }

  test("a gate-stripped reader fails LOUDLY (never misreads) on " +
      "column mapping and partition evolution; restoring the " +
      "capability restores the read") {
    val (root, ev) = fresh()
    DV.alterRenameColumn(spark, root, "value", "amount"): Unit
    // the stripped reader refuses to open — reads, writes, history
    withReaderFeatures("partition-evolution,cdf-updates") {
      val e = intercept[IllegalArgumentException](
        DV.read(spark, root).count())
      assert(e.getMessage.contains("column-mapping"))
      val e2 = intercept[IllegalArgumentException](
        DV.append(spark, root, Seq("day"), ev.limit(5)))
      assert(e2.getMessage.contains("column-mapping"))
    }
    // the full reader serves the mapped read
    assert(DV.read(spark, root).columns.contains("amount"))

    val (root2, _) = fresh()
    DV.setPartitioning(spark, root2, Seq("event_type")): Unit
    withReaderFeatures("column-mapping,cdf-updates") {
      val e = intercept[IllegalArgumentException](
        DV.read(spark, root2).count())
      assert(e.getMessage.contains("partition-evolution"))
      // the gate holds through the DSv2 catalog face too — a stripped
      // reader cannot sneak a misread in through a different door
      spark.conf.set("spark.sql.catalog.graftdv",
        "graft.sources.GraftDvCatalog")
      val e2 = intercept[Exception](
        spark.sql(s"SELECT count(*) FROM graftdv.`$root2`").collect())
      def chain(t: Throwable): Boolean = t != null &&
        (Option(t.getMessage).exists(_.contains("partition-evolution")) ||
          chain(t.getCause))
      assert(chain(e2))
    }
    assert(DV.read(spark, root2).count() == 200)
  }

  test("CDF update images mark the table at FIRST image commit; a " +
      "feed consumer without the capability fails at open") {
    val (root, _) = fresh()
    spark.conf.set("spark.sql.catalog.graftdv",
      "graft.sources.GraftDvCatalog")
    spark.conf.set("spark.graft.dv.cdf", "true")
    try spark.sql(s"UPDATE graftdv.`$root` SET value = value + 1 " +
      "WHERE user_id % 2 = 0").collect(): Unit
    finally spark.conf.unset("spark.graft.dv.cdf")
    val feats = DV.detail(spark, root)._1("features")
    assert(feats.contains("cdf-updates"))
    withReaderFeatures("column-mapping,partition-evolution") {
      val e = intercept[Exception](DV.read(spark, root).count())
      assert(e.getMessage.contains("cdf-updates"))
    }
  }
}
