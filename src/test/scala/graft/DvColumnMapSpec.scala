package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors => DV, Snapshots}

/** COLUMN MAPPING (`ALTER TABLE ... RENAME COLUMN / DROP COLUMN`) on
  * graft-dv tables — the Delta name-mapping shape: the PHYSICAL
  * parquet field name is frozen at a column's first write; RENAME
  * flips only the LOGICAL name in one metadata-only manifest flip, so
  * no file is ever rewritten; DROP hides the column and remembers the
  * retired physical name so a re-added column of the same name cannot
  * resurrect the old bytes.
  */
class DvColumnMapSpec extends SparkSpec {

  private var seq = 0

  private def fresh(): (String, String, DataFrame) = {
    seq += 1
    val root = Files.createTempDirectory("graft_dvcm").toString
    val name = s"dvcm_t${seq}_${math.abs(root.hashCode)}"
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(300)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .localCheckpoint()
    DV.init(spark, ev, root, "day")
    spark.sql(
      s"CREATE TABLE $name USING `graft-dv` OPTIONS (path '$root')")
    graft.plans.GraftPlans.ensureDvScan(spark)
    (root, name, ev)
  }

  /** Physical field names of one live data file's parquet footer. */
  private def footerFields(root: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val one = walk(new java.io.File(DV.dataDir(root)))
      .filter(_.getName.endsWith(".parquet")).head
    spark.read.parquet(one.getPath).schema.fieldNames.toSet
  }

  test("RENAME COLUMN is metadata-only: old files read under the new " +
      "name with frozen physical footers; new appends and DML write " +
      "through the new name into the SAME physical layout") {
    val (root, name, ev) = fresh()
    val vPre = Snapshots.latestVersion(spark, DV.manifestTable(root)).get
    val filesBefore = DV.manifest(spark, root)
      .filter(col("file") =!= "").count()

    val v = graft.GraftSql.sql(spark,
      s"ALTER TABLE $name RENAME COLUMN value TO amount")
      .head().getLong(0)
    assert(v == vPre + 1)
    assert(DV.manifest(spark, root).filter(col("file") =!= "").count()
      == filesBefore, "rename must move zero data files")

    // old files serve the renamed column exactly
    val rd = DV.read(spark, root)
    assert(rd.columns.contains("amount") && !rd.columns.contains("value"))
    assert(rd.agg(sum(col("amount").cast("decimal(28,4)"))).head()
        .getDecimal(0) ==
      ev.agg(sum(col("value").cast("decimal(28,4)"))).head().getDecimal(0))
    // the parquet footers still carry the FROZEN physical name
    assert(footerFields(root).contains("value") &&
      !footerFields(root).contains("amount"))

    // a post-rename append goes through the new name; staged files
    // keep the one physical layout (no second generation)
    val extra = ev.limit(40)
      .withColumn("event_id", col("event_id") + 5000000L)
      .withColumnRenamed("value", "amount")
    DV.append(spark, root, Seq("day"), extra): Unit
    assert(DV.read(spark, root).count() == 340)
    val allFields = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(DV.dataDir(root)))
        .filter(_.getName.endsWith(".parquet"))
        .flatMap(p => spark.read.parquet(p.getPath).schema.fieldNames)
        .toSet
    }
    assert(allFields.contains("value") && !allFields.contains("amount"),
      "every file generation must share the frozen physical layout")

    // DML through the catalog face binds the new name (filter AND
    // assignment), merge-on-read
    spark.conf.set("spark.sql.catalog.graftdv",
      "graft.sources.GraftDvCatalog")
    spark.sql(s"UPDATE graftdv.`$root` SET amount = amount + 100 " +
      "WHERE user_id % 3 = 0").collect(): Unit
    val n3 = DV.read(spark, root).filter(col("user_id") % 3 === 0).count()
    val gotSum = DV.read(spark, root)
      .agg(sum(col("amount").cast("decimal(28,4)"))).head().getDecimal(0)
    val wantSum = ev.select(col("value").as("amount"))
      .unionByName(extra.select("amount"))
      .agg(sum(col("amount").cast("decimal(28,4)"))).head().getDecimal(0)
      .add(new java.math.BigDecimal(100L * n3).setScale(4))
    assert(gotSum.compareTo(wantSum) == 0)

    // time travel: the pre-rename version reads under ITS name
    assert(DV.readVersion(spark, root, vPre).columns.contains("value"))
    // and a rename-back collapses the mapping to identity
    graft.GraftSql.sql(spark,
      s"ALTER TABLE $name RENAME COLUMN amount TO value").collect()
    assert(DV.read(spark, root).columns.contains("value"))
  }

  test("DROP COLUMN then ADD COLUMNS of the same name never " +
      "resurrects the dropped bytes; RESTORE returns the old schema") {
    val (root, name, ev) = fresh()
    val vPre = Snapshots.latestVersion(spark, DV.manifestTable(root)).get
    graft.GraftSql.sql(spark,
      s"ALTER TABLE $name DROP COLUMN event_type").collect()
    val rd = DV.read(spark, root)
    assert(!rd.columns.contains("event_type"))
    assert(rd.count() == 300)

    // re-add the SAME name (different type, even): old rows must read
    // NULL — the re-added column gets a generated physical name
    graft.GraftSql.sql(spark,
      s"ALTER TABLE $name ADD COLUMNS (event_type INT)").collect()
    val rd2 = DV.read(spark, root)
    assert(rd2.schema("event_type").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(rd2.filter(col("event_type").isNotNull).count() == 0,
      "dropped bytes must not resurface under the re-added name")
    // a new append carries values for the re-added column only
    val extra = ev.limit(25).drop("event_type")
      .withColumn("event_id", col("event_id") + 5000000L)
      .withColumn("event_type", (col("user_id") % 4).cast("int"))
    DV.append(spark, root, Seq("day"), extra): Unit
    assert(DV.read(spark, root)
      .filter(col("event_type").isNotNull).count() == 25)

    // maintenance rewrite (pack) under the mapping: values survive,
    // old rows stay NULL (the rewrite materializes the mapped view)
    DV.compactSmallFiles(spark, root, minBytes = 512L * 1024 * 1024): Unit
    assert(DV.read(spark, root)
      .filter(col("event_type").isNotNull).count() == 25)
    assert(DV.read(spark, root).count() == 325)

    // time travel + restore: the pre-drop version serves the ORIGINAL
    // string column; restore brings it back live
    assert(DV.readVersion(spark, root, vPre).schema("event_type")
      .dataType == org.apache.spark.sql.types.StringType)
    DV.restore(spark, root, vPre): Unit
    assert(DV.read(spark, root).schema("event_type").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(DV.read(spark, root)
      .filter(col("event_type").isNotNull).count() > 0)
  }

  test("SHALLOW CLONE carries the column mapping: the clone serves " +
      "the renamed names over the SOURCE's frozen physical files; " +
      "CREATE TABLE through the catalog accepts column DEFAULTs") {
    val (root, name, ev) = fresh()
    graft.GraftSql.sql(spark,
      s"ALTER TABLE $name RENAME COLUMN value TO amount").collect()
    val cloneRoot = root + "_cmclone"
    graft.GraftSql.sql(spark, s"CREATE TABLE ${name}_c SHALLOW CLONE " +
      s"$name LOCATION '$cloneRoot'").collect()
    val cl = DV.read(spark, cloneRoot)
    assert(cl.columns.contains("amount") && !cl.columns.contains("value"))
    assert(cl.agg(sum(col("amount").cast("decimal(28,4)"))).head()
        .getDecimal(0) ==
      ev.agg(sum(col("value").cast("decimal(28,4)"))).head().getDecimal(0))
    // and a clone-side rename diverges without touching the source
    DV.alterRenameColumn(spark, cloneRoot, "amount", "price"): Unit
    assert(DV.read(spark, cloneRoot).columns.contains("price"))
    assert(DV.read(spark, root).columns.contains("amount"))

    // DSv2 CREATE TABLE with a DEFAULT column: the catalog advertises
    // SUPPORT_COLUMN_DEFAULT_VALUE, the default rides the sentinel
    // schema, and an INSERT omitting the column resolves it
    spark.conf.set("spark.sql.catalog.graftdv",
      "graft.sources.GraftDvCatalog")
    val defRoot = java.nio.file.Files
      .createTempDirectory("graft_dvcm_def").toString + "/t"
    spark.sql(s"CREATE TABLE graftdv.`$defRoot` " +
      "(id BIGINT, tier STRING DEFAULT 'standard', day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO graftdv.`$defRoot` (id, day) " +
      "VALUES (1, 'd1'), (2, 'd1')")
    val rows = spark.sql(
      s"SELECT id, tier FROM graftdv.`$defRoot` ORDER BY id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("standard", "standard"),
      "the created-with-DEFAULT column must resolve for omitting INSERTs")
  }

  test("the DSv2 catalog resolves RENAME/DROP COLUMN through " +
      "TableChange; rejections are loud: partition columns, " +
      "constraint-referenced columns, duplicate targets, last column") {
    val (root, _, ev) = fresh()
    spark.conf.set("spark.sql.catalog.graftdv",
      "graft.sources.GraftDvCatalog")
    val t = s"graftdv.`$root`"
    // native DSv2 ALTER (no GraftSql wrapper at all)
    spark.sql(s"ALTER TABLE $t RENAME COLUMN props TO attrs").collect()
    assert(spark.sql(s"SELECT attrs FROM $t").count() == 300)
    spark.sql(s"ALTER TABLE $t DROP COLUMN attrs").collect()
    assert(!spark.table(t).columns.contains("attrs"))

    // a renamed column participates in skipping-relevant predicates
    // correctly (pushdown through the mapping projection)
    spark.sql(s"ALTER TABLE $t RENAME COLUMN value TO amount").collect()
    val one = ev.select("event_id").head().getLong(0)
    assert(spark.sql(
        s"SELECT amount FROM $t WHERE event_id = $one").count() == 1)

    // rejections
    val e1 = intercept[Exception](spark.sql(
      s"ALTER TABLE $t RENAME COLUMN day TO dt").collect())
    assert(e1.getMessage.contains("partition column"))
    val e2 = intercept[Exception](spark.sql(
      s"ALTER TABLE $t RENAME COLUMN amount TO user_id").collect())
    assert(e2.getMessage.contains("already exists"))
    DV.alterAddConstraint(spark, root, "uid_pos", "user_id >= 0")
    val e3 = intercept[Exception](spark.sql(
      s"ALTER TABLE $t DROP COLUMN user_id").collect())
    assert(e3.getMessage.contains("uid_pos"))
    // a column NOT referenced by the constraint still drops (the
    // reference check parses, not substring-matches)
    spark.sql(s"ALTER TABLE $t DROP COLUMN ts").collect()
    assert(!spark.table(t).columns.contains("ts"))
  }
}
