package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{AnnIndex, StreamErasure, Streaming}

/** Streaming right-to-be-forgotten ([[graft.streaming.StreamErasure]]):
  * after purging a key from a maintained streaming layout, the layout
  * must equal the batch rebuild over the PURGED corpus — immediately,
  * after an idempotent re-purge, and after the stream continues from
  * its checkpoint (the victim never resurrects). File-level leases:
  * only victim-bearing slices may be rewritten.
  */
class StreamErasureSpec extends SparkSpec {
  import spark.implicits._

  /** bucketdir → set of (slice/file, length) under a partitioned log. */
  private def leaves(root: String): Map[String, Set[(String, Long)]] = {
    def files(d: java.io.File): Seq[java.io.File] =
      if (d.isDirectory) d.listFiles().toSeq.flatMap(files) else Seq(d)
    new java.io.File(root).listFiles().toSeq
      .filter(d => d.isDirectory && d.getName.contains("="))
      .map(d => d.getName -> files(d)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath.stripPrefix(d.getPath), f.length())).toSet)
      .toMap
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("DV streaming erasure: overlapping redelivery and a full " +
      "checkpoint replay append nothing; masked read tracks the filter") {
    import graft.operators.{DeletionVectors => DV}
    val root = Files.createTempDirectory("graft_dvstream_tbl").toString
    val drop = Files.createTempDirectory("graft_dvstream_drop").toString
    val ckpt1 = Files.createTempDirectory("graft_dvstream_c1").toString
    val ckpt2 = Files.createTempDirectory("graft_dvstream_c2").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    DV.init(spark, ev, root, "day")

    def victims(mods: Seq[Int]) = ev.select("user_id").distinct()
      .filter(pmod(col("user_id"), lit(5)).isin(mods.map(Int.box): _*))
    def victimRows(mods: Seq[Int]) = ev.join(
      victims(mods), Seq("user_id"), "left_semi").count()

    def runOnce(ckpt: String): Unit = {
      val stream = spark.readStream
        .schema("user_id LONG")
        .option("recursiveFileLookup", "true").format("parquet").load(drop)
      val q = StreamErasure.startDvErasure(stream, root, "user_id",
        ckpt, Trigger.AvailableNow())
      try q.awaitTermination(120000) finally q.stop()
    }

    victims(Seq(0)).write.parquet(s"$drop/req_0")
    runOnce(ckpt1)
    assert(DV.dv(spark, root).count() == victimRows(Seq(0)))
    assert(DV.read(spark, root)
      .filter(pmod(col("user_id"), lit(5)) === 0).count() == 0)

    // second request OVERLAPS the first (redelivery of victims the
    // mask already hides): only the new class may add tombstones
    victims(Seq(0, 1)).write.parquet(s"$drop/req_1")
    runOnce(ckpt1)
    assert(DV.dv(spark, root).count() == victimRows(Seq(0, 1)),
      "overlapping redelivery must not double-mark")

    // full replay from a FRESH checkpoint (every request re-delivered
    // from scratch — the lost-checkpoint disaster case): structural
    // idempotency must absorb all of it
    runOnce(ckpt2)
    assert(DV.dv(spark, root).count() == victimRows(Seq(0, 1)),
      "full checkpoint replay must append zero tombstones")

    val got = DV.read(spark, root)
      .groupBy("event_type").count().orderBy("event_type")
      .collect().toSeq
    val want = ev.join(victims(Seq(0, 1)), Seq("user_id"), "left_anti")
      .groupBy("event_type").count().orderBy("event_type")
      .collect().toSeq
    assert(got == want)
  }

  test("SCD2 purge: state equals batch rebuild over purged corpus, across restart") {
    val drop = Files.createTempDirectory("graft_se_drop").toString
    val ckpt = Files.createTempDirectory("graft_se_ckpt").toString
    val acc = Files.createTempDirectory("graft_se_acc").toString
    val state = Files.createTempDirectory("graft_se_state").toString
    val all = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(all.schema)
        .option("recursiveFileLookup", "true").format("parquet").load(drop)
      val q = Streaming.maintainScd2(stream, ckpt, acc, state,
        Trigger.AvailableNow())
      try q.awaitTermination(120000) finally q.stop()
    }
    all.filter(col("event_id") % 3 === 0).write.parquet(s"$drop/chunk_0")
    runOnce()
    all.filter(col("event_id") % 3 === 1).write.parquet(s"$drop/chunk_1")
    runOnce()

    val victim = all.select(col("user_id")).distinct()
      .orderBy(col("user_id")).first().getLong(0)
    val vBucket = victim % graft.operators.Scd2.NBuckets
    val victims = Seq(victim).toDF("user_id")
    val logBefore = leaves(acc)

    val buckets = StreamErasure.eraseUserScd2(spark, acc, state, victims)
    assert(buckets == Seq(vBucket))

    // victim fully gone from both the log and the derived state
    assert(spark.read.parquet(acc)
      .filter(col("user_id") === victim).count() == 0, "victim in log")
    assert(spark.read.parquet(state)
      .filter(col("user_id") === victim).count() == 0, "victim in state")

    // state == batch rebuild over the purged corpus seen so far
    val purged1 = all.filter(col("event_id") % 3 <= 1)
      .filter(col("user_id") =!= victim)
    assert(rows(spark.read.parquet(state).drop("bucket")) ==
      rows(graft.operators.Scd2.history(purged1)),
      "purged state diverges from the batch rebuild")

    // only the victim's bucket was touched in the log
    val logAfter = leaves(acc)
    val untouched = (m: Map[String, Set[(String, Long)]]) =>
      m.view.filterKeys(_ != s"bucket=$vBucket").toMap
    assert(untouched(logBefore).nonEmpty)
    assert(untouched(logAfter) == untouched(logBefore),
      "purge rewrote slices in buckets with no victim rows")

    // idempotent: a re-purge changes no files anywhere
    val snapLog = leaves(acc)
    val snapState = leaves(state)
    StreamErasure.eraseUserScd2(spark, acc, state, victims): Unit
    assert(leaves(acc) == snapLog && leaves(state) == snapState,
      "re-purge was not a no-op")

    // checkpoint restart: the stream continues maintaining the purged
    // layout; the victim's history never resurrects
    all.filter(col("event_id") % 3 === 2)
      .filter(col("user_id") =!= victim) // the account is gone
      .write.parquet(s"$drop/chunk_2")
    runOnce()
    val purged2 = all.filter(col("user_id") =!= victim)
    assert(rows(spark.read.parquet(state).drop("bucket")) ==
      rows(graft.operators.Scd2.history(purged2)),
      "state diverges after post-purge checkpoint restart")
    assert(spark.read.parquet(acc)
      .filter(col("user_id") === victim).count() == 0,
      "victim resurrected after restart")
  }

  test("ANN purge: index equals frozen-codebook batch build over purged corpus") {
    val drop = Files.createTempDirectory("graft_sea_drop").toString
    val ckpt = Files.createTempDirectory("graft_sea_ckpt").toString
    val idx = Files.createTempDirectory("graft_sea_idx").toString
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(e.schema)
        .option("recursiveFileLookup", "true").format("parquet").load(drop)
      val q = AnnIndex.maintain(stream, ckpt, idx,
        trainOn = e, Trigger.AvailableNow(), compactAfter = 2)
      try q.awaitTermination(120000) finally q.stop()
    }
    e.filter(col("vec_id") % 3 === 0).write.parquet(s"$drop/chunk_0")
    runOnce()
    e.filter(col("vec_id") % 3 === 1).write.parquet(s"$drop/chunk_1")
    runOnce()

    val victim = 12L // in drop 0 (12 % 3 == 0)
    val victims = Seq(victim).toDF("vec_id")
    val before = leaves(idx)
    val affected = StreamErasure.eraseVectorAnn(spark, idx, victims)
    assert(affected.nonEmpty, "victim vector not found in the index")
    val vCells = affected.map(a => s"c_id=${a._1}").toSet

    // purged index == one-shot frozen-codebook build over the purged corpus
    val purged1 = e.filter(col("vec_id") % 3 <= 1)
      .filter(col("vec_id") =!= victim)
    assert(rows(AnnIndex.builtIndex(spark, idx)) ==
      rows(AnnIndex.batchTwin(spark, purged1, idx)),
      "purged index diverges from the batch build")

    // untouched inverted lists byte-identical
    val after = leaves(idx)
    val untouched = (m: Map[String, Set[(String, Long)]]) =>
      m.view.filterKeys(k => !vCells.contains(k)).toMap
    assert(untouched(before).nonEmpty)
    assert(untouched(after) == untouched(before),
      "purge rewrote inverted lists without victim codes")

    // idempotent re-purge: no file changes
    val snap = leaves(idx)
    StreamErasure.eraseVectorAnn(spark, idx, victims): Unit
    assert(leaves(idx) == snap, "re-purge was not a no-op")

    // checkpoint restart: maintenance continues over the purged lists
    e.filter(col("vec_id") % 3 === 2).write.parquet(s"$drop/chunk_2")
    runOnce()
    val purged2 = e.filter(col("vec_id") =!= victim)
    assert(rows(AnnIndex.builtIndex(spark, idx)) ==
      rows(AnnIndex.batchTwin(spark, purged2, idx)),
      "index diverges after post-purge checkpoint restart")
  }

  test("RAG index purge: all three layouts equal a frozen-codebook rebuild") {
    import graft.queries.RetrievalQueries
    // work on a COPY: ragServingIndex memoizes one on-disk index per
    // corpus fingerprint, shared JVM-wide — purging it in place would
    // poison every later rag query in this test JVM
    val (idx0, cent) = RetrievalQueries.ragServingIndex(spark, sf)
    val idx = Files.createTempDirectory("graft_rag_purge").toString + "/idx"
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(idx0).getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(idx0), fs,
      new org.apache.hadoop.fs.Path(idx), false, conf)
    val ce = RetrievalQueries.ragChunkFrame(spark, sf)
    // victims: every 37th chunk — multiple cells and postings buckets
    val victims = ce.select(col("cid")).filter(col("cid") % 37 === 0)
      .localCheckpoint(true)
    val victimCells = spark.read.parquet(idx)
      .join(victims, Seq("cid"), "left_semi")
      .select(col("c_id").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val before = leaves(idx)
    RetrievalQueries.ragForget(spark, idx, victims)
    // lease: inverted-list cells with no victim are byte-for-byte intact
    val after = leaves(idx)
    before.keys.filterNot(d => victimCells.contains(
      d.stripPrefix("c_id="))).foreach { d =>
      assert(after(d) == before(d), s"victimless cell $d was rewritten")
    }
    // frozen-codebook rebuild over the purged chunk set, through the
    // IDENTICAL write path, into a fresh dir
    val idx2 = Files.createTempDirectory("graft_rag_rebuild").toString + "/idx"
    RetrievalQueries.ragWriteIndex(spark,
      ce.join(victims, Seq("cid"), "left_anti"), cent, idx2)
    def layout(p: String) = (
      rows(spark.read.parquet(p)),
      rows(spark.read.parquet(s"$p/_postings")),
      rows(spark.read.parquet(s"$p/_stats")))
    assert(layout(idx) == layout(idx2),
      "purged index diverges from the frozen-codebook rebuild")
    // idempotence: re-purging the same victims touches nothing
    RetrievalQueries.ragForget(spark, idx, victims)
    assert(layout(idx) == layout(idx2), "re-purge changed the index")
  }
}
