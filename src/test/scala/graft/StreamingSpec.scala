package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.operators.Standardise
import graft.sources.PageStreamProvider
import graft.streaming.Streaming
import graft.streaming.Streaming.Evt

/** Structured Streaming semantics through MemoryStream: tumbling
  * windows close when the watermark passes, streaming dedup drops
  * repeats, sessionization assembles gap-separated sessions.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  test("windowed metrics: appended windows close as watermark advances") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Evt]
    val q = Streaming.windowedMetrics(in.toDF(), watermark = "1 minutes")
      .writeStream.format("memory").queryName("wm")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Evt(1, ts(0, 10), 1, "click", 1.50),
        Evt(2, ts(1, 20), 1, "click", 2.25),
        Evt(3, ts(6, 0), 2, "view", 4.00)) // advances watermark past window 0
      q.processAllAvailable()
      in.addData(Evt(4, ts(20, 0), 2, "view", 1.00)) // closes window 5-10
      q.processAllAvailable()
      val rows = spark.table("wm")
        .select("w_start", "event_type", "n_events", "value_sum")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1.getTime)
      assert(rows.length == 2)
      assert(rows(0) == (ts(0), "click", 2L, 3.75))
      assert(rows(1) == (ts(5), "view", 1L, 4.0))
    } finally q.stop()
  }

  test("stream-static dimension join enriches per micro-batch without join state") {
    implicit val sq = spark.sqlContext
    val dim = graft.sources.Tables.customer(spark, sf)
    val someKey = dim.select("c_custkey").head().getLong(0)
    val in = MemoryStream[Evt]
    val q = Streaming.dimEnriched(in.toDF(), dim)
      .writeStream.format("memory").queryName("dimj")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Evt(1, ts(0), someKey, "click", 1.0),
        Evt(2, ts(1), -42L, "view", 2.0)) // no dim row → UNKNOWN
      q.processAllAvailable()
      val bySeg = spark.table("dimj").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("segment")).toMap
      assert(bySeg(2L) == "UNKNOWN")
      assert(bySeg(1L) != "UNKNOWN") // real segment came from the dim table
    } finally q.stop()
  }

  test("KMV sketch aggregates distinct users per window in streaming state") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Evt]
    val q = Streaming.distinctUsersPerWindow(in.toDF(), watermark = "1 minutes")
      .writeStream.format("memory").queryName("kmvw")
      .outputMode(OutputMode.Append).start()
    try {
      // 30 distinct users in window 0 (< K=256 → sketch path is exact),
      // split across two micro-batches to force a state-store merge
      in.addData((1L to 17L).map(u => Evt(u, ts(0, u.toInt), u, "click", 1.0)): _*)
      q.processAllAvailable()
      in.addData((10L to 30L).map(u => Evt(100 + u, ts(1, u.toInt), u, "click", 1.0)): _*)
      q.processAllAvailable()
      in.addData(Evt(999, ts(20), 999, "view", 1.0)) // close window 0
      q.processAllAvailable()
      val rows = spark.table("kmvw").collect()
        .map(r => (r.getTimestamp(0), r.getDouble(1)))
      assert(rows.length == 1)
      assert(rows.head._2 == 30.0) // 30 distinct users, exact under K
    } finally q.stop()
  }

  test("streaming dedup drops repeated event ids") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Evt]
    val q = Streaming.dedupStream(in.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dd")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Evt(1, ts(0), 1, "click", 1.0),
        Evt(1, ts(0), 1, "click", 1.0), // dup in same batch
        Evt(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      in.addData(Evt(1, ts(0, 30), 1, "click", 1.0)) // dup across batches
      q.processAllAvailable()
      assert(spark.table("dd").count() == 2)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups retries with re-emitted timestamps") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Evt]
    val q = Streaming.dedupStreamWithinWatermark(in.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("ddw")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Evt(1, ts(0), 1, "click", 1.0),
        Evt(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      // the retry re-emits id 1 with a DIFFERENT event time — an
      // (id, ts) composite dedup key would pass it through; the
      // within-watermark form drops it on the id alone
      in.addData(Evt(1, ts(2, 30), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("ddw").count() == 2)
    } finally q.stop()
  }

  test("DSv2 page stream replays scrape pages through standardise → enrich (S1 end-to-end)") {
    val raw = spark.readStream.format(classOf[PageStreamProvider].getName)
      .option("pages", "3").option("rowsPerPage", "4").load()
    // the reference's standardise stage, verbatim on the stream
    val cleaned = raw
      .withColumn("title", Standardise.trimmed(col("title")))
      .select(col("page"), col("title"), col("author"), col("book_type"),
        Standardise.parsePrice(col("price")).as("price"),
        Standardise.extractRating(col("rating")).as("rating"),
        Standardise.parseCount(col("rating_count")).as("rating_count"))
    val q = cleaned.writeStream.format("memory").queryName("pages_clean")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("pages_clean")
      assert(rows.count() == 12)
      assert(rows.select("page").distinct().count() == 3)
      // pagesPerTrigger=1 (default): each page admitted in its own micro-batch
      assert(q.recentProgress.count(_.numInputRows > 0) == 3)
      // cleaning really ran: titles trimmed, "x.y out of 5 stars" parsed,
      // "not rated" (n % 7 == 0) is null
      assert(rows.filter(col("title").startsWith(" ")).count() == 0)
      assert(rows.filter(col("rating").isNull).count() == 2) // n ∈ {0, 7}
      assert(rows.schema("price").dataType.typeName == "double")
    } finally q.stop()

    // enrich on the same stream: per-author aggregate (complete mode)
    val enriched = cleaned.groupBy(col("author")).agg(
      count(lit(1)).as("book_count"), sum(col("rating_count")).as("total_rating_count"))
    val q2 = enriched.writeStream.format("memory").queryName("pages_enriched")
      .outputMode(OutputMode.Complete).start()
    try {
      q2.processAllAvailable()
      val agg = spark.table("pages_enriched")
      assert(agg.count() == 11) // authors A-0..A-10, 12 rows mod 11
      assert(agg.agg(sum("book_count")).head().getLong(0) == 12L)
    } finally q2.stop()
  }

  test("restart from checkpoint resumes mid-stream with no duplicate windows (§2.7 retries)") {
    implicit val sq = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val out = Files.createTempDirectory("graft_out").toString
    val in = MemoryStream[Evt]
    in.addData(
      Evt(1, ts(0, 10), 1, "click", 1.50),
      Evt(2, ts(1, 20), 1, "click", 2.25),
      Evt(3, ts(6, 0), 2, "view", 4.00)) // watermark → closes window 0-5
    val q1 = Streaming.startPipeline(in.toDF(), ckpt, out,
      trigger = Trigger.ProcessingTime(0))
    try q1.processAllAvailable() finally q1.stop() // "kill" mid-stream

    in.addData(Evt(4, ts(20, 0), 2, "view", 1.00)) // closes window 5-10
    val q2 = Streaming.startPipeline(in.toDF(), ckpt, out,
      trigger = Trigger.ProcessingTime(0))
    try q2.processAllAvailable() finally q2.stop()

    val all = spark.read.parquet(s"$out/batch_*")
    // exactly the two closed windows, each exactly once: the restarted
    // query resumed from the committed offset instead of replaying
    assert(all.count() == 2)
    assert(all.select("w_start", "event_type").distinct().count() == 2)
    val windows = all.select("w_start").as[Timestamp].collect().toSet
    assert(windows == Set(ts(0), ts(5)))
  }

  test("transformWithState: ValueState running counts survive across micro-batches") {
    implicit val sq = spark.sqlContext
    // arbitrary stateful processing v2 requires the RocksDB provider
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Evt]
    val q = Streaming.runningCounts(in.toDS())
      .toDF().writeStream.format("memory").queryName("twsc")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(
        Evt(1, ts(0, 10), 1, "click", 1.0),
        Evt(2, ts(0, 20), 1, "click", 1.0),
        Evt(3, ts(0, 30), 2, "view", 1.0))
      q.processAllAvailable()
      in.addData(
        Evt(4, ts(1, 0), 1, "click", 1.0),
        Evt(5, ts(1, 10), 3, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("twsc")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // batch 1: u1→2, u2→1; batch 2: u1→3 (state carried), u3→1
      assert(rows.sorted == Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)),
        s"unexpected running counts: $rows")
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream interval join matches views in the lookback window only") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Evt]
    val views = MemoryStream[Evt]
    val q = Streaming.intervalJoin(clicks.toDF(), views.toDF(), windowMinutes = 10)
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData(
        Evt(100, ts(0), 1, "view", 1.0), // 5 min before click → match
        Evt(101, ts(20), 1, "view", 1.0), // after the click → no match
        Evt(102, ts(1), 2, "view", 1.0)) // other user → no match
      clicks.addData(Evt(1, ts(5), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("ssjoin")
        .select("click_id", "view_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == Seq((1L, 100L)))
    } finally q.stop()
  }

  test("file-source pipeline end-to-end: parquet drop dir → windows → idempotent sink") {
    // the real-source form of the verify recipe: copy an events parquet
    // into a fresh drop directory, stream it through startPipeline with
    // AvailableNow, read back the batch dirs
    val drop = Files.createTempDirectory("graft_drop").toString
    val ckpt = Files.createTempDirectory("graft_fckpt").toString
    val out = Files.createTempDirectory("graft_fout").toString
    val src = new java.io.File("/root/testdata/sf0.001/events.parquet")
    java.nio.file.Files.copy(src.toPath,
      java.nio.file.Paths.get(drop, "events.parquet"))
    val stream = graft.sources.Tables.eventsStream(spark, drop)
    val q = Streaming.startPipeline(stream, ckpt, out, Trigger.AvailableNow())
    try { q.awaitTermination(120000) } finally q.stop()
    val streamed = spark.read.parquet(s"$out/batch_*")
    // batch equivalent over the same file: every window the stream
    // APPENDED must match; the final window stays open (watermark never
    // passes it in a finite stream), hence the -1
    val batch = Streaming.windowedMetrics(
      graft.sources.Tables.events(spark, "/root/testdata/sf0.001"))
    val want = batch.count() - 1
    assert(streamed.count() == want, s"streamed ${streamed.count()} vs batch-1 $want")
    val joined = streamed.alias("s").join(batch.alias("b"),
      Seq("w_start", "event_type"))
      .filter(col("s.n_events") =!= col("b.n_events") ||
        col("s.value_sum") =!= col("b.value_sum"))
    assert(joined.count() == 0, "streamed window values diverge from batch plan")
  }

  test("the whole reference pipeline, streaming: scrape pages → standardise → enrich → RDBMS") {
    // dag.py end-to-end on Spark primitives: PageStream is the paginated
    // scrape (S1), the select is standardise (P2-P7), foreachBatch
    // appends cleaned books (K2) and idempotently recomputes the
    // enriched aggregate table (K3) — both over JDBC like the reference.
    val url = "jdbc:derby:memory:graftpipe;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    val raw = spark.readStream.format(classOf[PageStreamProvider].getName)
      .option("pages", "3").option("rowsPerPage", "8").load()
    val cleaned = raw
      .withColumn("title", Standardise.trimmed(col("title")))
      .select(col("page"), col("title"), col("author"),
        Standardise.parsePrice(col("price")).as("price"),
        Standardise.extractRating(col("rating")).as("rating"),
        Standardise.parseCount(col("rating_count")).as("rating_count"))
    val q = cleaned.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // per-run dedup happens on the BATCH frame (the reference's
        // seen-set is per-run too); cross-run state lives in the DB
        val deduped = Standardise.dedupFirst(batch,
          Seq(col("title")), Seq(col("page"), col("author")))
        graft.sources.JdbcSink.write(deduped, url, "books_stream", driver,
          mode = org.apache.spark.sql.SaveMode.Append,
          columnTypes = Some("title VARCHAR(64), author VARCHAR(32)"))
        // K3: full idempotent recompute from the sink (rerun-safe)
        val enriched = graft.sources.JdbcSink.read(spark, url, "books_stream", driver)
          .groupBy(col("author"))
          .agg(count(lit(1)).as("book_count"),
            sum(col("rating_count")).as("total_rating_count"))
        graft.sources.JdbcSink.write(enriched, url, "enriched_stream", driver,
          columnTypes = Some("author VARCHAR(32)"))
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val books = graft.sources.JdbcSink.read(spark, url, "books_stream", driver)
    assert(books.count() == 24) // 3 pages × 8 rows, all titles distinct
    assert(books.filter(col("title").startsWith(" ")).count() == 0)
    val enriched = graft.sources.JdbcSink.read(spark, url, "enriched_stream", driver)
    assert(enriched.count() == 11) // authors A-0..A-10
    assert(enriched.agg(sum(col("book_count"))).head().getLong(0) == 24L)
  }

  test("sessionize closes sessions on event-time gaps") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Evt]
    val events = in.toDF().withWatermark("ts", "0 seconds").as[Evt]
    val q = Streaming.sessionize(events, gapMs = 120000L) // 2-min gap
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Evt(1, ts(0), 1, "click", 1.0),
        Evt(2, ts(1), 1, "click", 1.0), // same session (1-min gap)
        Evt(3, ts(10), 1, "click", 1.0)) // new session after 9-min gap
      q.processAllAvailable()
      in.addData(Evt(9, ts(30), 9, "click", 1.0)) // watermark → times out open state
      q.processAllAvailable()
      in.addData(Evt(10, ts(59), 9, "click", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sess").as[Streaming.Session]
        .collect().filter(_.user_id == 1L).sortBy(_.start.getTime)
      assert(sessions.length == 2)
      assert(sessions(0).n_events == 2 && sessions(0).start == ts(0) && sessions(0).end == ts(1))
      assert(sessions(1).n_events == 1 && sessions(1).start == ts(10))
    } finally q.stop()
  }

  test("streaming curation end-to-end: file drop → dedup → quality → mix report = batch twin") {
    val drop = Files.createTempDirectory("graft_cdrop").toString
    val ckpt = Files.createTempDirectory("graft_cckpt").toString
    val out = Files.createTempDirectory("graft_cout").toString
    java.nio.file.Files.copy(
      new java.io.File("/root/testdata/sf0.001/documents.parquet").toPath,
      java.nio.file.Paths.get(drop, "documents.parquet"))
    val stream = Streaming.withDocTime(
      graft.sources.Tables.documentsStream(spark, drop))
    val q = Streaming.startCurationPipeline(stream, ckpt, out, Trigger.AvailableNow())
    try { q.awaitTermination(120000) } finally q.stop()
    val streamed = spark.read.parquet(s"$out/batch_*")
    val batch = Streaming.curatedMix(Streaming.withDocTime(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")))
    // Append-mode semantics: only windows the final watermark closed
    // (watermark >= window end) were emitted
    val wmFinal = Streaming.DocEpoch + 499 * 7 - 600
    val want = batch.filter(col("w_start") + 300 <= wmFinal)
    assert(streamed.count() == want.count() && want.count() > 0,
      s"streamed ${streamed.count()} vs closed-window batch ${want.count()}")
    val diverging = streamed.alias("s").join(want.alias("b"), Seq("w_start", "source"))
      .filter(col("s.n_docs") =!= col("b.n_docs") ||
        col("s.chars_total") =!= col("b.chars_total"))
    assert(diverging.count() == 0, "streamed mix report diverges from batch twin")
  }

  test("curation restart from checkpoint: cross-run retry burst deduped, no double counts") {
    val drop = Files.createTempDirectory("graft_rdrop").toString
    val ckpt = Files.createTempDirectory("graft_rckpt").toString
    val out = Files.createTempDirectory("graft_rout").toString
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    // land a single parquet FILE (not a directory) in the drop zone,
    // the shape a file-stream source expects
    def land(df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
      val tmp = Files.createTempDirectory("graft_land").toString
      df.repartition(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(dest))
    }
    land(docs.filter(col("doc_id") < 300), s"$drop/a.parquet")
    val stream = Streaming.withDocTime(
      graft.sources.Tables.documentsStream(spark, drop))
    val q1 = Streaming.startCurationPipeline(stream, ckpt, out, Trigger.AvailableNow())
    try { q1.awaitTermination(120000) } finally q1.stop() // "kill" mid-stream

    // second landing: the remaining corpus PLUS a retry burst that
    // re-sends docs 280-299 verbatim (their dedup state is alive: run-1
    // watermark 1493 < their expiry ts+delay = 2560..2693)
    land(docs.filter(col("doc_id") >= 300)
      .unionByName(docs.filter(col("doc_id") >= 280 && col("doc_id") < 300)),
      s"$drop/b.parquet")
    val stream2 = Streaming.withDocTime(
      graft.sources.Tables.documentsStream(spark, drop))
    val q2 = Streaming.startCurationPipeline(stream2, ckpt, out, Trigger.AvailableNow())
    try { q2.awaitTermination(120000) } finally q2.stop()

    val streamed = spark.read.parquet(s"$out/batch_*")
    // every (window, source) row exactly once across both runs
    assert(streamed.groupBy("w_start", "source").count()
      .filter(col("count") > 1).count() == 0, "restart duplicated report rows")
    // and the values equal the batch twin over the UNIQUE corpus: the
    // retry burst contributed nothing (deduped), the restart replayed
    // nothing (checkpoint)
    val batch = Streaming.curatedMix(Streaming.withDocTime(docs))
    val wmFinal = Streaming.DocEpoch + 499 * 7 - 600
    val want = batch.filter(col("w_start") + 300 <= wmFinal)
    assert(streamed.count() == want.count(),
      s"streamed ${streamed.count()} vs closed-window batch ${want.count()}")
    val diverging = streamed.alias("s").join(want.alias("b"), Seq("w_start", "source"))
      .filter(col("s.n_docs") =!= col("b.n_docs") ||
        col("s.chars_total") =!= col("b.chars_total"))
    assert(diverging.count() == 0,
      "restarted curation stream diverges from unique-corpus batch twin")
  }

  test("incremental SCD2 maintenance equals the batch rebuild; untouched buckets untouched") {
    // three sequential change-file drops; after each AvailableNow run
    // the maintained state must equal Scd2.history over all changes
    // seen so far — incremental view maintenance, checkpoint-continued
    val drop = Files.createTempDirectory("graft_scd2drop").toString
    val ckpt = Files.createTempDirectory("graft_scd2ckpt").toString
    val acc = Files.createTempDirectory("graft_scd2acc").toString
    val state = Files.createTempDirectory("graft_scd2state").toString
    val all = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))

    def drops(i: Int): Unit = // thirds by event_id: arbitrary arrival slices
      all.filter(col("event_id") % 3 === i)
        .write.parquet(s"$drop/chunk_$i")

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(all.schema)
        .option("recursiveFileLookup", "true").format("parquet").load(drop)
      val q = Streaming.maintainScd2(stream, ckpt, acc, state,
        Trigger.AvailableNow())
      try q.awaitTermination(120000) finally q.stop()
    }

    def stateRows() = spark.read.parquet(state).drop("bucket")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

    def wantRows(upTo: Int) = graft.operators.Scd2.history(
      all.filter(col("event_id") % 3 <= upTo))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

    drops(0); runOnce()
    assert(stateRows() == wantRows(0), "state after drop 1 diverges")
    drops(1); runOnce()
    assert(stateRows() == wantRows(1), "state after drop 2 diverges")
    drops(2); runOnce()
    assert(stateRows() == wantRows(2), "state after drop 3 diverges")

    // dynamic-overwrite proof: a drop touching ONE user must rewrite
    // only that user's bucket partition — every other bucket keeps the
    // IDENTICAL file set (names + lengths; dynamic overwrite always
    // emits fresh file names, so an untouched name set proves no
    // rewrite — robust against coarse mtime granularity)
    val theUser = 7L
    val theBucket = theUser % graft.operators.Scd2.NBuckets
    def bucketFiles(dir: String): Map[String, Set[(String, Long)]] =
      new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(d => d.getName ->
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.length)).toSet)
        .toMap
    val before = bucketFiles(state)
    import spark.implicits._
    val extra = Seq((1000000L, new java.sql.Timestamp(1735689600000L),
      theUser, "late_change", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    extra.write.parquet(s"$drop/chunk_extra")
    runOnce()
    val after = bucketFiles(state)
    before.foreach { case (b, files) =>
      if (b != s"bucket=$theBucket")
        assert(after(b) == files, s"untouched $b was rewritten")
    }
    assert(after(s"bucket=$theBucket") != before(s"bucket=$theBucket"),
      "touched bucket not rewritten")
    val wantFinal = graft.operators.Scd2.history(all.unionByName(extra))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(stateRows() == wantFinal, "state after targeted drop diverges")

    // read-scoping proof: the 1-user rebuild read ONLY that user's
    // bucket directory of the change log — _last_read (the operator's
    // per-batch telemetry) lists the exact files the rebuild scanned
    val lastRead = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(acc, "_last_read"))).split("\n").filter(_.nonEmpty)
    assert(lastRead.nonEmpty, "rebuild recorded no files")
    assert(lastRead.forall(_.contains(s"/bucket=$theBucket/")),
      s"1-user rebuild read outside bucket=$theBucket: " +
        lastRead.filterNot(_.contains(s"/bucket=$theBucket/")).mkString(", "))
    // and the untouched buckets' log slices exist but were not listed
    assert(new java.io.File(acc).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("bucket=")) > 1,
      "log should span multiple buckets for the scoping proof to bite")
  }

  test("SCD2 change-log compaction bounds slices per bucket; state invariant") {
    // many 1-user batches against a tiny compactAfter: slice count per
    // bucket must stay bounded and the maintained state must remain a
    // pure function of the accumulated (deduped) log
    val drop = Files.createTempDirectory("graft_scd2cdrop").toString
    val ckpt = Files.createTempDirectory("graft_scd2cckpt").toString
    val acc = Files.createTempDirectory("graft_scd2cacc").toString
    val state = Files.createTempDirectory("graft_scd2cstate").toString
    import spark.implicits._
    val user = 3L // all drops hit bucket 3
    def change(i: Int) = Seq((i.toLong, new java.sql.Timestamp(1700000000000L + i * 60000L),
      user, s"state_$i", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(change(0).schema)
        .option("recursiveFileLookup", "true").format("parquet").load(drop)
      val q = Streaming.maintainScd2(stream, ckpt, acc, state,
        Trigger.AvailableNow(), compactAfter = 2)
      try q.awaitTermination(120000) finally q.stop()
    }
    (0 until 7).foreach { i => change(i).write.parquet(s"$drop/chunk_$i"); runOnce() }
    val bucketDir = new java.io.File(s"$acc/bucket=$user")
    val slices = bucketDir.listFiles().filter(_.getName.startsWith("slice=")).map(_.getName)
    assert(slices.length <= 3, // compactAfter + the post-compaction append
      s"compaction failed to bound slices: ${slices.mkString(", ")}")
    assert(slices.exists(_.startsWith("slice=c")), "no compacted slice present")
    val got = spark.read.parquet(state).drop("bucket")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val want = graft.operators.Scd2.history(
      (0 until 7).map(change).reduce(_ unionByName _))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(got == want, "state diverges from batch rebuild after compaction")
  }

  test("ANN index maintenance: incremental adds equal the batch-built index") {
    // the FAISS lifecycle on Structured Streaming: codebooks trained
    // once and frozen, then per-batch coarse-assign + PQ-encode adds,
    // appended to (c_id, slice)-partitioned inverted lists. After
    // every drop the maintained index must equal the one-shot build
    // over the accumulated corpus with the same frozen codebooks —
    // checkpoint-continued across runs, with aggressive compaction.
    val drop = Files.createTempDirectory("graft_annidrop").toString
    val ckpt = Files.createTempDirectory("graft_annickpt").toString
    val idx = Files.createTempDirectory("graft_anniidx").toString
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(e.schema)
        .option("recursiveFileLookup", "true").format("parquet").load(drop)
      val q = graft.streaming.AnnIndex.maintain(stream, ckpt, idx,
        trainOn = e, Trigger.AvailableNow(), compactAfter = 2)
      try q.awaitTermination(120000) finally q.stop()
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    for (i <- 0 to 2) {
      e.filter(col("vec_id") % 3 === i).write.parquet(s"$drop/chunk_$i")
      runOnce()
      val got = rows(graft.streaming.AnnIndex.builtIndex(spark, idx))
      val want = rows(graft.streaming.AnnIndex.batchTwin(spark,
        e.filter(col("vec_id") % 3 <= i), idx))
      assert(got.nonEmpty && got == want, s"index diverges after drop $i")
    }
    // every corpus vector indexed exactly once, PQ_M codes each
    val m = graft.sources.Tables.embeddings(spark, sf).count()
    assert(graft.streaming.AnnIndex.builtIndex(spark, idx).count() == m * 8)
    // compaction kept every inverted list's slice count bounded
    new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("c_id=")).foreach { d =>
        val slices = d.listFiles().filter(_.getName.startsWith("slice="))
        assert(slices.length <= 3,
          s"${d.getName}: ${slices.length} slices survived compactAfter=2")
      }
  }

  test("SCD2 log refuses a fresh checkpoint against an existing accDir") {
    val drop = Files.createTempDirectory("graft_scd2gdrop").toString
    val ckpt1 = Files.createTempDirectory("graft_scd2gckpt1").toString
    val ckpt2 = Files.createTempDirectory("graft_scd2gckpt2").toString
    val acc = Files.createTempDirectory("graft_scd2gacc").toString
    val state = Files.createTempDirectory("graft_scd2gstate").toString
    import spark.implicits._
    val rows = Seq((1L, new java.sql.Timestamp(1700000000000L), 5L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.parquet(s"$drop/chunk_0")
    def runWith(ckpt: String): Unit = {
      val stream = spark.readStream.schema(rows.schema)
        .option("recursiveFileLookup", "true").format("parquet").load(drop)
      val q = Streaming.maintainScd2(stream, ckpt, acc, state, Trigger.AvailableNow())
      try q.awaitTermination(120000) finally q.stop()
    }
    runWith(ckpt1) // seeds acc with ckpt1's stream id
    // same checkpoint again: fine (restart of the same lineage)
    rows.write.parquet(s"$drop/chunk_1")
    runWith(ckpt1)
    // FRESH checkpoint, existing log: batch ids restart at 0 and would
    // clobber the log's early slices — must fail fast instead
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runWith(ckpt2)
    }
    def rootChain(t: Throwable): List[Throwable] =
      t :: Option(t.getCause).map(rootChain).getOrElse(Nil)
    assert(rootChain(err).exists(_.isInstanceOf[IllegalStateException]),
      s"expected IllegalStateException in cause chain, got $err")
  }

  test("versioned metric snapshots: one committed version per batch, cumulative, restart-safe") {
    import graft.operators.Snapshots
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("graft_snapstream").toString
    val ckpt = s"$dir/ckpt"
    val table = s"$dir/metrics"
    val in = MemoryStream[Evt]
    def twin(evts: Seq[Evt]) = evts.groupBy(_.event_type).map {
      case (t, es) => (t, es.size.toLong,
        es.map(e => BigDecimal(e.value).setScale(4)).sum)
    }.toSet
    def latest() = Snapshots.readLatest(spark, table)
      .collect().map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDecimal(2)).setScale(4))).toSet
    val b1 = Seq(Evt(1, ts(0, 10), 1, "click", 1.50),
      Evt(2, ts(0, 20), 2, "view", 2.25))
    val b2 = Seq(Evt(3, ts(1, 0), 1, "click", 4.00))
    val q = Streaming.publishVersionedMetrics(in.toDF(), ckpt, table,
      Trigger.ProcessingTime(0L))
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      assert(Snapshots.latestVersion(spark, table).contains(1L))
      assert(latest() == twin(b1))
      in.addData(b2: _*)
      q.processAllAvailable()
      assert(Snapshots.latestVersion(spark, table).contains(2L))
      assert(latest() == twin(b1 ++ b2), "merge drifted from batch twin")
    } finally q.stop()
    // restart from the same checkpoint: batch ids (and so versions)
    // continue; the committed-version check makes a replayed batch a
    // no-op, so no double counting is possible
    val b3 = Seq(Evt(4, ts(2, 0), 3, "view", 0.75))
    val q2 = Streaming.publishVersionedMetrics(in.toDF(), ckpt, table,
      Trigger.ProcessingTime(0L))
    try {
      in.addData(b3: _*)
      q2.processAllAvailable()
      assert(Snapshots.latestVersion(spark, table).contains(3L))
      assert(latest() == twin(b1 ++ b2 ++ b3))
      // time travel: version 1 still serves batch-1-boundary metrics
      assert(Snapshots.readVersion(spark, table, 1).count() == 2)
    } finally q2.stop()
  }

  test("drift monitor: incremental counts == batch twin per version, report == text_kl_drift") {
    import graft.operators.{Drift, Snapshots}
    val sfDir = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft_drift").toString
    val (drop, ckpt, table) = (s"$dir/drop", s"$dir/ckpt", s"$dir/counts")
    new java.io.File(drop).mkdirs()
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 =!= 0)
    def key(r: org.apache.spark.sql.Row) = r.toString
    def countsOf(df: org.apache.spark.sql.DataFrame) =
      Drift.docCounts(df).collect().map(key).toSet

    // the file source reads a FLAT directory — stage each slice and
    // move its part-file in as a single drop
    def dropSlice(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = s"$dir/stage_$name"
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(drop, s"$name.parquet"))
    }

    dropSlice(half1, "d1")
    val q = Streaming.monitorDrift(
      graft.sources.Tables.documentsStream(spark, drop), ckpt, table,
      Trigger.AvailableNow())
    try q.awaitTermination(120000) finally q.stop()
    assert(Snapshots.latestVersion(spark, table).contains(1L))
    assert(Snapshots.readLatest(spark, table).collect().map(key).toSet
      == countsOf(half1), "v1 counts drifted from the half-corpus twin")

    // second drop lands under a RESTARTED query (same checkpoint):
    // exactly-once across the restart AND incremental merge correctness
    dropSlice(half2, "d2")
    val q2 = Streaming.monitorDrift(
      graft.sources.Tables.documentsStream(spark, drop), ckpt, table,
      Trigger.AvailableNow())
    try q2.awaitTermination(120000) finally q2.stop()
    assert(Snapshots.latestVersion(spark, table).contains(2L))
    assert(Snapshots.readLatest(spark, table).collect().map(key).toSet
      == countsOf(docs), "merged counts != full-corpus recompute")

    // the servable report equals the ORACLE-HASH-GATED batch query
    // over the same accumulated corpus — the streaming path inherits
    // the DuckDB gate transitively
    val want = graft.queries.TextQueries.klDrift(spark, sfDir)
      .collect().map(key)
    val got = Streaming.latestDriftReport(spark, table).collect().map(key)
    assert(got.sameElements(want), "drift report diverges from text_kl_drift")

    // time travel: v1 still serves the half-corpus drift history
    assert(Drift.klFromCounts(Snapshots.readVersion(spark, table, 1))
      .collect().map(key).sameElements(
        Drift.klFromCounts(Drift.docCounts(half1)).collect().map(key)))
  }

  test("snapshot sinks with retention: version count stays bounded, replay-safe") {
    import graft.operators.Snapshots
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("graft_retain").toString
    val (ckpt, table) = (s"$dir/ckpt", s"$dir/metrics")
    val in = MemoryStream[Evt]
    // three batches under keepVersions=1: after each commit only the
    // latest version may remain — unbounded one-version-per-batch
    // growth is the SCD2-change-log flaw class, preempted here
    val q = Streaming.publishVersionedMetrics(in.toDF(), ckpt, table,
      Trigger.ProcessingTime(0L), keepVersions = 1)
    try {
      var expect = 0L
      for (b <- 1 to 3) {
        in.addData(Evt(b, ts(b, 0), b, "click", 1.0))
        q.processAllAvailable()
        expect += 1
        assert(Snapshots.committedVersions(spark, table) == Seq(b.toLong),
          s"retention left more than the latest version after batch $b")
        // the merged state is still cumulative — vacuum dropped
        // HISTORY, not the running totals
        assert(Snapshots.readLatest(spark, table)
          .agg(org.apache.spark.sql.functions.sum("n_events"))
          .head.getLong(0) == expect)
      }
    } finally q.stop()
    // restart from the checkpoint: the next batch claims v4 even
    // though v1-v3 data is vacuumed (version = batchId+1 is
    // checkpoint-derived, not directory-derived)
    val q2 = Streaming.publishVersionedMetrics(in.toDF(), ckpt, table,
      Trigger.ProcessingTime(0L), keepVersions = 1)
    try {
      in.addData(Evt(9, ts(9, 0), 9, "view", 2.0))
      q2.processAllAvailable()
      assert(Snapshots.committedVersions(spark, table) == Seq(4L))
      assert(Snapshots.readLatest(spark, table).count() == 2) // click+view
    } finally q2.stop()
  }

  test("RAG index maintenance: incremental adds equal the batch derivation") {
    // the AnnIndex lifecycle on the rag_pipeline artifact: frozen
    // centroids, then per-batch chunk+embed+assign appends to the
    // inverted lists, the postings sidecar, AND the stats partials.
    // After every drop all three maintained layouts must equal the
    // batch derivation over the accumulated corpus.
    val drop = Files.createTempDirectory("graft_ragm_drop").toString
    val ckpt = Files.createTempDirectory("graft_ragm_ckpt").toString
    val idx = Files.createTempDirectory("graft_ragm_idx").toString + "/idx"
    val d = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(d.schema)
        .option("recursiveFileLookup", "true").format("parquet").load(drop)
      val q = graft.streaming.RagIndex.maintain(stream, ckpt, idx,
        trainOn = d, Trigger.AvailableNow(), compactAfter = 2)
      try q.awaitTermination(180000) finally q.stop()
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    for (i <- 0 to 2) {
      d.filter(col("doc_id") % 3 === i).write.parquet(s"$drop/chunk_$i")
      runOnce()
      val acc = d.filter(col("doc_id") % 3 <= i)
      val (lw, pw, sw) = graft.streaming.RagIndex.batchTwin(spark, acc, idx)
      val gotLists = rows(graft.streaming.RagIndex.builtLists(spark, idx))
      assert(gotLists.nonEmpty && gotLists == rows(lw),
        s"inverted lists diverge after drop $i")
      assert(rows(graft.streaming.RagIndex.builtPostings(spark, idx))
        == rows(pw), s"postings diverge after drop $i")
      assert(rows(graft.streaming.RagIndex.builtStats(spark, idx))
        == rows(sw), s"stats diverge after drop $i")
    }
    // compaction kept the slice count bounded in ALL THREE layouts
    for ((dir, pfx) <- Seq((idx, "c_id="), (s"$idx/_postings", "pb="),
        (s"$idx/_stats", "p="))) {
      new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith(pfx)).foreach { b =>
          val slices = b.listFiles().filter(_.getName.startsWith("slice="))
          assert(slices.length <= 3,
            s"${b.getName}: ${slices.length} slices survived compactAfter=2")
        }
    }
    // chunk purge composes with the SLICED layouts (the batch-index
    // form is ragForget's job; this is the maintained-index form)
    val victims = graft.streaming.RagIndex.builtLists(spark, idx)
      .select(col("cid")).filter(col("cid") % 53 === 0)
      .localCheckpoint(true)
    assert(victims.count() > 0)
    graft.streaming.StreamErasure.eraseChunksRag(spark, idx, victims)
    assert(graft.streaming.RagIndex.builtLists(spark, idx)
      .join(victims, Seq("cid"), "left_semi").count() == 0)
    assert(graft.streaming.RagIndex.builtPostings(spark, idx)
      .join(victims, Seq("cid"), "left_semi").count() == 0)
    val st = graft.streaming.RagIndex.builtStats(spark, idx).collect().head
    assert(st.getAs[Double]("n") ==
      graft.streaming.RagIndex.builtLists(spark, idx).count().toDouble,
      "stats were not re-derived from the purged lists")
    // idempotent re-purge
    graft.streaming.StreamErasure.eraseChunksRag(spark, idx, victims)
    assert(graft.streaming.RagIndex.builtStats(spark, idx).collect().head == st)
    // the stream keeps maintaining the purged index from its
    // checkpoint; the victims never resurrect
    d.filter(col("doc_id") % 3 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .write.parquet(s"$drop/chunk_3")
    runOnce()
    assert(graft.streaming.RagIndex.builtLists(spark, idx)
      .join(victims, Seq("cid"), "left_semi").count() == 0,
      "purged chunks resurrected after stream continuation")
    assert(graft.streaming.RagIndex.builtLists(spark, idx)
      .filter(col("cid") >= 1000000L * 10000).count() > 0,
      "post-purge batch was not indexed")
  }
}
