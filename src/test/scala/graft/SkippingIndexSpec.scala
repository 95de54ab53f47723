package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.{BloomMath, GraftFunctions}
import graft.operators.SkippingIndex

/** File-skipping sidecar index: no false negatives end to end (the
  * aggregator-built filters probed through the REAL codegen path),
  * a deterministic skipping ratio on an adversarial layout, measured
  * false-positive rate under the design bound, and exactness of the
  * final result against the plain filtered frame.
  */
class SkippingIndexSpec extends SparkSpec {
  import spark.implicits._

  private def buildSink(nFiles: Int): (String, String) = {
    val data = Files.createTempDirectory("graft_ipl_data").toString
    val idx = Files.createTempDirectory("graft_ipl_idx").toString
    // per-row scatter: each order's lines land in different files, so
    // the probe key is maximally unclustered (and every bucket is
    // non-empty at sf0.001, where low-cardinality columns like
    // l_suppkey would fill only ~10 buckets)
    graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
      .repartition(nFiles, xxhash64(col("l_orderkey"), col("l_linenumber")))
      .write.mode("overwrite").parquet(data)
    SkippingIndex.build(spark, data, idx, "l_orderkey")
    (data, idx)
  }

  test("lookup equals the plain IN-list filter — bloom false positives " +
      "never surface, members never vanish") {
    val (data, idx) = buildSink(16)
    val keys = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().orderBy("l_orderkey")
      .limit(40).as[Long].collect().toSeq
    val (res, cands, total) = SkippingIndex.lookup(
      spark, data, idx, "l_orderkey", keys)
    assert(total == 16)
    assert(cands.nonEmpty)
    val got = res.select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    val want = spark.read.parquet(data)
      .filter(col("l_orderkey").isin(keys: _*))
      .select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    assert(got == want)
  }

  test("adversarial layout: unclustered key, 64 files, 3 probe keys — " +
      "the sidecar skips most of the sink deterministically") {
    val (data, idx) = buildSink(64)
    val keys = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().orderBy("l_orderkey")
      .limit(3).as[Long].collect().toSeq
    val (res, cands, total) = SkippingIndex.lookup(
      spark, data, idx, "l_orderkey", keys)
    assert(total == 64)
    // 3 keys × ~4 line rows scattered by supplier hash: ≤12 true
    // files + fpp·64 expected candidates; 25% is a loose determinism
    // bound (the exact count is data-dependent but reproducible)
    assert(cands.length <= 16,
      s"expected ≤16/64 candidate files, got ${cands.length}")
    assert(res.count() ==
      spark.read.parquet(data).filter(col("l_orderkey").isin(keys: _*)).count())
  }

  test("absent keys return zero rows (false positives filtered in-file)") {
    val (data, idx) = buildSink(8)
    val (res, _, _) = SkippingIndex.lookup(
      spark, data, idx, "l_orderkey", Seq(-1L, -999999L, Long.MaxValue))
    assert(res.count() == 0)
  }

  test("candidates is ONE Spark job: the sidecar size report rides " +
      "the probe scan instead of a second full pass") {
    val (data, idx) = buildSink(8)
    val keys = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().orderBy("l_orderkey")
      .limit(3).as[Long].collect().toSeq
    // count ACTIONS (query executions), not Spark jobs — AQE legally
    // splits one action into a job per stage; the regression guarded
    // here is the old collect()+count() SECOND full sidecar pass
    val actions = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          ns: Long): Unit = { actions.incrementAndGet(); () }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val (cands, total) = SkippingIndex.candidates(spark, idx, keys)
      assert(total == 8 && cands.nonEmpty)
      // listener events are bus-fed: wait for the first, then give a
      // would-be second action a beat to surface
      val deadline = System.currentTimeMillis + 10000
      while (actions.get < 1 && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      Thread.sleep(300)
      assert(actions.get == 1,
        s"probe ran ${actions.get} actions, expected exactly 1")
    } finally spark.listenerManager.unregister(listener)
    val _ = data
  }

  test("aggregator bits and codegen probe agree: every inserted key " +
      "hits; non-member fp rate stays under the design bound") {
    // build one filter via the Aggregator over a known key set, then
    // probe member and non-member keys through the DataFrame filter
    // path (whole-stage codegen — the generated-Java twin of
    // BloomMath must place bits identically or members vanish)
    val members = (0L until 5000L).map(_ * 7919L)
    val bloomAgg = org.apache.spark.sql.functions.udaf(
      new SkippingIndex.BloomBuildAgg(1 << 17),
      org.apache.spark.sql.Encoders.scalaLong)
    val bloom = members.toDF("k").agg(bloomAgg(col("k")).as("b"))
      .select("b").as[Array[Byte]].head()

    val memberHits = members.toDF("k")
      .withColumn("b", lit(bloom))
      .filter(GraftFunctions.bloomHitsAny(spark, col("b"), array(col("k"))))
      .count()
    assert(memberHits == members.size.toLong, "bloom false negative")

    val nonMembers = (1L to 20000L).map(_ * 7919L + 3L)
    val fp = nonMembers.toDF("k")
      .withColumn("b", lit(bloom))
      .filter(GraftFunctions.bloomHitsAny(spark, col("b"), array(col("k"))))
      .count()
    // n=5000, m=131072 bits, k=4 → theoretical fpp ≈ 0.031%; assert
    // an order of magnitude of slack
    assert(fp.toDouble / nonMembers.size < 0.01,
      s"fp rate ${fp.toDouble / nonMembers.size} over design bound")

    // and the interpreted JVM path agrees with codegen bit placement
    assert(members.forall(BloomMath.mightContain(bloom, _)))
  }

  test("auto index refresh: a CDC stream's appended files cannot " +
      "decay the sidecar past the stale bound — the maintenance slot " +
      "refreshes incrementally and the transparent tier stays selective") {
    import graft.operators.{DeletionVectors => DV, Snapshots}
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files
      .createTempDirectory("graft_idxauto").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(400)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .localCheckpoint()
    DV.init(spark, ev, root, "day")
    DV.refreshIndex(spark, root, "event_id"): Unit
    val it = DV.indexTable(root)
    val v0 = Snapshots.latestVersion(spark, it).get
    // a fresh sidecar is not stale — the trigger must not churn
    assert(!DV.autoRefreshIndex(spark, root))
    assert(Snapshots.latestVersion(spark, it).get == v0)
    // a CDC batch appending well past the stale bound (new files in
    // every partition dir) rides the stream's maintenance slot
    val ins = ev.withColumn("event_id", col("event_id") + 9000000L)
    assert(DV.applyCdcBatch(spark, root, "day", "event_id", ins, 0L,
      autoCompactBlobsAt = 0, autoPackFilesAt = 0))
    val v1 = Snapshots.latestVersion(spark, it).get
    assert(v1 > v0, "the stale sidecar must refresh on stream cadence")
    // full coverage restored: every live file is indexed again, so a
    // probe prunes instead of falling back to always-candidates
    val live = DV.manifest(spark, root).select("file")
      .collect().map(_.getString(0)).toSet
    val indexed = Snapshots.readVersion(spark, it, v1)
      .select("file").collect().map(_.getString(0)).toSet
    assert(live.subsetOf(indexed))
    val key = ev.select("event_id").head().getLong(0)
    val (cands, total) = DV.indexLookup(spark, root, Seq(key))
    assert(cands.size < total / 2,
      s"post-refresh lookup must stay selective (${cands.size}/$total)")
  }
}
