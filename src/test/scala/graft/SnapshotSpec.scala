package graft

import org.apache.hadoop.fs.Path

import graft.operators.Snapshots

/** Crash-safety and concurrency algebra of the snapshot commit
  * protocol. Everything here is driven through the public API plus
  * direct filesystem damage — no internal state is inspected.
  */
class SnapshotSpec extends SparkSpec {

  private def freshTable(name: String): String = {
    val t = s"${System.getProperty("java.io.tmpdir")}/graft_snapspec_$name"
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(t), true)
    t
  }

  private def df(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
  }

  test("publish returns consecutive versions and readLatest follows") {
    val t = freshTable("basic")
    assert(Snapshots.publish(spark, t, df(3)) == 1L)
    assert(Snapshots.publish(spark, t, df(5)) == 2L)
    assert(Snapshots.readLatest(spark, t).count() == 5)
    assert(Snapshots.readVersion(spark, t, 1).count() == 3)
    assert(Snapshots.committedVersions(spark, t) == Seq(1L, 2L))
  }

  test("a crash after data write but before commit is invisible") {
    val t = freshTable("crash")
    Snapshots.publish(spark, t, df(4))
    // crashed publisher: data only, no marker
    df(100).write.parquet(s"$t/v=2")
    assert(Snapshots.latestVersion(spark, t).contains(1L))
    assert(Snapshots.readLatest(spark, t).count() == 4)
    intercept[IllegalArgumentException] {
      Snapshots.readVersion(spark, t, 2)
    }
    // a later successful publish claims the NEXT free committed slot,
    // overwriting the debris rather than resurrecting it
    val v = Snapshots.publish(spark, t, df(6))
    assert(v == 2L)
    assert(Snapshots.readLatest(spark, t).count() == 6)
  }

  test("losing the marker race forces a retry at a higher version") {
    val t = freshTable("race")
    Snapshots.publish(spark, t, df(2))
    // a competing publisher already claimed version 2
    assert(Snapshots.tryCommit(spark, t, 2))
    assert(!Snapshots.tryCommit(spark, t, 2), "exclusive create not exclusive")
    val v = Snapshots.publish(spark, t, df(7))
    assert(v == 3L, s"racing publish landed at $v")
    assert(Snapshots.readLatest(spark, t).count() == 7)
  }

  test("vacuum keeps the newest k, removes their predecessors' data and markers") {
    val t = freshTable("vacuum")
    (1 to 4).foreach(i => Snapshots.publish(spark, t, df(i)))
    // in-flight publish above max committed must survive vacuum
    df(50).write.parquet(s"$t/v=9")
    Snapshots.vacuum(spark, t, keep = 2)
    assert(Snapshots.committedVersions(spark, t) == Seq(3L, 4L))
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$t/v=1")) && !fs.exists(new Path(s"$t/v=2")))
    assert(fs.exists(new Path(s"$t/v=9")), "in-flight dir was vacuumed")
    assert(Snapshots.readLatest(spark, t).count() == 4)
    intercept[IllegalArgumentException] {
      Snapshots.readVersion(spark, t, 1)
    }
  }

  test("schema evolution is versioned atomically: each version is self-contained") {
    import org.apache.spark.sql.functions._
    val t = freshTable("schema")
    Snapshots.publish(spark, t, df(3))
    Snapshots.publish(spark, t, df(4).withColumn("score", length(col("payload"))))
    assert(Snapshots.readLatest(spark, t).columns.toSeq ==
      Seq("id", "payload", "score"))
    assert(Snapshots.readVersion(spark, t, 1).columns.toSeq ==
      Seq("id", "payload"))
  }

  test("OPTIMIZE as a transaction: layout changes atomically, content doesn't") {
    // the compaction story composed with the commit protocol: publish
    // the compacted layout as the NEXT version — readers flip from
    // fragmented to compacted atomically at the marker, and the
    // pre-compaction version stays readable until vacuumed
    // (Compaction.compact can equally write its outPath into a
    // version dir and tryCommit it — same protocol, partitioned form)
    val t = freshTable("optimize")
    val fragmented = df(500).repartition(32)
    val v1 = Snapshots.publish(spark, t, fragmented)
    def files(v: Long) = {
      val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new Path(s"$t/v=$v"))
        .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    }
    val v2 = Snapshots.publish(spark, t,
      Snapshots.readVersion(spark, t, v1).coalesce(2))
    assert(files(v1) > 16 && files(v2) <= 2,
      s"compaction did not shrink the file count: ${files(v1)} -> ${files(v2)}")
    val a = Snapshots.readVersion(spark, t, v1).collect().map(_.toSeq).toSet
    val b = Snapshots.readLatest(spark, t).collect().map(_.toSeq).toSet
    assert(a == b, "compacted version changed content")
  }

  private def countedDf(rows: Int) = {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("data-write-evals")
    val d = spark.range(rows.toLong).as[Long]
      .map { i => acc.add(1); i }.toDF("id")
    (d, () => (acc.value / rows).toInt) // full materializations so far
  }

  test("lost claim is discovered before writing: one data write per publish") {
    // a rival already HOLDS the claim on the next version: publish
    // must bump past it without ever materializing df for the dead
    // attempt — the claim-first ordering is what makes the data write
    // once-per-publish in the common race.
    val t = freshTable("claimfirst")
    Snapshots.publish(spark, t, df(2))
    assert(Snapshots.tryClaim(spark, t, 2), "rival claim setup failed")
    val (d, evals) = countedDf(5)
    val v = Snapshots.publish(spark, t, d)
    assert(v == 3L, s"expected to skip the claimed slot, landed at $v")
    assert(evals() == 1, s"df materialized ${evals()}x — claim-first broken")
    assert(Snapshots.readLatest(spark, t).count() == 5)
  }

  test("claim-lost retry: rival raw-commits mid-window, one write per attempt") {
    // the only way a CLAIMED attempt can lose its commit is a raw
    // tryCommit writer on the same table. Inject one in the
    // write→commit window; publish must retry at the next version,
    // re-running the data write exactly once for the new attempt
    // (the abandoned dir is unclaimed garbage vacuum may collect).
    val t = freshTable("commitlost")
    Snapshots.publish(spark, t, df(2))
    val (d, evals) = countedDf(5)
    var injected = false
    val v = Snapshots.publish(spark, t, d, onBeforeCommit = { attempt =>
      if (!injected) { injected = true
        assert(Snapshots.tryCommit(spark, t, attempt), "injection failed")
      }
    })
    assert(v == 3L, s"retry should land one past the stolen slot, got $v")
    assert(evals() == 2,
      s"expected one data write per claimed attempt (2), got ${evals()}")
    assert(Snapshots.readLatest(spark, t).count() == 5)
    // the stolen version 2 is committed but holds the LOSER's bytes?
    // No: the loser wrote v=2 and the rival committed it — under raw
    // tryCommit mixing that is the rival's responsibility (object
    // doc); what the protocol guarantees is the loser's own commit
    // (v=3) is complete and correct, and its claim on 2 is released:
    assert(!Snapshots.claimedVersions(spark, t).contains(2L),
      "lost attempt's claim not released — garbage pinned forever")
    Snapshots.vacuum(spark, t, keep = 1)
    assert(Snapshots.committedVersions(spark, t) == Seq(3L))
  }

  test("vacuum spares a claimed in-flight dir that a rival has passed") {
    // A claims 3 and is still writing when B publishes 3→4 commits 4.
    // vacuum(keep=1) now sees uncommitted v=3 ≤ max committed — the
    // old rule would delete it moments before A commits, yielding a
    // committed version with missing data. The live claim shields it.
    val t = freshTable("shield")
    Snapshots.publish(spark, t, df(1))
    Snapshots.publish(spark, t, df(2))
    assert(Snapshots.tryClaim(spark, t, 3), "A's claim failed")
    df(30).write.parquet(s"$t/v=3") // A's in-flight data
    assert(Snapshots.publish(spark, t, df(4)) == 4L) // B skips claimed 3
    Snapshots.vacuum(spark, t, keep = 1)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$t/v=3")), "claimed in-flight dir vacuumed")
    assert(!fs.exists(new Path(s"$t/v=1")) && !fs.exists(new Path(s"$t/v=2")))
    // A completes: its version is late but complete and readable
    assert(Snapshots.tryCommit(spark, t, 3))
    assert(Snapshots.readVersion(spark, t, 3).count() == 30)
  }

  test("publishAt: committed replay is a no-op, crashed replay adopts its claim") {
    val t = freshTable("pubat")
    assert(Snapshots.publishAt(spark, t, 1, df(3)))
    assert(!Snapshots.publishAt(spark, t, 1, df(99)),
      "replay of a committed batch must be a no-op")
    assert(Snapshots.readVersion(spark, t, 1).count() == 3)
    // crashed attempt at v=2: claim + partial debris, no commit
    assert(Snapshots.tryClaim(spark, t, 2))
    df(999).write.mode("overwrite").parquet(s"$t/v=2")
    // replay (single deterministic writer): adopts the claim, rewrites
    assert(Snapshots.publishAt(spark, t, 2, df(7)))
    assert(Snapshots.readVersion(spark, t, 2).count() == 7)
    assert(!Snapshots.claimedVersions(spark, t).contains(2L),
      "claim not released after successful publishAt")
  }

  test("publishCas: succeeds only on the expected base, detects a " +
      "stale basis, and racing CAS writers on one base yield exactly " +
      "one winner") {
    val t = freshTable("cas")
    assert(Snapshots.publishCas(spark, t, 0, df(3)))
    assert(Snapshots.readVersion(spark, t, 1).count() == 3)
    // stale basis: latest is 1, a writer that read 0 must NOT commit
    assert(!Snapshots.publishCas(spark, t, 0, df(99)))
    assert(Snapshots.latestVersion(spark, t).contains(1L))
    // racing CAS writers on the same base: exactly one wins, the
    // committed content is exactly the winner's
    val wins = new java.util.concurrent.atomic.AtomicInteger
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        if (Snapshots.publishCas(spark, t, 1, df(10 + i)))
          wins.incrementAndGet(): Unit
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(wins.get == 1, s"${wins.get} CAS winners on one base")
    assert(Snapshots.latestVersion(spark, t).contains(2L))
    val n = Snapshots.readVersion(spark, t, 2).count()
    assert((11L to 14L).contains(n), s"corrupt CAS content: $n rows")
    // loser rebases onto the new latest and succeeds
    assert(Snapshots.publishCas(spark, t, 2, df(5)))
    assert(Snapshots.readVersion(spark, t, 3).count() == 5)
  }

  test("concurrent publishers: distinct versions, each readable and uncorrupted") {
    // the claims layer's raison d'être, exercised with REAL threads:
    // under the old shared-dir protocol two publishers racing to the
    // same version number wrote into the SAME v=N directory — their
    // bytes could interleave before either committed, so the winning
    // marker could expose a corrupt mix. With exclusive claims each
    // dir has one writer, so N concurrent publishers must yield N
    // distinct committed versions whose contents are each EXACTLY one
    // publisher's dataframe.
    import org.apache.spark.sql.functions.{col, lit}
    val t = freshTable("threads")
    val writers = 4
    import scala.jdk.CollectionConverters._
    val results = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    // 3 publishes per writer: every commit+release reopens the
    // recycled-version window and every claim exercises the exclusive
    // create under contention — the round-8 session caught BOTH a
    // non-atomic local-FS claim primitive and a stale re-claim of a
    // committed number with this test, so keep the pressure on
    val rounds = 3
    (1 to writers).foreach { w =>
      pool.execute(() => {
        try {
          for (r <- 1 to rounds) {
            // marker rows: payload identifies the (writer, round), so
            // content mixing across publishers is detectable
            val d = df(10 + w).withColumn("writer", lit(w * 10 + r))
            results.add((w * 10 + r) -> Snapshots.publish(spark, t, d))
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(240, java.util.concurrent.TimeUnit.SECONDS))
    assert(errors.isEmpty, s"publisher threw: ${errors.asScala.headOption}")
    val byWriter = results.asScala.toSeq.sortBy(_._1)
    assert(byWriter.size == writers * rounds)
    val versions = byWriter.map(_._2)
    assert(versions.distinct.size == writers * rounds,
      s"two publishers committed the same version: $versions")
    assert(Snapshots.committedVersions(spark, t).toSet == versions.toSet)
    byWriter.foreach { case (w, v) =>
      val rows = Snapshots.readVersion(spark, t, v)
        .select(col("writer")).distinct()
        .collect().map(_.getInt(0)).toSeq
      assert(rows == Seq(w),
        s"version $v mixes writers $rows — dir exclusivity broken")
      assert(Snapshots.readVersion(spark, t, v).count() == 10 + w / 10,
        s"version $v lost rows")
    }
    // no claims left behind; vacuum leaves a clean single-version table
    assert(Snapshots.claimedVersions(spark, t).isEmpty,
      "publishers leaked claims")
    Snapshots.vacuum(spark, t, keep = 1)
    assert(Snapshots.committedVersions(spark, t) == Seq(versions.max))
  }

  private def runFuzzer(t: String): Unit = {
    val rnd = new scala.util.Random(42) // fixed seed: deterministic spec
    var lastCommitted = 0L
    var lastRows = -1L
    for (step <- 1 to 20) {
      rnd.nextInt(4) match {
        case 0 | 1 =>
          lastRows = step.toLong
          lastCommitted = Snapshots.publish(spark, t, df(step))
        case 2 => // crash: orphan data at a far-future version
          df(999).write.mode("overwrite").parquet(s"$t/v=${90 + step}")
        case 3 if lastCommitted > 0 =>
          Snapshots.vacuum(spark, t, keep = 1 + rnd.nextInt(3))
        case _ => ()
      }
      if (lastCommitted > 0) {
        assert(Snapshots.latestVersion(spark, t).contains(lastCommitted))
        assert(Snapshots.readLatest(spark, t).count() == lastRows)
      }
    }
  }

  test("random interleaving of publishes, crashes and vacuums never corrupts the reader") {
    runFuzzer(freshTable("fuzz"))
  }

  test("the same fuzzer over a CONDITIONAL-PUT object store with " +
      "LAGGED listings (no POSIX atomic create, no consistent LIST) " +
      "— the protocol needs only the LogStore contract") {
    val t = freshTable("s3fuzz")
    val store = new SimulatedObjectStore(listLagMs = 150)
    graft.operators.LogStore.install(t, store)
    try {
      runFuzzer(t)
      assert(store.puts.get() > 20,
        "the markers must have gone through the store's conditional put")
      // CAS writers rebase correctly through the simulated store too
      val base = Snapshots.latestVersion(spark, t).get
      assert(Snapshots.publishCas(spark, t, base, df(7)))
      assert(!Snapshots.publishCas(spark, t, base, df(8)),
        "a stale base must fail the CAS, lag or no lag")
      assert(Snapshots.publishCas(spark, t, base + 1, df(8)))
      assert(Snapshots.readLatest(spark, t).count() == 8)
      // and time travel resolves through the store's instants
      assert(Snapshots.readVersion(spark, t, base + 1).count() == 7)
    } finally graft.operators.LogStore.uninstall(t)
  }

  test("concurrent publishers through the simulated store: distinct " +
      "versions, each readable — conditional put arbitrates") {
    val t = freshTable("s3race")
    graft.operators.LogStore.install(t,
      new SimulatedObjectStore(listLagMs = 100))
    try {
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val threads = (1 to 4).map { i =>
        new Thread(() => {
          results.add(Snapshots.publish(spark, t, df(i))): Unit
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(120000))
      import scala.jdk.CollectionConverters._
      val versions = results.asScala.toSeq
      assert(versions.size == 4 && versions.distinct.size == 4,
        s"racing publishers must land distinct versions: $versions")
      versions.foreach(v =>
        assert(Snapshots.readVersion(spark, t, v).count() > 0))
    } finally graft.operators.LogStore.uninstall(t)
  }
}
