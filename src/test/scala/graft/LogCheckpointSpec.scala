package graft

import java.nio.file.Files

import graft.operators.Snapshots

/** Commit-log checkpointing: folding the committed-version index into
  * one file must leave every resolution face (committedVersions /
  * latestVersion / commitInstants / versionAsOf / readVersion)
  * byte-identical in ANSWERS while the `_commits` listing shrinks to
  * O(versions since last fold); cleanup is two-phase (a fold deletes
  * only what the PREVIOUS fold covers); vacuum drops folded versions
  * from the index so fail-fast time travel is unchanged.
  */
class LogCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def freshLog(): String =
    Files.createTempDirectory("graft_logckpt").toString + "/t"

  private def rawCommit(table: String, v: Long): Unit =
    assert(Snapshots.tryCommit(spark, table, v))

  private def digitMarkers(table: String): Seq[Long] = {
    val d = new java.io.File(s"$table/_commits")
    if (!d.exists()) Seq.empty
    else d.listFiles().map(_.getName).filter(n =>
      n.nonEmpty && n.forall(_.isDigit)).map(_.toLong).sorted.toSeq
  }

  private def indexFiles(table: String): Seq[String] = {
    val d = new java.io.File(s"$table/_commits")
    if (!d.exists()) Seq.empty
    else d.listFiles().map(_.getName).filter(_.startsWith("_index."))
      .sorted.toSeq
  }

  test("fold answers are identical to the marker-only log; cleanup " +
      "is two-phase; the listing shrinks to O(since-last-fold)") {
    val t = freshLog()
    (1L to 70L).foreach(rawCommit(t, _))
    val before = Snapshots.committedVersions(spark, t)
    val instantsBefore = Snapshots.commitInstants(spark, t)
    assert(before == (1L to 70L))

    // fold 1: index lands, NOTHING is deleted (two-phase)
    assert(Snapshots.checkpointLog(spark, t))
    assert(indexFiles(t) == Seq("_index.62.0"))
    assert(digitMarkers(t) == (1L to 70L))
    assert(Snapshots.committedVersions(spark, t) == before)
    assert(Snapshots.commitInstants(spark, t) == instantsBefore)

    // below threshold: a second immediate fold is a no-op
    assert(!Snapshots.checkpointLog(spark, t))

    // fold 2: deletes exactly what fold 1 covers
    (71L to 140L).foreach(rawCommit(t, _))
    assert(Snapshots.checkpointLog(spark, t))
    assert(indexFiles(t) == Seq("_index.132.1", "_index.62.0"))
    assert(digitMarkers(t) == (63L to 140L),
      "markers fold-1 covers must be gone, nothing newer")
    assert(Snapshots.committedVersions(spark, t) == (1L to 140L))
    assert(Snapshots.commitInstants(spark, t).keySet ==
      (1L to 140L).toSet)
    assert(Snapshots.latestVersion(spark, t).contains(140L))

    // fold 3: the oldest index dies, resolution still exact
    (141L to 210L).foreach(rawCommit(t, _))
    assert(Snapshots.checkpointLog(spark, t))
    assert(indexFiles(t) == Seq("_index.132.1", "_index.202.2"))
    assert(digitMarkers(t) == (133L to 210L))
    assert(Snapshots.committedVersions(spark, t) == (1L to 210L))

    // versionAsOf rides the index's preserved instants
    val ts = instantsBefore(35L)
    val got = Snapshots.versionAsOf(spark, t, ts)
    assert(got.exists(_ >= 35L))
    assert(Snapshots.versionAsOf(spark, t, 0L).isEmpty)
  }

  test("real published versions read back across a fold; vacuum drops " +
      "folded versions from the index (fail-fast time travel)") {
    val t = freshLog()
    val vs = (1 to 6).map(i =>
      Snapshots.publish(spark, t, Seq(i).toDF("x")))
    assert(vs == (1L to 6L))
    assert(Snapshots.checkpointLog(spark, t, lag = 1, minUnfolded = 1))
    assert(indexFiles(t).nonEmpty)
    // answers unchanged by the fold
    (1L to 6L).foreach(v =>
      assert(Snapshots.readVersion(spark, t, v)
        .head().getInt(0) == v.toInt))
    Snapshots.vacuum(spark, t, keep = 2)
    assert(Snapshots.committedVersions(spark, t) == Seq(5L, 6L),
      "vacuumed FOLDED versions must stop resolving (index rewritten)")
    intercept[Exception](Snapshots.readVersion(spark, t, 3L))
    assert(Snapshots.readVersion(spark, t, 6L).head().getInt(0) == 6)
  }

  test("auto-cadence: the 64th published version folds the log " +
      "without any explicit call") {
    val t = freshLog()
    (1L to 63L).foreach(rawCommit(t, _))
    // the cadence trigger rides the publish faces, not raw tryCommit
    assert(indexFiles(t).isEmpty)
    val v = Snapshots.publish(spark, t, Seq(64).toDF("x"))
    assert(v == 64L)
    assert(indexFiles(t) == Seq("_index.56.0"),
      "the v=64 publish must fold the log on its own cadence")
    assert(Snapshots.committedVersions(spark, t) == (1L to 64L))
  }
}
