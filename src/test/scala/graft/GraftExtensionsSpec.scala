package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors => DV}

/** The EXTENSION-built session is the product surface a real
  * deployment uses (`spark.sql.extensions=graft.functions
  * .GraftExtensions`): this spec builds one (same SparkContext, own
  * session state with the injected parser/rules) and drives the WHOLE
  * lakehouse statement set through plain `session.sql` — no GraftSql
  * wrapper anywhere.
  */
class GraftExtensionsSpec extends SparkSpec {

  private def withExtSession[A](body: SparkSession => A): A = {
    val base = spark // force the shared session (and context) first
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions()(_))
      .getOrCreate()
    // getOrCreate returns the ACTIVE session unless cleared — make
    // sure we really got a session with the injected parser
    val fresh =
      if (s2 eq base) {
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        try SparkSession.builder()
          .master("local[2]")
          .config("spark.sql.shuffle.partitions", 2)
          .config("spark.sql.session.timeZone", "UTC")
          .withExtensions(new graft.functions.GraftExtensions()(_))
          .getOrCreate()
        finally {
          SparkSession.setActiveSession(base)
          SparkSession.setDefaultSession(base)
        }
      } else s2
    try body(fresh)
    finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("plain session.sql on an extension-built session speaks the " +
      "whole lakehouse statement set: DML, time travel, history, " +
      "restore, ALTER, constraints, maintenance, detail") {
    withExtSession { s =>
      val root = Files.createTempDirectory("graft_extsess").toString
      val name = s"extsess_t_${math.abs(root.hashCode)}"
      val ev = graft.sources.Tables.events(s, sf)
        .orderBy("event_id").limit(300)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .localCheckpoint()
      DV.init(s, ev, root, "day")
      s.sql(s"CREATE TABLE $name USING `graft-dv` OPTIONS (path '$root')")

      // DML through the injected resolution rule
      s.sql(s"DELETE FROM $name WHERE user_id % 4 = 0").collect()
      val kept = ev.filter(col("user_id") % 4 =!= 0)
      assert(s.table(name).count() == kept.count())

      // time travel through the injected hint-resolution rule —
      // BEFORE the update, whose tombstoned old images would mask v1
      // retroactively too (the pinned rule)
      assert(s.sql(s"SELECT count(*) AS n FROM $name VERSION AS OF 1")
        .head().getLong(0) == kept.count())

      s.sql(s"UPDATE $name SET value = value + 5 WHERE user_id % 4 = 1")
        .collect()
      assert(s.table(name).count() == kept.count())

      // ALTER ADD COLUMNS through the injected resolution rule
      s.sql(s"ALTER TABLE $name ADD COLUMNS (priority INT)").collect()
      assert(s.table(name).columns.contains("priority"))

      // constraints + maintenance + introspection through the
      // injected PARSER (statements outside Spark's grammar)
      s.sql(s"ALTER TABLE $name ADD CONSTRAINT pos CHECK (event_id >= 0)")
        .collect()
      val bad = intercept[Exception](s.sql(s"INSERT INTO $name SELECT " +
        s"-1 * event_id - 1, ts, user_id, event_type, value, props, " +
        s"priority, day FROM $name LIMIT 3").collect())
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")).toSeq
      assert(chain(bad).exists(_.contains("pos")))

      val hist = s.sql(s"DESCRIBE HISTORY $name").collect()
      assert(hist.map(_.getString(2)).toSeq ==
        Seq("init", "update", "alter", "alter"))

      s.sql(s"OPTIMIZE $name ZORDER BY (user_id)").collect()
      val det = s.sql(s"DESCRIBE DETAIL $name").head()
      assert(det.getString(5) == "pos CHECK (event_id >= 0)")

      // restore un-does the zorder flip; content invariant throughout
      val cur = s.table(name).count()
      s.sql(s"RESTORE TABLE $name TO VERSION AS OF 4").collect()
      assert(s.table(name).count() == cur)
      val dry = s.sql(s"VACUUM $name RETAIN 0 HOURS DRY RUN").head()
      assert(dry.getLong(0) > 0, "the un-restored zorder files are dead")
      assert(s.table(name).count() == cur)
    }
  }
}
