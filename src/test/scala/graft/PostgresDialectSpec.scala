package graft

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

/** Postgres-DIALECT type mapping for the reference's two RDBMS sinks
  * (`/root/reference/dags/dag.py:40-58`: `books` and
  * `enriched_metrics`, columns VARCHAR(255) / FLOAT / INT) — the
  * in-process half of the Postgres story the sandbox cannot run live.
  * [[graft.sources.JdbcSink]]'s write path is identical for every
  * dialect (JdbcSinkSpec proves it end-to-end on embedded Derby);
  * what CHANGES per database is the DDL type mapping Spark's dialect
  * registry resolves from the URL — pinned here so the exact
  * `CREATE TABLE` the reference declares is what a
  * `jdbc:postgresql://` write would emit.
  */
class PostgresDialectSpec extends SparkSpec {

  private val dialect = JdbcDialects.get("jdbc:postgresql://h/db")

  /** The DDL type one column gets: the user override if given, else
    * the dialect's mapping, else Spark's common JDBC fallback — the
    * same resolution order the jdbc writer's schemaString uses.
    */
  private def ddlType(dt: DataType,
      overrideType: Option[String] = None): String =
    overrideType.getOrElse(
      dialect.getJDBCType(dt)
        .orElse(org.apache.spark.sql.execution.datasources.jdbc
          .JdbcUtils.getCommonJDBCType(dt))
        .get.databaseTypeDefinition)

  test("the URL resolves the Postgres dialect (not the generic one)") {
    assert(dialect.getClass.getName.contains("Postgres"))
    assert(dialect.canHandle("jdbc:postgresql://anything"))
  }

  test("Postgres-native defaults for the engine's frame types: " +
      "strings are TEXT, doubles FLOAT8, ints INTEGER, longs BIGINT") {
    assert(ddlType(StringType) == "TEXT")
    assert(ddlType(DoubleType) == "FLOAT8")
    assert(ddlType(IntegerType) == "INTEGER")
    assert(ddlType(LongType) == "BIGINT")
    assert(ddlType(FloatType) == "FLOAT4")
    assert(ddlType(BooleanType) == "BOOLEAN")
  }

  test("the reference's books DDL (dag.py:41-48) round-trips through " +
      "createTableColumnTypes: VARCHAR(255) strings, FLOAT price and " +
      "rating, INT rating_count") {
    // the exact shape standardise_books produces for the sink
    val books = StructType(Seq(
      StructField("title", StringType),
      StructField("author", StringType),
      StructField("price", DoubleType),
      StructField("book_type", StringType),
      StructField("rating", DoubleType),
      StructField("rating_count", IntegerType)))
    val overrides = Map(
      "title" -> "VARCHAR(255)", "author" -> "VARCHAR(255)",
      "price" -> "FLOAT", "book_type" -> "VARCHAR(255)",
      "rating" -> "FLOAT", "rating_count" -> "INT")
    val ddl = books.fields.map(f =>
      s"${f.name} ${ddlType(f.dataType, overrides.get(f.name))}")
    assert(ddl.toSeq == Seq(
      "title VARCHAR(255)", "author VARCHAR(255)", "price FLOAT",
      "book_type VARCHAR(255)", "rating FLOAT", "rating_count INT"),
      "the emitted column DDL must be exactly the reference's CREATE " +
        "TABLE books")
  }

  test("the reference's enriched_metrics DDL (dag.py:50-57) — the " +
      "aggregate frame's columns map to FLOAT averages and INT " +
      "counts under the same override string JdbcSink passes through") {
    val enriched = StructType(Seq(
      StructField("author", StringType),
      StructField("avg_rating", DoubleType),
      StructField("avg_price", DoubleType),
      StructField("total_rating_count", LongType),
      StructField("sum_rating", LongType),
      StructField("book_count", LongType)))
    val overrides = Map(
      "author" -> "VARCHAR(255)", "avg_rating" -> "FLOAT",
      "avg_price" -> "FLOAT", "total_rating_count" -> "INT",
      "sum_rating" -> "INT", "book_count" -> "INT")
    val ddl = enriched.fields.map(f =>
      s"${f.name} ${ddlType(f.dataType, overrides.get(f.name))}")
    assert(ddl.toSeq == Seq(
      "author VARCHAR(255)", "avg_rating FLOAT", "avg_price FLOAT",
      "total_rating_count INT", "sum_rating INT", "book_count INT"))
    // and WITHOUT the override the dialect's own mapping is sane
    // Postgres (never Derby's CLOB trap): aggregates stay numeric
    assert(ddlType(enriched("avg_rating").dataType) == "FLOAT8")
    assert(ddlType(enriched("book_count").dataType) == "BIGINT")
  }
}
