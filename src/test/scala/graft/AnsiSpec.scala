package graft

import org.apache.spark.SparkThrowable

/** Spark 4 runs ANSI SQL semantics by default: malformed casts,
  * division by zero, and arithmetic overflow are ERRORS, not silent
  * nulls. The engine leans on that (bad data fails loudly; the
  * `ansi_safe_casts` query is the explicit opt-in to coercion via
  * try_*), so the default had better actually be on — this spec pins
  * it and the three failure classes BY ERROR CONDITION (a catch-all
  * "something threw" would also pass on a typo'd analysis error).
  */
class AnsiSpec extends SparkSpec {
  private def failsAnsi(sql: String, condition: String): Unit = {
    val e = intercept[Exception](spark.sql(sql).collect())
    val cond = e match {
      case st: SparkThrowable => Option(st.getCondition).getOrElse("")
      case _ => ""
    }
    assert(cond.contains(condition),
      s"expected ANSI condition $condition, got ${e.getClass.getName}: $cond")
  }

  test("ANSI mode is the session default") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
  }

  test("malformed cast, divide-by-zero, and overflow throw under ANSI") {
    failsAnsi("SELECT CAST('abc' AS INT)", "CAST_INVALID_INPUT")
    failsAnsi("SELECT 1 / 0", "DIVIDE_BY_ZERO")
    failsAnsi("SELECT 9223372036854775807L + 1L", "ARITHMETIC_OVERFLOW")
  }

  test("the try_* family coerces the same three classes to null") {
    val r = spark.sql(
      """SELECT try_cast('abc' AS INT) AS a, try_divide(1, 0) AS b,
        |  try_add(9223372036854775807L, 1L) AS c""".stripMargin).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
