package graft

import org.apache.spark.sql.functions._

import graft.queries.FuzzQueries

/** The SELF-CHECKING half of the TLP grid (the oracle gate holds the
  * cross-engine half): for every predicate p in the grid, the table
  * must partition EXACTLY into (p IS TRUE) ⊎ (p IS FALSE) ⊎
  * (p IS NULL) — counts add up, exact-decimal sums add up — even
  * though the three legs optimize to three different physical plans.
  * Also pins that the grid genuinely exercises 3-valued logic: the
  * NULL leg is non-empty for the null-injecting predicates, and the
  * 3VL edge predicates (NULL AND FALSE, NULL OR TRUE) shift rows
  * between legs relative to their base predicate.
  */
class TlpSpec extends SparkSpec {

  private lazy val grid = FuzzQueries.fuzzTlpGrid(spark, sf)
    .collect()
    .map(r => (r.getString(0), r.getString(1),
      r.getDouble(2), Option(r.get(3)).map(_.toString.toDouble)))
    .groupBy(_._1)
    .map { case (id, rows) =>
      id -> rows.map(r => r._2 -> ((r._3, r._4))).toMap
    }

  test("partition identity: whole == true ⊎ false ⊎ null for every " +
      "predicate, counts and exact sums") {
    for ((id, legs) <- grid) {
      val (nw, sw) = legs("w")
      val parts = Seq("t", "f", "n").map(legs)
      assert(nw == parts.map(_._1).sum,
        s"$id: row counts do not partition ($legs)")
      val sumParts = parts.flatMap(_._2).sum
      assert(math.abs(sw.getOrElse(0.0) - sumParts) < 1e-6,
        s"$id: sums do not partition ($legs)")
    }
  }

  test("the grid exercises 3-valued logic for real: null legs are " +
      "non-empty where NULLs are injected, and the AND/OR edges move " +
      "rows between legs") {
    // every nullif/CASE predicate must put rows in the NULL leg —
    // except the deliberate 3VL edges where NULL collapses: t4's
    // NULL OR TRUE rescues rows into the TRUE leg but NULL OR FALSE
    // stays NULL (still non-empty); t3's NULL AND FALSE collapses to
    // FALSE but NULL AND TRUE stays NULL (still non-empty)
    for ((id, legs) <- grid)
      assert(legs("n")._1 > 0, s"$id: the NULL leg is empty — the " +
        "predicate does not exercise 3-valued logic")

    // NULL AND FALSE = FALSE: t3's null leg must be STRICTLY smaller
    // than the base t0's (rows where quantity=17 but tax <= 0.03
    // collapse from NULL to FALSE)
    assert(grid("t3")("n")._1 < grid("t0")("n")._1,
      "NULL AND FALSE did not collapse any rows out of the NULL leg")
    // NULL OR TRUE = TRUE: same base, rows where quantity=17 and
    // tax <= 0.03 collapse from NULL to TRUE
    assert(grid("t4")("n")._1 < grid("t0")("n")._1,
      "NULL OR TRUE did not collapse any rows out of the NULL leg")
    // NOT preserves NULL: t5's null leg == t0's exactly
    assert(grid("t5")("n")._1 == grid("t0")("n")._1,
      "NOT changed the NULL leg — 3VL negation broken")
    // and flips the other two
    assert(grid("t5")("t")._1 == grid("t0")("f")._1 &&
      grid("t5")("f")._1 == grid("t0")("t")._1)
  }

  test("legs plan differently: the TRUE leg pushes the base filter, " +
      "the NULL leg plans a null test — same answer territory, " +
      "different physical plans") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val t = FuzzQueries.tlpLeg(li, "t0", "t",
      "(nullif(l_quantity, 17) > 25) IS TRUE")
    val n = FuzzQueries.tlpLeg(li, "t0", "n",
      "(nullif(l_quantity, 17) > 25) IS NULL")
    val pt = t.queryExecution.executedPlan.toString
    val pn = n.queryExecution.executedPlan.toString
    assert(pt != pn, "TRUE and NULL legs compiled to the same plan")
    assert(pt.contains("Filter") && pn.contains("Filter"))
  }
}
