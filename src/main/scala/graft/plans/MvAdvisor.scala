package graft.plans

import org.apache.spark.sql.{DataFrame, GraftPlanApi, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter => LFilter, Join => LJoin, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.functions.countDistinct
import org.apache.spark.sql.types._

/** Workload-driven summary-table ADVISOR — the selection half of the
  * materialized-view story ([[MvRewriteRule]] is the serving half,
  * `MvMaintain` the maintenance half). Classic automated physical
  * design (AutoAdmin-style view selection, here specialized to the
  * grain summaries this engine can actually serve and maintain):
  * given a workload of queries, DISCOVER from their optimized logical
  * plans which (table-set, grain) summaries would answer them,
  * MEASURE each candidate's fact-to-grain compression on the actual
  * data, fold grain-subsumed candidates into their covering summary
  * (the rewrite already serves roll-ups from a finer grain, so one
  * registered summary covers every coarser candidate over the same
  * relations), and recommend the covers whose measured compression
  * clears a threshold.
  *
  * Discovery rules mirror what the rewrite + maintainer can honestly
  * deliver:
  *  - the topmost `Aggregate` per query, with every aggregate function
  *    in the IVM-able set (SUM / MIN / MAX / COUNT / AVG — avg
  *    decomposes to sum+count partials), no DISTINCT, no FILTER
  *    clauses;
  *  - grouping expressions must be plain relation columns (an
  *    expression grain is not re-derivable from stored partials
  *    without storing the expression — out of scope, the candidate is
  *    skipped);
  *  - below the aggregate: `Filter / Project / inner equi-Join` chains
  *    over parquet relations ([[MvCatalog.flatten]]), with the
  *    advisor's one loosening — Projects may COMPUTE, because
  *    aggregate INPUTS may be derived expressions whose partials the
  *    summary stores;
  *  - filter COLUMNS fold into the candidate grain (the standard
  *    view-merging move: a summary at (group cols ∪ filter cols) grain
  *    answers the filtered aggregate by rolling up the surviving grain
  *    rows), which is exactly why a selective filter can make a
  *    summary unprofitable — the measurement shows it instead of a
  *    heuristic guessing it.
  *
  * 100 TB shape: discovery is driver-side plan analysis (milliseconds,
  * no data touched); measurement is one count + one distinct-count
  * aggregate per candidate — each a map-side-combinable scan, the
  * cheapest honest estimate of summary size (HLL sketches would do at
  * petabyte scale; exact counts keep the oracle exact). Output is a
  * handful of rows assembled on the driver — bounded by the workload
  * size, never by the data.
  */
object MvAdvisor {

  /** Compression threshold for a recommendation: below ~10x, summary
    * maintenance overhead (storage, per-batch partials, registration
    * freshness churn) is unlikely to pay for the serve speedup.
    */
  val MinCompression = 10L

  final case class Candidate(
      tables: Seq[String], grain: Seq[String], query: String,
      flat: MvCatalog.Flat)

  private def tableStem(path: String): String =
    path.split('/').last.stripSuffix(".parquet")

  /** Advisor-loose flatten (see class doc): computing Projects pass. */
  private def flattenLoose(p: LogicalPlan): Option[MvCatalog.Flat] =
    p match {
      case pr: Project => flattenLoose(pr.child)
      case f: LFilter =>
        flattenLoose(f.child).map(x => x.copy(conds = x.conds :+ f.condition))
      case other => MvCatalog.flatten(other)
    }

  private def supportedAgg(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case _: Sum | _: Min | _: Max | _: Count | _: Average => true
      case _ => false
    })

  /** Extract the summary candidate a query could be served by, or None
    * with the reason encoded in the skip (spec-pinned for the workload
    * members that must be rejected).
    */
  def candidateOf(name: String, df: DataFrame): Option[Candidate] = {
    val topAgg = df.queryExecution.optimizedPlan
      .collectFirst { case a: Aggregate => a }
    topAgg.flatMap { a =>
      val aggExprs = a.aggregateExpressions
        .flatMap(_.collect { case ae: AggregateExpression => ae })
      val groupAttrs = a.groupingExpressions.map {
        case ar: AttributeReference => Some(ar)
        case _ => None
      }
      if (groupAttrs.exists(_.isEmpty) || aggExprs.isEmpty ||
          !aggExprs.forall(supportedAgg)) None
      else flattenLoose(a.child).flatMap { flat =>
        val relCols = flat.rels.flatMap(_.output.map(_.name)).toSet
        // userConds strips the optimizer's inferred IsNotNull(join key)
        // conjuncts — without it every join key would leak into the
        // grain and no star candidate would ever merge
        val filterCols = MvCatalog.userConds(flat)
          .flatMap(_.references.toSeq.map(_.name)).distinct
        val grain =
          (groupAttrs.flatten.map(_.name) ++ filterCols).distinct.sorted
        if (!grain.forall(relCols)) None
        else Some(Candidate(
          flat.rels.flatMap(lr => MvCatalog.rootPathsOf(lr).map(tableStem))
            .distinct.sorted,
          grain, name, flat))
      }
    }
  }

  /** Rebuild the UNFILTERED join of a candidate's relations (the frame
    * a registered summary would aggregate) — the query's own filters
    * are grain columns in the summary, not build-time predicates.
    */
  private def unfilteredJoin(spark: SparkSession,
      flat: MvCatalog.Flat): DataFrame = {
    val base = flat.rels.reduce[LogicalPlan]((l, r) =>
      LJoin(l, r, Cross, None, JoinHint.NONE))
    val cond = flat.eqs.map { case (a, b) => EqualTo(a, b): Expression }
      .reduceOption(And(_, _))
    GraftPlanApi.ofRows(spark, cond.map(LFilter(_, base)).getOrElse(base))
  }

  /** Run the advisor over a named workload: one output row per
    * discovered candidate, its measured compression, the covering
    * summary that should actually be registered, and the
    * recommendation flag on the covers.
    */
  def advise(spark: SparkSession,
      workload: Seq[(String, DataFrame)]): DataFrame = {
    val cands = workload.flatMap { case (n, df) => candidateOf(n, df) }
    val merged = cands.groupBy(c => (c.tables, c.grain)).toSeq
      .map { case ((t, g), xs) =>
        (t, g, xs.map(_.query).distinct.sorted, xs.head.flat)
      }
      .sortBy { case (t, g, _, _) => (t.mkString(","), g.mkString(",")) }

    // measure: one count per table set, one distinct-count per grain
    val factRows: Map[Seq[String], Long] =
      merged.map(m => (m._1, m._4)).groupBy(_._1).map { case (t, xs) =>
        t -> unfilteredJoin(spark, xs.head._2).count()
      }
    val grainRows: Map[(Seq[String], Seq[String]), Long] = merged.map {
      case (t, g, _, flat) =>
        val jf = unfilteredJoin(spark, flat)
        (t, g) -> jf.agg(countDistinct(g.head, g.tail: _*)).head().getLong(0)
    }.toMap
    def compressionOf(t: Seq[String], g: Seq[String]): Long =
      factRows(t) / math.max(1L, grainRows((t, g)))

    // cover = the LARGEST grain over the same relations that is a
    // superset AND profitable (the rewrite serves roll-ups, so the
    // finest PROFITABLE grain in a subsumption chain covers the whole
    // chain — an unprofitable finer grain must NOT swallow profitable
    // coarser candidates, the trap the first draft fell into: at small
    // scale the filter-extended Q1 grain compresses 1x and would have
    // buried the 1000x candidates under an un-recommendable cover);
    // ties lexicographic. None profitable => the candidate stands
    // alone, unrecommended.
    def coverOf(t: Seq[String], g: Seq[String]): Option[Seq[String]] =
      merged.filter(m => m._1 == t && g.toSet.subsetOf(m._2.toSet) &&
          compressionOf(m._1, m._2) >= MinCompression)
        .map(_._2).sortBy(x => (x.size, x.mkString(","))).lastOption

    val rows = merged.map { case (t, g, qs, _) =>
      val cover = coverOf(t, g)
      val compression = compressionOf(t, g)
      Row(t.mkString(","), g.mkString(","), qs.mkString(","),
        factRows(t), grainRows((t, g)), compression,
        cover match {
          case Some(c) if c != g => c.mkString(",")
          case _ => "self"
        },
        cover.contains(g))
    }
    val schema = StructType(Seq(
      StructField("tables", StringType, nullable = false),
      StructField("grain", StringType, nullable = false),
      StructField("queries", StringType, nullable = false),
      StructField("fact_rows", LongType, nullable = false),
      StructField("grain_rows", LongType, nullable = false),
      StructField("compression", LongType, nullable = false),
      StructField("covered_by", StringType, nullable = false),
      StructField("recommend", BooleanType, nullable = false)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
  }
}
