package graft.plans

import org.apache.spark.sql.{DataFrame, GraftPlanApi, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter => LFilter, Join => LJoin, JoinHint, LogicalPlan, Project}
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
  *    in exactly the set the rewrite can re-derive (SUM / MIN / MAX /
  *    COUNT — see [[supportedAgg]]; AVG is rejected because the
  *    rewrite has no avg decomposition), no DISTINCT, no FILTER
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
      aggSqls: Seq[String], eqs: Set[String], flat: MvCatalog.Flat)

  /** One measured candidate: queries/aggSqls merged across the
    * workload members that produced the same (tables, JOIN SHAPE,
    * grain) — the canonical equi-join pair set is part of a
    * candidate's identity, because the same tables joined on
    * different keys are different relations: a summary over one join
    * can never serve the other (the rewrite matches canonEqs), so
    * merging them would measure one shape and over-promise coverage
    * of both.
    */
  final case class Measured(
      tables: Seq[String], grain: Seq[String], queries: Seq[String],
      aggSqls: Seq[String], eqs: Set[String], flat: MvCatalog.Flat,
      factRows: Long, grainRows: Long) {
    def compression: Long = factRows / math.max(1L, grainRows)
  }

  /** A summary worth registering: a profitable cover, carrying the
    * union of the aggregate shapes of every candidate it serves.
    */
  final case class Recommendation(
      tables: Seq[String], grain: Seq[String], queries: Seq[String],
      aggSqls: Seq[String], flat: MvCatalog.Flat)

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

  /** Exactly the aggregate set `MvCatalog.deriveShapes` can store and
    * `MvRewriteRule.deriveAgg` can re-derive — nothing more. (Average
    * is deliberately ABSENT: the rewrite has no avg decomposition, so
    * whitelisting it here would recommend summaries that can never
    * serve the avg query — the advisor must promise only what serving
    * delivers.)
    */
  private def supportedAgg(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case _: Sum | _: Min | _: Max | _: Count => true
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
        // aggregate INPUTS must also be relation columns: a computing
        // Project below the aggregate is fine when its expressions are
        // inlined into the aggregate children (single-use — Catalyst
        // collapses them), but an alias SHARED by several aggregates
        // survives as a Project-local attribute whose ae.sql would
        // never resolve against the rebuilt fact — reject, don't crash
        // at registration
        val aggColsOk = aggExprs
          .forall(_.references.toSeq.map(_.name).forall(relCols))
        if (!grain.forall(relCols) || !aggColsOk) None
        else MvCatalog.canonEqs(flat).map { eqs =>
          Candidate(
            flat.rels.flatMap(lr => MvCatalog.rootPathsOf(lr).map(tableStem))
              .distinct.sorted,
            grain, name, aggExprs.map(_.sql).distinct.sorted, eqs, flat)
        }
      }
    }
  }

  /** Rebuild the UNFILTERED join of a candidate's relations (the frame
    * a registered summary would aggregate) — the query's own filters
    * are grain columns in the summary, not build-time predicates.
    */
  def factFrame(spark: SparkSession,
      flat: MvCatalog.Flat): DataFrame = {
    // INNER joins with their conditions attached directly (not
    // Cross+Filter): the frame must round-trip through
    // MvCatalog.register's own flatten, which requires the
    // conditioned-join shape
    val plan = flat.rels.drop(1)
      .foldLeft(flat.rels.head: LogicalPlan) { (acc, r) =>
        val conds = flat.eqs.collect {
          case (a, b)
              if (acc.outputSet.contains(a) && r.outputSet.contains(b)) ||
                (acc.outputSet.contains(b) && r.outputSet.contains(a)) =>
            EqualTo(a, b): Expression
        }
        val cond = conds.reduceOption(And(_, _))
        LJoin(acc, r, if (cond.isDefined) Inner else Cross, cond,
          JoinHint.NONE)
      }
    GraftPlanApi.ofRows(spark, plan)
  }

  /** Discover + merge + measure: the shared analysis behind both the
    * report ([[advise]]) and the registration plan
    * ([[recommendations]]).
    */
  def analyze(spark: SparkSession,
      workload: Seq[(String, DataFrame)]): Seq[Measured] = {
    val cands = workload.flatMap { case (n, df) => candidateOf(n, df) }
    val merged = cands.groupBy(c => (c.tables, c.eqs, c.grain)).toSeq
      .map { case ((t, e, g), xs) =>
        (t, e, g, xs.map(_.query).distinct.sorted,
          xs.flatMap(_.aggSqls).distinct.sorted, xs.head.flat)
      }
      .sortBy { case (t, _, g, _, _, _) =>
        (t.mkString(","), g.mkString(","))
      }
    // measure: one count per joined relation, one distinct-count per
    // grain. Grain cardinality = the summary's groupBy row count, so
    // NULL grain tuples must COUNT (groupBy materializes NULL groups):
    // distinct().count(), never countDistinct, which silently drops
    // any tuple with a NULL grain column and would overstate
    // compression on nullable grains (the oracle's SELECT DISTINCT
    // subqueries keep NULL tuples the same way)
    val factRows: Map[(Seq[String], Set[String]), Long] =
      merged.map(m => ((m._1, m._2), m._6)).groupBy(_._1).map {
        case (k, xs) => k -> factFrame(spark, xs.head._2).count()
      }
    merged.map { case (t, e, g, qs, aggs, flat) =>
      val grains = factFrame(spark, flat)
        .select(g.head, g.tail: _*).distinct().count()
      Measured(t, g, qs, aggs, e, flat, factRows((t, e)), grains)
    }
  }

  /** cover = the LARGEST grain over the same relations that is a
    * superset AND profitable (the rewrite serves roll-ups, so the
    * finest PROFITABLE grain in a subsumption chain covers the whole
    * chain — an unprofitable finer grain must NOT swallow profitable
    * coarser candidates, the trap the first draft fell into: at small
    * scale the filter-extended Q1 grain compresses 1x and would have
    * buried the 1000x candidates under an un-recommendable cover);
    * ties lexicographic. None profitable => the candidate stands
    * alone, unrecommended.
    */
  private def coverOf(all: Seq[Measured], m: Measured): Option[Seq[String]] =
    all.filter(x => x.tables == m.tables && x.eqs == m.eqs &&
        m.grain.toSet.subsetOf(x.grain.toSet) &&
        x.compression >= MinCompression)
      .map(_.grain).sortBy(x => (x.size, x.mkString(","))).lastOption

  /** The registration plan: each profitable cover, carrying the UNION
    * of the aggregate shapes of every candidate it covers — so the one
    * registered summary serves all of them (roll-up subsumption needs
    * the partials of every covered query present in the summary).
    */
  def recommendations(spark: SparkSession,
      workload: Seq[(String, DataFrame)]): Seq[Recommendation] = {
    val all = analyze(spark, workload)
    all.flatMap(m => coverOf(all, m).map(c => (c, m)))
      .groupBy { case (c, m) => (m.tables, m.eqs, c) }.toSeq
      .map { case ((t, e, c), xs) =>
        val cover =
          all.find(m => m.tables == t && m.eqs == e && m.grain == c).get
        Recommendation(t, c,
          xs.map(_._2).flatMap(_.queries).distinct.sorted,
          xs.map(_._2).flatMap(_.aggSqls).distinct.sorted, cover.flat)
      }
      .sortBy(r => (r.tables.mkString(","), r.grain.mkString(",")))
  }

  /** Run the advisor over a named workload: one output row per
    * discovered candidate, its measured compression, the covering
    * summary that should actually be registered, and the
    * recommendation flag on the covers.
    */
  def advise(spark: SparkSession,
      workload: Seq[(String, DataFrame)]): DataFrame = {
    val all = analyze(spark, workload)
    val rows = all.map { m =>
      val cover = coverOf(all, m)
      Row(m.tables.mkString(","), m.grain.mkString(","),
        m.queries.mkString(","),
        m.factRows, m.grainRows, m.compression,
        cover match {
          case Some(c) if c != m.grain => c.mkString(",")
          case _ => "self"
        },
        cover.contains(m.grain))
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
