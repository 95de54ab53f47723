package graft.plans

import org.apache.spark.sql.{GraftPlanApi, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

import graft.operators.{DeletionVectors => DV, Snapshots}

/** SQL time travel on graft-dv tables:
  *
  * {{{
  *   SELECT ... FROM ev VERSION AS OF 3
  *   SELECT ... FROM ev TIMESTAMP AS OF '2026-08-15 12:00:00'
  * }}}
  *
  * Spark parses both into [[RelationTimeTravel]], but its RESOLUTION
  * throws UNSUPPORTED_FEATURE.TIME_TRAVEL for any non-DSv2 relation —
  * before checkAnalysis, so unlike the DML swap this rule must run
  * BEFORE the resolution batch: it is installed through
  * `injectHintResolutionRule` (the Hints batch precedes Resolution)
  * and applied by [[graft.GraftSql.sql]] on the PARSED plan. The
  * swap resolves the identifier against the session catalog itself
  * (graft-dv provider check; temp views shadow and are left alone),
  * maps `VERSION AS OF` to the committed manifest version and
  * `TIMESTAMP AS OF` to the highest version whose commit marker
  * landed at or before the instant ([[Snapshots.versionAsOf]] — the
  * marker create IS the visibility step), and substitutes
  * [[DV.readVersion]]'s plan under a [[SubqueryAlias]] carrying the
  * table name so qualified column references keep resolving.
  *
  * Semantics are the layer's pinned ones: the manifest versions the
  * FILE SET and each version reads under its own recorded schema,
  * while tombstones are global and current — historical reads apply
  * deletions retroactively (right-to-be-forgotten composes with time
  * travel; DeletionVectorsSpec pins both directions).
  */
case class DvTimeTravelRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def dvRootOf(ident: Seq[String]): Option[String] =
    DvDml.dvCatalogRoot(session, ident)

  private def tsMillis(e: Expression): Long = {
    val micros = Cast(e, TimestampType,
      Some(session.sessionState.conf.sessionLocalTimeZone)).eval()
    require(micros != null,
      s"TIMESTAMP AS OF expression ${e.sql} did not evaluate to a " +
        "timestamp")
    micros.asInstanceOf[Long] / 1000L
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case tt: RelationTimeTravel => tt.relation match {
      case u: UnresolvedRelation =>
        dvRootOf(u.multipartIdentifier) match {
          case Some(root) =>
            val v = (tt.version, tt.timestamp) match {
              case (Some(s), _) =>
                try s.toLong catch {
                  case _: NumberFormatException =>
                    throw new IllegalArgumentException(
                      s"graft-dv VERSION AS OF takes a manifest " +
                        s"version number; got '$s'")
                }
              case (None, Some(ts)) =>
                val at = tsMillis(ts)
                Snapshots.versionAsOf(session,
                  DV.manifestTable(root), at).getOrElse(
                  throw new IllegalArgumentException(
                    s"no committed version of $root at or before " +
                      s"${new java.sql.Timestamp(at)}"))
              case (None, None) =>
                throw new IllegalStateException(
                  "RelationTimeTravel carries neither version nor " +
                    "timestamp")
            }
            SubqueryAlias(u.multipartIdentifier.last,
              GraftPlanApi.analyzed(DV.readVersion(session, root, v)))
          case None => tt
        }
      case _ => tt
    }
  }
}
