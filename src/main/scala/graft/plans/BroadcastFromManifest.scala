package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{HintInfo, Join, JoinHint, LogicalPlan, BROADCAST}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.SupportsReportStatistics
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, V1ScanWrapper}
import org.apache.spark.sql.internal.SQLConf

/** Broadcast eligibility for CATALOG-face graft tables (round 15).
  *
  * The graft catalog's scan bridges to the V1 relation through
  * [[org.apache.spark.sql.connector.read.V1Scan]], and Spark's
  * pushdown wraps every V1 scan in a `V1ScanWrapper` that does NOT
  * forward `SupportsReportStatistics` — so a DSv2ScanRelation over a
  * tiny graft dimension table reports `defaultSizeInBytes` (huge) and
  * its joins sort-merge (the same known limitation JDBC catalog
  * tables have). The scan's statistics ARE computed
  * (manifest-true bytes over the PRUNED file list, exact rows from
  * the row-count groups); this rule surfaces them through the one
  * public lever the optimizer exposes at this point: a BROADCAST
  * hint on a join side whose graft-scan leaves are PROVABLY small.
  *
  * Conservative by construction: the hint lands only when EVERY leaf
  * of the side is a graft V1-bridged scan with reported statistics,
  * their pruned byte sum clears the session's
  * `autoBroadcastJoinThreshold`, the side's subtree is ROW-BOUNDED
  * (only Project / Filter / SubqueryAlias between the join and the
  * leaves — no Generate/explode, no intermediate Join, no Expand,
  * nothing that can multiply rows past the leaf byte sum), and the
  * side carries no user hint already (a user hint always wins). The
  * row-bounded walk is what makes "leaf bytes over-estimate side
  * bytes" actually hold per-SUBTREE, not just per-leaf: a
  * `JoinHint(BROADCAST)` forces the broadcast regardless of runtime
  * size, so an explode above a 1 MB leaf must disqualify the side —
  * otherwise the forced broadcast of its multiplied output could OOM
  * the driver. A wrong smallness estimate under these guards can
  * cost spill-speed, never rows — hint semantics.
  */
object BroadcastFromManifest extends Rule[LogicalPlan] {

  /** Bytes of the side's graft leaves, but ONLY when every interior
    * node is row-bounded (emits at most its child's rows, at most its
    * child's column payload per row). Project is allowed because the
    * manifest byte sum prices the FULL row; a projection only narrows
    * it. Any other operator — Generate, Join, Expand, Aggregate
    * (collect_list can widen rows), Window, Union — returns None and
    * the side is never hinted.
    */
  private def graftScanBytes(plan: LogicalPlan): Option[Long] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, SubqueryAlias}
    def rowBounded(p: LogicalPlan): Boolean = p match {
      case _: DataSourceV2Relation | _: DataSourceV2ScanRelation => true
      case _: Project | _: Filter | _: SubqueryAlias => p.children.forall(rowBounded)
      case _ => false
    }
    if (!rowBounded(plan)) return None
    val leaves = plan.collectLeaves()
    val sizes = leaves.map {
      // the shape at this batch's position (the custom operator-
      // optimization rules run BEFORE V2ScanRelationPushDown): the
      // unpushed relation — size from the table's manifest (full
      // snapshot, an over-estimate of any later-pruned scan)
      case r: DataSourceV2Relation => r.table match {
        case t: graft.sources.GraftSqlTable =>
          Some(t.manifestSizeInBytes)
        case _ => None
      }
      // and the post-pushdown shape, in case a later batch re-runs
      // this rule: the scan's own statistics behind the V1 wrapper
      case r: DataSourceV2ScanRelation => r.scan match {
        case w: V1ScanWrapper => w.v1Scan match {
          case s: SupportsReportStatistics =>
            val sz = s.estimateStatistics().sizeInBytes()
            if (sz.isPresent) Some(sz.getAsLong) else None
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }
    if (sizes.nonEmpty && sizes.forall(_.isDefined))
      Some(sizes.flatten.sum)
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = SQLConf.get.autoBroadcastJoinThreshold
    if (threshold <= 0) return plan
    // the hint lands in Join.hint itself: ResolvedHint nodes are
    // folded away by EliminateResolvedHint long before this batch,
    // so only the JoinHint field reaches join-strategy selection
    plan.transformUp {
      case j @ Join(left, right, _, _, hint)
          if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
        // hint at most ONE side (the smaller qualifying one) — hinting
        // both would force a broadcast even when both are large-ish
        val lb = graftScanBytes(left).filter(_ <= threshold)
        val rb = graftScanBytes(right).filter(_ <= threshold)
        val bc = Some(HintInfo(strategy = Some(BROADCAST)))
        (lb, rb) match {
          case (Some(l), Some(r)) =>
            if (l <= r) j.copy(hint = JoinHint(bc, None))
            else j.copy(hint = JoinHint(None, bc))
          case (Some(_), None) => j.copy(hint = JoinHint(bc, None))
          case (None, Some(_)) => j.copy(hint = JoinHint(None, bc))
          case _ => j
        }
    }
  }
}
