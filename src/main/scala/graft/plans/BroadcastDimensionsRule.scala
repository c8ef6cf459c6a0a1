package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: auto-broadcast REGISTERED dimension tables.
  *
  * On a 1000-executor cluster, statistics for freshly-landed dimension
  * files are often missing or stale, so the planner falls back to a
  * shuffle join and pays two full exchanges for a join against a
  * megabyte-sized dimension. Pipelines know their dimensions; this rule
  * lets them declare that knowledge once ([[BroadcastDimensions.register]])
  * and have EVERY query pick the broadcast plan — the same reasoning as
  * Spark's own `spark.sql.autoBroadcastJoinThreshold`, but driven by
  * curated table identity instead of (possibly absent) size estimates.
  *
  * Mechanics: a `Join` whose side reads only registered dimension files
  * gets a BROADCAST join hint injected (unless the user already hinted),
  * restricted to join types where broadcasting that side is legal.
  * `JoinSelection` then plans a BroadcastHashJoin exactly as if the user
  * had written `broadcast(dim)`. Asserted in PlanSpec with the size-based
  * threshold disabled.
  *
  * Injection paths (both public API):
  *  - builder-time: `new GraftExtensions` (injectOptimizerRule), or
  *  - on a live session: `BroadcastDimensions.install(spark)`
  *    (spark.experimental.extraOptimizations).
  */
case class BroadcastDimensionsRule() extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, joinType, _, hint) =>
      val newLeft =
        if (hint.leftHint.isEmpty && canBroadcastLeft(joinType) && isDim(left))
          Some(HintInfo(strategy = Some(BROADCAST)))
        else hint.leftHint
      val newRight =
        if (hint.rightHint.isEmpty && canBroadcastRight(joinType) && isDim(right))
          Some(HintInfo(strategy = Some(BROADCAST)))
        else hint.rightHint
      val newHint = JoinHint(newLeft, newRight)
      if (newHint != hint) j.copy(hint = newHint) else j
  }

  // broadcasting the preserved side of an outer join is not legal
  private def canBroadcastRight(jt: JoinType): Boolean = jt match {
    case Inner | Cross | LeftOuter | LeftSemi | LeftAnti => true
    case _ => false
  }
  private def canBroadcastLeft(jt: JoinType): Boolean = jt match {
    case Inner | Cross | RightOuter => true
    case _ => false
  }

  /** True iff every leaf of the subplan is a scan over a registered
    * dimension (joins/filters/projects above dim scans still count) AND the
    * subplan's estimated size fits the broadcast cap. The cap is the guard
    * against a registration accident: an unlucky name collision (a large
    * fact table whose directory or table name matches a registered dim)
    * must degrade to a shuffle join, never force a driver-OOM broadcast. */
  private def isDim(p: LogicalPlan): Boolean = {
    val leaves = p.collectLeaves()
    val allDims = leaves.nonEmpty && leaves.forall {
      case lr: LogicalRelation =>
        // catalog identity first: saveAsTable'd / registered-external dims
        // carry a CatalogTable regardless of where their files live
        // accept bare, db-qualified, and catalog-qualified spellings — the
        // identifier renders 3-part (spark_catalog.db.t) on Spark 4
        val byCatalog = lr.catalogTable.exists { ct =>
          val id = ct.identifier
          val spellings = Set(id.table, id.unquotedString) ++
            id.database.map(d => s"$d.${id.table}")
          spellings.intersect(BroadcastDimensions.registered).nonEmpty
        }
        val byPath = lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.nonEmpty && fs.location.rootPaths.forall { rp =>
              BroadcastDimensions.registered.exists(t =>
                // full registered path, or the curated-name convention
                rp.toString == t || rp.toString.stripSuffix("/") == t.stripSuffix("/") ||
                  rp.getName == s"$t.parquet" || rp.getName == t)
            }
          case _ => false
        }
        byCatalog || byPath
      case _ => false
    }
    // cap the SUM OF LEAF sizes, not the subplan estimate: without CBO a
    // Join's sizeInBytes is the product of its children, so a join of two
    // genuinely small dims would blow past any cap and silently lose its
    // broadcast — the exact case "joins above dim scans still count" exists
    // for. Leaf-sum is the right proxy for what the broadcast would carry.
    allDims &&
      leaves.map(_.stats.sizeInBytes).sum <= BroadcastDimensions.maxBroadcastBytes
  }
}

object BroadcastDimensions {
  /** Curated dimension identities: a catalog table name (`nation` or
    * `db.nation`), a full source path, or the bare-name file convention
    * (`<name>.parquet` / dir named `<name>`). */
  @volatile private[graft] var registered: Set[String] = Set("region", "nation")

  /** Size cap for rule-injected broadcasts. File relations report real file
    * sizes, unknown-size relations report Long.MaxValue — both do the right
    * thing here (a registered-by-mistake 100 GB "dimension" degrades to a
    * shuffle join instead of flattening the driver). */
  @volatile var maxBroadcastBytes: Long = 256L << 20

  def register(tables: String*): Unit = { registered ++= tables }

  /** Install on a live session via the public experimental-optimizations
    * hook (idempotent). Builder-time injection goes through GraftExtensions. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[BroadcastDimensionsRule]))
      spark.experimental.extraOptimizations = cur :+ BroadcastDimensionsRule()
  }
}
