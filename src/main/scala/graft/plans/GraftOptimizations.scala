package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.NfcNormalizeExpr

/** Catalyst optimizer rule for the graft expression library: collapses
  * idempotent applications (NFC normalization composed with itself is the
  * identity, so `nfc_normalize(nfc_normalize(x))` evaluates the inner call
  * only). Pipelines routinely re-normalize defensively at stage boundaries;
  * this removes the duplicated per-row work at plan time.
  *
  * Registered through SparkSessionExtensions (`injectOptimizerRule` via
  * graft.GraftExtensions) or at runtime on a live session
  * ([[GraftOptimizations.register]] → `spark.experimental.extraOptimizations`).
  */
object CollapseIdempotentGraftExprs extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NfcNormalizeExpr(inner @ NfcNormalizeExpr(_)) => inner
    }
}

object GraftOptimizations {
  val rules: Seq[Rule[LogicalPlan]] = Seq(CollapseIdempotentGraftExprs)

  /** Install into a live session. */
  def register(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    val missing = rules.filterNot(existing.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations = existing ++ missing
  }
}
