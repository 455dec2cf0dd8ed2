package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `round(round(x, n), n)` → `round(x, n)` for equal
  * literal scales — HALF_UP rounding is idempotent at the same scale.
  *
  * The double-round shows up naturally in this engine: query authors
  * round similarity scores for oracle stability, and composed pipelines
  * (e.g. a rounded cosine fed into a rounded aggregate projection) can
  * end up rounding twice. The inner round is pure overhead in the
  * per-row hot path; this removes it at plan time.
  *
  * Injected via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) — the minimal example of extending Catalyst's
  * optimizer rather than hand-rewriting call sites.
  */
object CollapseRedundantRound extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case outer @ Round(inner: Round, outerScale: Literal, _)
        if inner.scale.isInstanceOf[Literal] &&
          inner.scale.asInstanceOf[Literal].value == outerScale.value =>
        inner
    }
}
