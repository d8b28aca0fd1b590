package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions hook registering the engine's native
  * expressions and plan rewrites for SQL use — enable with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * programmatically via `withExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fixed_point_dot"),
      new ExpressionInfo(classOf[FixedPointDot].getName, "fixed_point_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FixedPointDot(exprs(0), exprs(1))))
    // stat-shaped GROUP BY over a registered engine point view → served
    // from the rollup pyramid (post-hoc resolution: the view's
    // SubqueryAlias marker is erased by the optimizer's first batch)
    ext.injectPostHocResolutionRule(session =>
      new graft.plans.PyramidSubstitutionRule(session))
    // per-statement admission for daemon sessions (no-op unless the
    // session opted in via QueryGate.install — graft.Service does)
    ext.injectOptimizerRule(session =>
      new graft.plans.QueryGateRule(session))
  }
}
