package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.DotProduct

/** Canonical engine registration via SparkSessionExtensions — the
  * mechanism SURVEY.md §7 reserves for custom plan surface. Users opt
  * in with either
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.engine.GraftExtensions`; library
  * entry points ([[graft.plans.Functions.register]],
  * [[graft.plans.TopK.topKPerKey]]) also self-register per session so
  * the extension class is a convenience, not a requirement.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graftbridge.TopKPerKeyStrategy)
  }
}
