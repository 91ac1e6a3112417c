package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, KmvDistinct}

/** SparkSessionExtensions entry point: enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  * Injects the engine's native functions into every session built from that
  * config (SQL and `call_function` both resolve them). Sessions not built
  * with the config can call [[graft.functions.VectorFunctions.ensureRegistered]]
  * instead — the operators do so themselves, defensively. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // the custom as-of join strategy (graft.plans) for config-based
    // sessions; imperative sessions get it via AsofJoin.ensureStrategy
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "vec_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "kmv_distinct"),
      (children: Seq[Expression]) => {
        val k = if (children.length > 1)
          children(1).eval(null).asInstanceOf[Number].intValue() else 256
        KmvDistinct(children.head, k).toAggregateExpression()
      }))
  }
}
