package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DotProduct, L2Micros}

/** SparkSessionExtensions hook: registers the engine's native expressions in
  * the SQL function registry, so `spark.sql("... vec_dot(a, b) ...")` works
  * the same as the Column API, and installs the optimizer rule that rewrites
  * the HOF dot-product spelling to the fused kernel
  * ([[graft.plans.RewriteHofDotProduct]]). Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (cluster-wide,
  * no code change for SQL users) — `GraftSession.tune` does this by default.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b) takes exactly two arguments")
        DotProduct(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_l2_micros"),
      new ExpressionInfo(classOf[L2Micros].getName, "vec_l2_micros"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "vec_l2_micros(a, b) takes exactly two arguments")
        L2Micros(args.head, args(1))
      }))
  }
}
