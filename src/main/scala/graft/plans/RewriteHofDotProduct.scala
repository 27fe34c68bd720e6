package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.expressions.DotProduct

/** Optimizer rule: the idiomatic higher-order spelling of a dot product —
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0d, (acc, x) => acc + x) }}}
  *
  * — evaluates its lambdas interpreted (HOFs are outside whole-stage
  * codegen) and allocates the zipped array per row. This rule rewrites the
  * exact pattern to the fused native [[graft.expressions.DotProduct]]
  * kernel, which has identical semantics: sequential left-to-right double
  * accumulation, NULL on null input, null element, or length mismatch
  * (zip_with pads the shorter side with null → null product → null sum,
  * exactly DotProduct's length-mismatch NULL). Users keep writing the
  * portable HOF form; plans get the kernel.
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isArgProduct(fn: LambdaFunction): Boolean = fn match {
    case LambdaFunction(Multiply(l: NamedLambdaVariable,
        r: NamedLambdaVariable, _), Seq(a: NamedLambdaVariable,
        b: NamedLambdaVariable), _) =>
      Set(l.exprId, r.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  private def isArgSum(fn: LambdaFunction): Boolean = fn match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable,
        _), Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      Set(l.exprId, r.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  private def isIdentity(fn: LambdaFunction): Boolean = fn match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable),
        _) => v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, mult: LambdaFunction),
          Literal(0.0, DoubleType), merge: LambdaFunction,
          finish: LambdaFunction)
          if isDoubleArray(a) && isDoubleArray(b) &&
            isArgProduct(mult) && isArgSum(merge) && isIdentity(finish) =>
        DotProduct(a, b)
    }
}
