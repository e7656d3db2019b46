package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{
  Add,
  ArrayAggregate,
  Expression,
  LambdaFunction,
  Literal,
  Multiply,
  NamedLambdaVariable,
  ZipWith
}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the composable higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) }}}
  *
  * into the native codegen [[DotProduct]] expression. The two forms are
  * bit-identical by construction (same multiply-accumulate order, same null
  * outcomes — null array, length mismatch via zip_with's null padding, or
  * null element all yield null), so the rewrite is purely a physical win:
  * users writing the idiomatic declarative form get the primitive loop.
  *
  * Injected through `SparkSessionExtensions` by
  * [[graft.GraftSession.builder]] — the standard extension-point mechanism,
  * no forked Spark required.
  */
object RewriteDotFold extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _                      => false
  }

  /** (x, y) -> x * y over exactly the lambda's own two variables. */
  private def isPairwiseMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (isVar(m.left, x) && isVar(m.right, y)) || (isVar(m.left, y) && isVar(m.right, x))
    case _ => false
  }

  /** (acc, v) -> acc + v over exactly the lambda's own two variables. */
  private def isAccumulateAdd(f: Expression): Boolean = f match {
    case LambdaFunction(a: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (isVar(a.left, acc) && isVar(a.right, v)) || (isVar(a.left, v) && isVar(a.right, acc))
    case _ => false
  }

  /** finish lambda is the identity on its variable. */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(v: NamedLambdaVariable), _) => isVar(body, v)
    case _                                                    => false
  }

  private def isPlusZero(zero: Expression): Boolean = zero match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(v) == 0L // exactly +0.0
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(zw: ZipWith, zero, merge, finish)
        if isDoubleArray(zw.left) && isDoubleArray(zw.right) &&
          isPairwiseMultiply(zw.function) && isPlusZero(zero) &&
          isAccumulateAdd(merge) && isIdentityFinish(finish) =>
      DotProduct(zw.left, zw.right)
  }
}
