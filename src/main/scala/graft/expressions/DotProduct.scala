package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * Semantically identical to the composable form
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` (see
  * [[graft.operators.Dedup.dotFoldHof]]): a strict left-to-right
  * multiply-accumulate from 0.0, so results are bit-for-bit equal to both
  * the higher-order-function fold and DuckDB's `list_reduce` replay in the
  * oracle. Null if either array is null, the lengths differ, or any element
  * is null (the same outcomes the HOF chain produces).
  *
  * Why a custom expression: the HOF form allocates an intermediate products
  * array and interprets a lambda per element, and lambda-bearing expressions
  * are excluded from whole-stage codegen's subexpression elimination. This
  * compiles to a tight primitive loop via `doGenCode` — the hot path of the
  * embedding dedup and ANN operators, called O(n^2 / buckets) times.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = ctx.freshName("arrA")
    val b = ctx.freshName("arrB")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val ok = ctx.freshName("ok")
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${leftGen.isNull} && !${rightGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${leftGen.value};
        org.apache.spark.sql.catalyst.util.ArrayData $b = ${rightGen.value};
        int $n = $a.numElements();
        if ($n == $b.numElements()) {
          boolean $ok = true;
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $ok = false; break; }
            $acc += $a.getDouble($i) * $b.getDouble($i);
          }
          if ($ok) { ${ev.isNull} = false; ${ev.value} = $acc; }
        }
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
