package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fixed-width bitmap of a token-hash set: bit `h mod 64*words` is set for
  * every element `h`. The single-hash Bloom signature behind the PPJoin+
  * style suffix filter in [[graft.operators.Dedup.ppjoinCandidates]]:
  * because every SHARED token sets the SAME bit on both sides,
  * `popcount(bitmap(A) & bitmap(B))` is a LOSSLESS upper bound on
  * `|A ∩ B|` (collisions only ever inflate it), computable from 8*words
  * bytes per record instead of the full sorted arrays.
  *
  * Input hashes are the non-negative 60-bit md5-derived shingle/token
  * hashes; a null array yields null.
  */
case class TokenBitmap(child: Expression, words: Int) extends UnaryExpression {
  require(words >= 1, "words must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_token_bitmap"

  override def nullSafeEval(input: Any): Any =
    TokenBitmap.bitmap(input.asInstanceOf[ArrayData], words)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenBitmap.bitmap($c, $words)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenBitmap {

  def bitmap(harr: ArrayData, words: Int): ArrayData = {
    val out = new Array[Long](words)
    val bits = 64L * words
    val n = harr.numElements()
    var i = 0
    while (i < n) {
      val idx = (harr.getLong(i) % bits).toInt // hashes are non-negative
      out(idx >> 6) |= 1L << (idx & 63)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `popcount(a & b)` over two equal-width long-array bitmaps — the upper
  * bound on set intersection used by the suffix filter. Null if either
  * side is null.
  */
case class BitmapOverlapBound(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<bigint> args, got ${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_bitmap_overlap_bound"

  override def nullSafeEval(a: Any, b: Any): Any =
    BitmapOverlapBound.andPopcount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      (a, b) => s"graft.expressions.BitmapOverlapBound.andPopcount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BitmapOverlapBound {

  def andPopcount(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    acc
  }
}
