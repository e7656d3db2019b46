package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fixed-width bitmap of a token-hash set: bit `h mod 64*words` is set for
  * every element `h`. The single-hash Bloom signature behind the PPJoin+
  * style suffix filter in [[graft.operators.Dedup.ppjoinCandidates]].
  *
  * `popcount(bitmap(A) & bitmap(B))` alone is NOT a bound on `|A ∩ B|` in
  * either direction (two distinct shared tokens can collide into one bit
  * and under-count); the lossless bound the filter uses is
  * `popcount(bmA & bmB) + min(|A| - popcount(bmA), |B| - popcount(bmB))`
  * — each side's own popcount deficit counts its within-set collisions,
  * which is exactly the most the AND-popcount can under-count by.
  *
  * Negative hashes are mapped by floor-mod (call sites produce
  * non-negative 60-bit md5 hashes, but the expression never indexes out
  * of range regardless); a null array — or a null element, were one ever
  * to appear — yields NULL loudly instead of garbage bits.
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

  override def nullable: Boolean =
    child.nullable || (child.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })

  override def prettyName: String = "graft_token_bitmap"

  override def nullSafeEval(input: Any): Any =
    TokenBitmap.bitmapOrNull(input.asInstanceOf[ArrayData], words)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c =>
        if (nullable)
          s"""
          Object tbR = graft.expressions.TokenBitmap.bitmapOrNull($c, $words);
          if (tbR == null) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) tbR;
          }
        """
        else
          s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
            s"graft.expressions.TokenBitmap.bitmapOrNull($c, $words);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenBitmap {

  /** Bitmap of the hash array; null (to null-propagate) on a null element. */
  def bitmapOrNull(harr: ArrayData, words: Int): ArrayData = {
    val out = new Array[Long](words)
    val bits = 64L * words
    val n = harr.numElements()
    var i = 0
    while (i < n) {
      if (harr.isNullAt(i)) return null
      val idx = java.lang.Math.floorMod(harr.getLong(i), bits).toInt
      out(idx >> 6) |= 1L << (idx & 63)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `popcount(a & b)` over two equal-width long-array bitmaps — the shared-
  * bit count the suffix filter combines with the per-side collision
  * deficits (see [[TokenBitmap]]). Null if either side is null.
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
