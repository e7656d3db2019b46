package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All k-window shingle hashes of a token-hash array in one pass — the
  * native twin of
  * `transform(sequence(1, n-k+1), i -> shingleHash(slice(th, i, k)))` with
  * the whole-array fallback for short docs. Same fold constants as
  * [[graft.operators.Dedup.shingleHash]] (verified value-equal by
  * `ShingleHashesSpec`), but a single primitive loop instead of a per-window
  * slice allocation + interpreted lambda fold. Inputs are non-null token
  * hashes (md5-derived); a null array yields null.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.windows(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleHashes.windows($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {

  // Same constants as Dedup.shingleHash / Dedup.sqlShingleHashDuck.
  private val P = 2305843009213693951L
  private val Seed = 1099511628211L
  private val A1 = 794877253L
  private val A2 = 948253789L
  private val A3 = 648435761L
  private val A4 = 1029388717L
  private val B = 386910071L
  private val M30 = (1L << 30) - 1

  @inline private def combine(acc: Long, h: Long): Long =
    (A1 * (acc >> 30) + A2 * (acc & M30) + A3 * (h >> 30) + A4 * (h & M30) + B) % P

  /** Window hashes for positions 0..n-k (or one whole-array fold if n<k). */
  def windows(th: ArrayData, k: Int): ArrayData = {
    val n = th.numElements()
    if (n < k) {
      var acc = Seed
      var i = 0
      while (i < n) { acc = combine(acc, th.getLong(i)); i += 1 }
      new GenericArrayData(Array(acc))
    } else {
      val out = new Array[Long](n - k + 1)
      var s = 0
      while (s <= n - k) {
        var acc = Seed
        var j = 0
        while (j < k) { acc = combine(acc, th.getLong(s + j)); j += 1 }
        out(s) = acc
        s += 1
      }
      new GenericArrayData(out)
    }
  }
}
