package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling-hash document fingerprint: the minimum over all
  * k-byte windows of the polynomial hash `fold(acc -> acc*B + byte mod P)`
  * — a single-permutation winnowing-style MinHash computed in O(n) with an
  * O(1) slide per window (subtract the outgoing byte's `B^(k-1)` term,
  * shift, add the incoming byte). Strings shorter than k hash whole.
  *
  * Byte-level (== codepoint-level on ASCII corpora, which the oracle
  * relies on); the DuckDB replay recomputes each window hash by the plain
  * fold — identical values, just without the O(1) slide.
  */
case class RollingHashMin(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_rolling_min"

  override def nullSafeEval(input: Any): Any =
    RollingHashMin.minHash(input.asInstanceOf[UTF8String].getBytes, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RollingHashMin.minHash($c.getBytes(), $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHashMin {

  /** Base and modulus: codepoints fit under B; acc*B stays within int64. */
  val B = 256L
  val P = 1099511627689L // prime near 2^40; (P-1)*B + 255 < 2^63

  private def foldHash(bytes: Array[Byte], from: Int, until: Int): Long = {
    var acc = 0L
    var i = from
    while (i < until) { acc = (acc * B + (bytes(i) & 0xffL)) % P; i += 1 }
    acc
  }

  def minHash(bytes: Array[Byte], k: Int): Long = {
    val n = bytes.length
    if (n <= k) return foldHash(bytes, 0, n)
    // B^(k-1) mod P for the O(1) slide.
    var bk1 = 1L
    var e = 0
    while (e < k - 1) { bk1 = (bk1 * B) % P; e += 1 }
    var h = foldHash(bytes, 0, k)
    var min = h
    var s = 1
    while (s <= n - k) {
      val out = (bytes(s - 1) & 0xffL) * bk1 % P
      h = ((h + P - out) % P * B + (bytes(s + k - 1) & 0xffL)) % P
      if (h < min) min = h
      s += 1
    }
    min
  }
}
