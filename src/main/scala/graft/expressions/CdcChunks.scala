package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (the rolling-hash cut-point rule of
  * LBFS/FastCDC-style storage dedup): slide a `w`-codepoint Rabin–Karp
  * window over the text (same `B`/`P` as [[RollingHashMin]], O(1) per
  * slide); a chunk boundary falls AFTER position i whenever the window
  * hash is `≡ 0 mod d` — so chunk edges follow CONTENT, not offsets,
  * and an insertion early in a document only re-chunks the span it
  * touches (the property that makes CDC dedup robust where fixed-size
  * blocks are not). Returns `array<struct<pos, len, hash>>` — codepoint
  * offset, codepoint length, and the full-chunk polynomial hash that
  * identifies the chunk's content. Strings shorter than `w` are one
  * whole chunk; the empty string has no chunks.
  *
  * The DuckDB oracle recomputes every window hash by the plain fold
  * (O(n·w)) and every chunk hash by the same fold — identical values,
  * just without the O(1) slide.
  */
case class CdcChunks(child: Expression, w: Int, d: Long) extends UnaryExpression {
  require(w >= 1, "window must be >= 1")
  require(d >= 2, "divisor must be >= 2")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("len", LongType, nullable = false),
      StructField("hash", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.chunks(input.asInstanceOf[UTF8String], w, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CdcChunks.chunks($c, $w, ${d}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {
  import RollingHashMin.{B, P}

  def chunks(s: UTF8String, w: Int, d: Long): ArrayData = {
    val (cps, n) = RollingHashMin.codePoints(s)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // B^(w-1) mod P for the O(1) slide.
    var bw1 = 1L
    var e = 0
    while (e < w - 1) { bw1 = (bw1 * B) % P; e += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var h = 0L
    var i = 0
    def emit(end: Int): Unit = {
      var ch = 0L
      var j = start
      while (j < end) { ch = (ch * B + cps(j)) % P; j += 1 }
      out += InternalRow(start.toLong, (end - start).toLong, ch)
      start = end
    }
    while (i < n) {
      h = if (i < w) (h * B + cps(i)) % P
      else ((h + P - cps(i - w) * bw1 % P) % P * B + cps(i)) % P
      if (i >= w - 1 && h % d == 0 && i + 1 > start) emit(i + 1)
      i += 1
    }
    if (start < n) emit(n)
    new GenericArrayData(out.toArray)
  }
}
