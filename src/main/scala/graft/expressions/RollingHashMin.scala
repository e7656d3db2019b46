package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling-hash document fingerprint: the minimum over all
  * k-codepoint windows of the polynomial hash
  * `fold(acc -> acc*B + codepoint mod P)` — a single-permutation
  * winnowing-style MinHash computed in O(n) with an O(1) slide per window
  * (subtract the outgoing codepoint's `B^(k-1)` term, shift, add the
  * incoming codepoint). Strings shorter than k codepoints hash whole.
  *
  * Codepoint-level, matching the DuckDB oracle's `unicode(text[j:j])` fold
  * exactly on any input (not just ASCII); the oracle recomputes each window
  * hash by the plain fold — identical values, just without the O(1) slide.
  */
case class RollingHashMin(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_rolling_min"

  override def nullSafeEval(input: Any): Any =
    RollingHashMin.minHash(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RollingHashMin.minHash($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHashMin {

  /** Base and modulus: (P-1)*B + maxCodepoint < 2^63, and the slide's
    * `codepoint * B^(k-1) mod P` product stays under 2^63 too
    * (2^21 * 2^40 = 2^61).
    */
  val B = 256L
  val P = 1099511627689L // prime near 2^40

  private def foldHash(cps: Array[Int], from: Int, until: Int): Long = {
    var acc = 0L
    var i = from
    while (i < until) { acc = (acc * B + cps(i)) % P; i += 1 }
    acc
  }

  /** Decode codepoints straight from the UTF-8 bytes — no java.lang.String,
    * no boxed IntStream; one int[] sized by the byte count (an upper bound
    * on the codepoint count). Malformed input (Spark does not validate
    * UTF-8 on read) follows the Unicode "maximal subpart" replacement rule
    * that `new String(bytes, UTF_8)` applies, so the fingerprint of any
    * byte sequence equals the fingerprint of its String round-trip:
    * invalid leads (0x80–0xC1 — continuations-as-leads and overlong C0/C1
    * — and 0xF5+ beyond U+10FFFF) become one U+FFFD each; a valid lead
    * whose sequence is cut short becomes ONE U+FFFD covering the longest
    * valid prefix, with decoding resuming at the first offending byte.
    * Lead-specific second-byte ranges (E0→A0..BF, F0→90..BF, F4→80..8F)
    * reject overlong and out-of-range encodings at the lead, and a
    * well-formed-looking 3-byte sequence composing to a UTF-16 surrogate
    * (CESU-8, ED A0..BF xx) is one U+FFFD for all three bytes — both
    * exactly as the JDK decoder does.
    */
  private[expressions] def codePoints(s: UTF8String): (Array[Int], Int) = {
    val bytes = s.getBytes
    val len = bytes.length
    val out = new Array[Int](len)
    var i = 0
    var n = 0
    while (i < len) {
      val b0 = bytes(i) & 0xff
      if (b0 < 0x80) {
        out(n) = b0
        i += 1
      } else if (b0 < 0xc2 || b0 > 0xf4) {
        // continuation in lead position, overlong C0/C1 lead, or > U+10FFFF
        out(n) = 0xfffd
        i += 1
      } else {
        val need = if (b0 < 0xe0) 2 else if (b0 < 0xf0) 3 else 4
        // ED accepts generic continuations here; the surrogate range it
        // would encode is rejected AFTER composing (JDK consumes all 3).
        val lo2 = b0 match { case 0xe0 => 0xa0; case 0xf0 => 0x90; case _ => 0x80 }
        val hi2 = b0 match { case 0xf4 => 0x8f; case _ => 0xbf }
        // Consume the maximal valid prefix: lead, range-checked second
        // byte, then generic continuation bytes.
        var k = 1
        if (i + 1 < len) {
          val b1 = bytes(i + 1) & 0xff
          if (b1 >= lo2 && b1 <= hi2) {
            k = 2
            while (k < need && i + k < len && (bytes(i + k) & 0xc0) == 0x80) k += 1
          }
        }
        if (k == need) {
          val cp = need match {
            case 2 => ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f)
            case 3 =>
              ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
            case _ =>
              ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
                ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
          }
          // CESU-8 surrogate: structurally valid bytes, invalid scalar.
          out(n) = if (cp >= 0xd800 && cp <= 0xdfff) 0xfffd else cp
          i += need
        } else {
          out(n) = 0xfffd // the whole k-byte valid prefix is one subpart
          i += k
        }
      }
      n += 1
    }
    (out, n)
  }

  def minHash(s: UTF8String, k: Int): Long = {
    val (cps, n) = codePoints(s)
    if (n <= k) return foldHash(cps, 0, n)
    // B^(k-1) mod P for the O(1) slide.
    var bk1 = 1L
    var e = 0
    while (e < k - 1) { bk1 = (bk1 * B) % P; e += 1 }
    var h = foldHash(cps, 0, k)
    var min = h
    var s0 = 1
    while (s0 <= n - k) {
      val out = cps(s0 - 1) * bk1 % P
      h = ((h + P - out) % P * B + cps(s0 + k - 1)) % P
      if (h < min) min = h
      s0 += 1
    }
    min
  }
}
