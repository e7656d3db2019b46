package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private def mask(s: String): (String, Long, Long, Long) =
    Seq(s).toDF("t")
      .select(
        Scrub.maskPii(col("t")),
        Scrub.emailCount(col("t")),
        Scrub.ipCount(col("t")),
        Scrub.phoneCount(col("t")))
      .as[(String, Long, Long, Long)].head()

  test("masks every category, multiple occurrences, counts on original text") {
    val (t, e, i, p) = mask(
      "mail a.b+c@x-y.org and d@e.io, host 10.0.255.4 or 192.168.1.1, call 555-0134 x")
    assert(t == "mail <EMAIL> and <EMAIL>, host <IP> or <IP>, call <PHONE> x")
    assert((e, i, p) == ((2L, 2L, 1L)))
  }

  test("email is masked before the numeric patterns can fire inside it") {
    val (t, e, i, p) = mask("u123-4567@h.com")
    assert(t == "<EMAIL>")
    assert((e, i, p) == ((1L, 0L, 0L)))
  }

  test("clean text passes through untouched") {
    val (t, e, i, p) = mask("no pii here just words")
    assert(t == "no pii here just words")
    assert((e, i, p) == ((0L, 0L, 0L)))
  }

  test("word boundaries keep long digit runs out of the phone mask, IPv4 over-matches prefixes") {
    val (t, _, i, p) = mask("version 1.2.3.4.5 and id 1234-56789 sect 1234.5.6.7")
    // "1.2.3.4" inside "1.2.3.4.5" IS masked — \b holds on both sides of
    // the 4-octet prefix (the dot is a non-word char), the usual
    // over-match of the simple IPv4 pattern and the safe direction for a
    // redaction pass. "1234.5.6.7" can't match (no boundary inside 1234),
    // and "1234-56789" is not a 3-4 phone split.
    assert(t == "version <IP>.5 and id 1234-56789 sect 1234.5.6.7")
    assert((i, p) == ((1L, 0L)))
  }
}
