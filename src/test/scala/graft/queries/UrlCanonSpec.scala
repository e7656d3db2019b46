package graft.queries

import graft.SparkSpec

/** Locks the URL canonicalizer: every planted surface form must collapse
  * to the literal expected key, and the grouped output must account for
  * every referencing document.
  */
class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("all four surface forms collapse to site{a}.example.com/page/{b}") {
    val ids = spark.read.parquet(s"$dir/documents.parquet").select("doc_id").as[Long].collect()
    val rows = WebQueries.ddUrlcanon(spark, dir).as[(String, Long, Long, Long)].collect()
    val expect = ids.groupBy(id => (id % 40, id % 25))
    assert(rows.length == expect.size)
    rows.foreach { case (canonical, nRefs, nForms, firstDoc) =>
      val m = "^site(\\d+)\\.example\\.com/page/(\\d+)$".r.findFirstMatchIn(canonical)
      assert(m.isDefined, s"unexpected canonical form: $canonical")
      val key = (m.get.group(1).toLong, m.get.group(2).toLong)
      val members = expect(key)
      assert(nRefs == members.length.toLong, s"$canonical refs")
      assert(firstDoc == members.min, s"$canonical first doc")
      // distinct surface forms present = distinct (doc_id div 40) % 4
      // residues among the key's members
      assert(nForms == members.map(id => (id / 40) % 4).distinct.length.toLong, s"$canonical forms")
    }
    // the fixture exercises the cross-form collapse: some key holds at
    // least two different surface forms (sf0.001's 500 ids give 2–3
    // members per key; the full four-form collapse shows at sf0.01)
    assert(rows.exists(_._3 >= 2L), "a key collapsing multiple surface forms exists")
  }

  test("mid-query tracking params collapse; anchored names don't over-match") {
    val cases = Seq(
      // mid-query tracking param: must land on the tracking-free key
      "https://a.com/p?a=1&utm_x=2&b=3" -> "a.com/p?a=1&b=3",
      "https://a.com/p?a=1&b=3" -> "a.com/p?a=1&b=3",
      // consecutive mid-query tracking params leave no '&&' residue
      "https://a.com/p?a=1&utm_a=1&utm_b=2&b=3" -> "a.com/p?a=1&b=3",
      // leading tracking param
      "https://a.com/p?utm_s=f&b=3" -> "a.com/p?b=3",
      // only tracking params: whole query goes
      "https://a.com/p?utm_s=f&fbclid=x" -> "a.com/p",
      // anchored: 'xfbclid' is NOT a tracking param, nor a name inside a value
      "https://a.com/p?xfbclid=1" -> "a.com/p?xfbclid=1",
      "https://a.com/p?q=utm_x%3D1" -> "a.com/p?q=utm_x%3D1")
    val got = cases.map(_._1).toDF("url")
      .select(graft.functions.WebText.canonicalUrl($"url"))
      .as[String].collect()
    cases.map(_._2).zip(got).foreach { case (want, g) => assert(g == want, s"want $want got $g") }
  }
}
