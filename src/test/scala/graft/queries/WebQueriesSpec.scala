package graft.queries

import graft.SparkSpec

/** Locks the web-ingestion family driver-side: each query's per-document
  * signals are replayed in plain Scala with the same regex patterns, so the
  * Spark column expressions are checked against an independent
  * implementation rather than against themselves.
  */
class WebQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def plantedHtml(id: Long, text: String): String = {
    val a =
      if (id % 4 == 0)
        s"""<a href="https://site${id % 7}.example.com/d$id">more info here</a>"""
      else ""
    val s = if (id % 6 == 0) "<script>var x = 1;</script>" else ""
    val c = if (id % 9 == 0) "<!-- tracking pixel -->" else ""
    s"""<div id="main"><h1>Doc $id</h1><p>$text</p>$a$s$c</div>"""
  }

  test("ta_html: counts and stripped text replay with java.util.regex") {
    val docs = spark.read
      .parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .as[(Long, String)]
      .collect()
      .toMap
    val got = WebQueries
      .taHtml(spark, dir)
      .as[(Long, String, Long, Long, Long, Long, Long, Double, Double)]
      .collect()
    assert(got.length == docs.size)
    got.take(200).foreach { case (id, clean, nTags, nLinks, nScripts, aChars, vChars, _, _) =>
      val html = plantedHtml(id, docs(id))
      val expectClean = html
        .replaceAll(graft.functions.WebText.ScriptRe, " ")
        .replaceAll(graft.functions.WebText.CommentRe, " ")
        .replaceAll(graft.functions.WebText.TagRe, " ")
        .replaceAll("\\s+", " ")
        .trim
      assert(clean == expectClean, s"doc $id clean text")
      assert(nTags == graft.functions.WebText.TagRe.r.findAllIn(html).length, s"doc $id tags")
      assert(nLinks == (if (id % 4 == 0) 1 else 0), s"doc $id links")
      assert(nScripts == (if (id % 6 == 0) 1 else 0), s"doc $id scripts")
      assert(aChars == (if (id % 4 == 0) "more info here".length.toLong else 0L), s"doc $id anchor chars")
      assert(vChars == expectClean.length.toLong, s"doc $id visible chars")
    }
  }

  test("ta_urls: domain accounting is exact for the planted URL population") {
    val ids = spark.read
      .parquet(s"$dir/documents.parquet")
      .select("doc_id")
      .as[Long]
      .collect()
    val rows = WebQueries
      .taUrls(spark, dir)
      .as[(String, Long, Long, Long, Long)]
      .collect()
    // replay the planting: %4 -> https on site{id%7}.example.com (www-
    // stripped), %10 -> http on cdn{id%3}.example.org
    val planted = ids.flatMap { id =>
      val a =
        if (id % 4 == 0) Seq((s"site${id % 7}.example.com", id, true)) else Seq.empty
      val b =
        if (id % 10 == 0) Seq((s"cdn${id % 3}.example.org", id, false)) else Seq.empty
      a ++ b
    }
    val byDomain = planted.groupBy(_._1)
    assert(rows.map(_._1).toSet == byDomain.keySet)
    rows.foreach { case (domain, nUrls, nDocs, nHttps, minDoc) =>
      val p = byDomain(domain)
      assert(nUrls == p.length.toLong, s"$domain urls")
      assert(nDocs == p.map(_._2).distinct.length.toLong, s"$domain docs")
      assert(nHttps == p.count(_._3).toLong, s"$domain https")
      assert(minDoc == p.map(_._2).min, s"$domain min doc")
      assert(!domain.startsWith("www."), s"$domain normalized")
    }
  }

  test("ta_mojibake: damage counts replay exactly; flag fires iff damage planted") {
    val got = WebQueries
      .taMojibake(spark, dir)
      .as[(Long, Long, Long, Long, Double, Boolean)]
      .collect()
    assert(got.nonEmpty)
    got.foreach { case (id, nRepl, nCtrl, _, asciiFrac, suspect) =>
      val expectRepl = if (id % 6 == 0) id % 3 + 1 else 0L
      // base document text is ASCII-only in the synthetic corpus, so the
      // planted C0 pair is the only control content
      val expectCtrl = if (id % 9 == 0) 2L else 0L
      assert(nRepl == expectRepl, s"doc $id replacement chars")
      assert(nCtrl == expectCtrl, s"doc $id control chars")
      assert(suspect == (expectRepl > 0 || expectCtrl > 0), s"doc $id flag")
      assert(asciiFrac >= 0.0 && asciiFrac <= 1.0, s"doc $id ascii frac")
    }
    assert(got.exists(_._6), "fixture plants at least one suspect doc")
    assert(got.exists(!_._6), "fixture keeps at least one clean doc")
  }
}
