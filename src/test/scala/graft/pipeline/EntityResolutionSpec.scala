package graft.pipeline

import graft.SparkSpec
import graft.metrics.Quality
import graft.output.Writers
import graft.sources.AminerReader
import java.nio.file.Files

/** End-to-end pipeline over tiny AMiner-format fixtures (FIXTURES.md §1):
  * parse -> filter -> clean -> match (full + blocked) -> cluster -> emit.
  * Expected pair sets are hand-computed from the reference semantics.
  */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def rec(title: String, authors: String, year: Int, venue: String,
      index: String, refs: Seq[String] = Nil): String = {
    val refLines = refs.map(r => s"#%$r")
    (Seq(s"#*$title", s"#@$authors", s"#t$year", s"#c$venue", s"#index$index") ++ refLines)
      .mkString("\n")
  }

  private lazy val dir = Files.createTempDirectory("graft-er").toString

  private lazy val dblpPath = {
    val recs = Seq(
      rec("Implementing Deletion in B+-Trees.", "Jan Jannink", 1995, "SIGMOD Record",
        "d1", Seq("ref-a", "ref-b")),
      rec("Implementing Deletion in B+-Trees Efficiently.", "Jan Jannink", 1995,
        "SIGMOD Record", "d1b"),
      rec("Why Decision Support Fails and How To Fix It.",
        "Ralph Kimball, Kevin Strehlo", 1995, "SIGMOD Record", "d2"),
      rec("Query Optimization Techniques", "Pat Selinger", 1995, "VLDB Journal", "d3"),
      rec("Too Old Paper", "Old Author", 1990, "SIGMOD Record", "d-old"),
      rec("Wrong Venue Paper", "Some Author", 2000, "ICDE Proceedings", "d-icde"))
    val p = s"$dir/dblp.txt"
    Files.writeString(java.nio.file.Paths.get(p), recs.mkString("\n\n"))
    p
  }

  private lazy val acmPath = {
    val recs = Seq(
      rec("Implementing deletion in B+-trees", "Jan Jannink", 1995, "SIGMOD Record", "a1"),
      // accents + digits in authors normalize away; title drops one stopword
      rec("Why Decision Support Fails and How To Fix It",
        "Ralph Kímball, Kevin Strehlo123", 1995, "ACM SIGMOD Record", "a2"),
      // same content as d3 but 4 years later: found by full, missed by N=1
      rec("Query Optimization Techniques", "Pat Selinger", 1999, "VLDB Journal", "a3"))
    val p = s"$dir/acm.txt"
    Files.writeString(java.nio.file.Paths.get(p), recs.mkString("\n\n"))
    p
  }

  private lazy val dblp = EntityResolution.prepareDataset(spark, dblpPath).cache()
  private lazy val acm = EntityResolution.prepareDataset(spark, acmPath).cache()
  private lazy val fullPairs = EntityResolution.matchPairs(dblp, acm).cache()

  test("parse: multi-valued references joined with ', '; fields extracted") {
    val parsed = AminerReader.load(spark, dblpPath)
    val d1 = parsed.filter($"index" === "d1").collect()(0)
    assert(d1.getAs[String]("references") == "ref-a, ref-b")
    assert(d1.getAs[String]("title") == "implementing deletion in b+-trees.")
    assert(d1.getAs[Int]("year") == 1995)
    assert(d1.getAs[String]("publication venue") == "sigmod record")
  }

  test("year/venue filter drops out-of-scope records") {
    assert(dblp.count() == 4) // d-old and d-icde filtered
    assert(acm.count() == 3)
  }

  test("cleaning: stopwords out of titles, authors normalized") {
    val d2 = dblp.filter($"index" === "d2").collect()(0)
    assert(d2.getAs[String]("title") == "decision support fails fix it")
    assert(d2.getAs[String]("authors") == "kimball ralph, kevin strehlo")
    assert(d2.getAs[Int]("num_authors") == 2)
  }

  test("full match finds the 4 expected pairs") {
    val got = fullPairs.select("dblp_title", "acm_title").as[(String, String)].collect().toSet
    assert(got == Set(
      ("implementing deletion b+-trees", "implementing deletion b+-trees"),
      ("implementing deletion b+-trees efficiently", "implementing deletion b+-trees"),
      ("decision support fails fix it", "decision support fails fix"),
      ("query optimization techniques", "query optimization techniques")))
  }

  test("blocked N=1 misses the 4-year-gap pair; N=5 finds all") {
    val cfgN1 = EntityResolution.Config(yearBlockSize = Some(1))
    val blocked1 = EntityResolution.matchPairs(dblp, acm, cfgN1)
    assert(blocked1.count() == 3)
    val cfgN5 = EntityResolution.Config(yearBlockSize = Some(5))
    assert(EntityResolution.matchPairs(dblp, acm, cfgN5).count() == 4)
  }

  test("metrics: blocked N=1 vs full -> P=1.0, R=0.75") {
    val blocked = EntityResolution.matchPairs(
      dblp, acm, EntityResolution.Config(yearBlockSize = Some(1)))
    val m = Quality.measure(fullPairs, blocked)
    assert(m.trueDuplicates == 4 && m.blockedDuplicates == 3)
    assert(m.truePositives == 3 && m.falseNegatives == 1 && m.falsePositives == 0)
    assert(m.precision == 1.0 && m.recall == 0.75 && m.f1 == 0.857)
  }

  test("clustering: transitive pair chain collapses; 3 entities total") {
    val clustered = EntityResolution.resolveEntities(fullPairs).cache()
    // 7 matched nodes: {d1, d1b, a1}, {d2, a2}, {d3, a3}
    assert(clustered.count() == 7)
    val sizes = clustered.groupBy("cluster_id").count().as[(Long, Long)].collect()
      .map(_._2).sorted.toSeq
    assert(sizes == Seq(2L, 2L, 3L))
    // every cluster spans both datasets
    val spans = clustered.select("cluster_id", "df_name").distinct()
      .groupBy("cluster_id").count().as[(Long, Long)].collect().map(_._2).toSeq
    assert(spans.forall(_ == 2L))
  }

  test("emitEntities: one wide row per cluster with golden column names") {
    val clustered = EntityResolution.resolveEntities(fullPairs)
    val wide = EntityResolution.emitEntities(clustered, dblp, acm)
    assert(wide.columns.toSeq == Seq("acm_first(value)", "dblp_first(value)"))
    assert(wide.count() == 3)
    // representative raw values round-trip: each row carries real record text
    val rows = wide.collect()
    rows.foreach { r =>
      assert(r.getString(0) != null && r.getString(0).contains("#index"))
      assert(r.getString(1) != null && r.getString(1).contains("#index"))
    }
  }

  test("TSV sink writes + renames to Matched_Entities.csv") {
    val clustered = EntityResolution.resolveEntities(fullPairs)
    val wide = EntityResolution.emitEntities(clustered, dblp, acm)
    val out = s"$dir/out_csv"
    Writers.writeCsvRenamed(wide, out)
    val f = new java.io.File(s"$out/Matched_Entities.csv")
    assert(f.exists())
    val lines = Files.readAllLines(java.nio.file.Paths.get(f.getPath))
    assert(lines.get(0) == "acm_first(value)\tdblp_first(value)")
    assert(lines.size() == 4)
  }
}
