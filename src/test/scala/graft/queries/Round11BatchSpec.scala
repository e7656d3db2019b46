package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant locks for the round-11 batch-1 queries, each pinned against
  * an independent in-test replay (brute-force Scala over the collected
  * sf0.001 tables) rather than row snapshots — the LinkpredSpec device.
  */
class Round11BatchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("er_metablock matches a brute-force purge/CBS/WNP replay") {
    val docs = spark.read
      .parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // blocks: (lang, word-trigram) with per-doc distinct shingles
    val membership = docs.flatMap { case (id, lang, text) =>
      val ts = text.split(" ")
      ts.sliding(3)
        .filter(_.length == 3)
        .map(w => (lang, w.mkString(" ")))
        .toSet[(String, String)]
        .map(k => (k, id))
    }
    val byBlock =
      membership.groupBy(_._1).view.mapValues(_.map(_._2).toList.sorted).toMap
    val kept = byBlock.filter { case (_, ms) => ms.length >= 2 && ms.length <= 24 }
    val cbs = kept.values.toList
      .flatMap(ms => for (a <- ms; b <- ms if a < b) yield (a, b))
      .groupBy(identity)
      .view
      .mapValues(_.size.toLong)
      .toMap
    val nodeAvg = cbs.toSeq
      .flatMap { case ((a, b), w) => Seq((a, w), (b, w)) }
      .groupBy(_._1)
      .view
      .mapValues(ws => ws.map(_._2).sum.toDouble / ws.size)
      .toMap
    val expect = cbs.filter { case ((a, b), w) =>
      w >= math.min(nodeAvg(a), nodeAvg(b))
    }
    val got = ErQueries
      .metablock(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(got == expect, s"got ${got.size} edges, expected ${expect.size}")
    assert(got.nonEmpty, "vacuous: no retained edges at sf0.001")
    // WNP must actually prune something, or the test proves nothing
    assert(got.size < cbs.size, "pruning removed no edge")
    graft.Caches.releaseAll()
  }

  test("gr_richclub: counts are monotone in k, phi in [0,1], totals replay") {
    val rows = GraphQueries
      .grRichclub(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.map(_._1).toSeq == Seq(32, 64, 96, 128, 160, 192, 224))
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._2 >= hi._2 && lo._3 >= hi._3, s"counts not monotone at k=${hi._1}")
    }
    rows.foreach { case (k, n, e, phi) =>
      if (n >= 2) {
        assert(phi.isDefined && phi.get >= 0.0 && phi.get <= 1.0, s"phi out of range at k=$k")
        assert(phi.get == 2.0 * e / (n * (n - 1L)), s"phi formula at k=$k")
      } else assert(phi.isEmpty && e == 0L, s"degenerate level k=$k")
    }
    assert(rows.head._2 > 0, "vacuous: no node clears the lowest level")
  }

  test("mm_clipfilter replays the surrogate cosine bit-for-bit") {
    val emb = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .toMap
    val got = SourceQueries
      .mmClipfilter(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(got.nonEmpty && got.exists(_._3) && got.exists(!_._3), "threshold must split the corpus")
    got.foreach { case (id, score, keep) =>
      val v = emb(id)
      val img = Array.tabulate(64)(i => 0.75 * v(i) + 0.25 * v((i + 1) % 64) + 0.05 * ((id + i) % 7 - 3))
      def dot(a: Array[Double], b: Array[Double]): Double = {
        var acc = 0.0; var i = 0
        while (i < 64) { acc += a(i) * b(i); i += 1 }; acc
      }
      val expect = dot(v, img) / (math.sqrt(dot(v, v)) * math.sqrt(dot(img, img)))
      assert(score == expect, s"doc $id: $score != $expect")
      assert(keep == (score >= 0.65), s"doc $id keep")
    }
  }

  test("emb_audit: planted damage counts follow the residue rules") {
    val rows = AnnQueries
      .embAudit(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val ids = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.map(_._2).sum == ids.length)
    val zeroByLabel = ids.filter(_._1 % 97 == 0).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val collByLabel =
      ids.filter(t => t._1 % 41 == 0 && t._1 % 97 != 0).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (label, _, nZero, nColl, minN, maxN, meanN) =>
      assert(nZero == zeroByLabel.getOrElse(label, 0L), s"label $label zeros")
      assert(nColl == collByLabel.getOrElse(label, 0L), s"label $label collapsed")
      assert(minN <= meanN && meanN <= maxN, s"label $label mean outside [min,max]")
    }
    assert(rows.map(_._3).sum > 0 || ids.forall(_._1 % 97 != 0), "zero planting unexercised")
  }

  test("ta_license precedence and ta_codefence extraction replay the planting") {
    val lic = CodeQueries
      .taLicense(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getBoolean(3)))
    lic.foreach { case (id, license, viaSpdx, permissive) =>
      val expect =
        if (id % 11 == 0) "MIT"
        else if (id % 7 == 0) "Apache-2.0"
        else if (id % 13 == 0) "GPL"
        else if (id % 17 == 0) "MIT-text"
        else "none"
      assert(license == expect, s"doc $id license")
      assert(viaSpdx == (id % 11 == 0), s"doc $id via_spdx")
      assert(permissive == Set("MIT", "Apache-2.0", "MIT-text").contains(expect), s"doc $id permissive")
    }
    assert(lic.count(_._2 != "none") > 0 && lic.count(_._2 == "none") > 0)

    val fences = CodeQueries
      .taCodefence(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    fences.foreach { case (id, n, langs, chars) =>
      val bodies = Seq(
        if (id % 5 == 0) Some(("python", s"for i in range(${id % 9}):\n    print(i)\n")) else None,
        if (id % 8 == 0) Some(("", s"SELECT ${id % 4};\n")) else None,
        if (id % 20 == 0) Some(("scala", s"val x = $id\n")) else None).flatten
      assert(n == bodies.length, s"doc $id fence count")
      assert(langs == bodies.map(_._1).mkString(","), s"doc $id langs")
      assert(chars == bodies.map(_._2.length.toLong).sum, s"doc $id code chars")
    }
    assert(fences.exists(_._2 == 3), "no doc with all three fences (needs a %40 doc)")
  }

  test("q125_dstimebands replays the banded counts from one pass") {
    val row = RelationalQueries.q125Dstimebands(spark, dir).collect()(0)
    val ev = spark.read
      .parquet(s"$dir/events.parquet")
      .select(hour(col("ts")).as("h"), col("value"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    val floors = Seq(20.0, 25.0, 30.0, 35.0, 40.0, 45.0, 50.0, 55.0)
    floors.zipWithIndex.foreach { case (fl, b) =>
      val expect = ev.count { case (h, v) => h >= b * 3 && h < b * 3 + 3 && v >= fl }.toLong
      assert(row.getLong(b) == expect, s"band $b")
    }
  }
}
