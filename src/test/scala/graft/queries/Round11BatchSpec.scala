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
    fences.foreach { case (id, n, langs, bytes) =>
      val bodies = Seq(
        if (id % 5 == 0) Some(("python", s"for i in range(${id % 9}):\n    print(i)\n")) else None,
        if (id % 8 == 0) Some(("", s"SELECT ${id % 4};\n")) else None,
        if (id % 20 == 0) Some(("scala", s"val x = $id\n")) else None).flatten
      assert(n == bodies.length, s"doc $id fence count")
      assert(langs == bodies.map(_._1).mkString(","), s"doc $id langs")
      // planted bodies are ASCII, so UTF-8 bytes == string length here
      assert(bytes == bodies.map(_._2.getBytes("UTF-8").length.toLong).sum,
        s"doc $id code bytes")
    }
    assert(fences.exists(_._2 == 3), "no doc with all three fences (needs a %40 doc)")
  }

  test("gr_walkpairs replays the deterministic md5 walks edge-for-edge") {
    val half = spark.read
      .parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val adj = half
      .as("a")
      .join(half.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
      .collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).toList)
      .toMap
    def draw(seed: Long, t: Int, v: Long): Long =
      graft.expressions.Md5Long60.hash(s"walk|$seed|$t|$v".getBytes("UTF-8"))
    val expect = scala.collection.mutable.Map.empty[(Long, Long), Long]
    adj.keys.toList.sorted.filter(_ % 5 == 0).foreach { seed =>
      val walk = (1 to 4).scanLeft(seed) { (node, t) =>
        adj(node).map(v => ((draw(seed, t, v), v), v)).minBy(_._1)._2
      }
      for (i <- walk.indices; j <- walk.indices if i != j && math.abs(i - j) <= 2)
        expect((walk(i), walk(j))) = expect.getOrElse((walk(i), walk(j)), 0L) + 1L
    }
    val got = GraphQueries
      .grWalkpairs(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(got == expect.toMap, s"got ${got.size} pairs, expected ${expect.size}")
    assert(got.nonEmpty)
  }

  test("mm_aspectbucket replays the nearest-ratio assignment and pad arithmetic") {
    val buckets = Seq((0, 1, 1), (1, 4, 3), (2, 3, 4), (3, 16, 9), (4, 9, 16), (5, 2, 1), (6, 1, 2))
    val docs = spark.read
      .parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val assigned = docs.map { case (id, text) =>
      val (w, h) = graft.operators.Multimodal.dims(id, text.getBytes("UTF-8").length)
      val (bid, bw, bh) = buckets
        .map { case (bid, bw, bh) =>
          ((math.abs(w.toDouble / h - bw.toDouble / bh), bid), (bid, bw, bh))
        }
        .minBy(_._1)
        ._2
      val pad =
        if (w.toLong * bh <= h.toLong * bw) ((h.toLong * bw + bh - 1) / bh) * h - w.toLong * h
        else w.toLong * ((w.toLong * bh + bw - 1) / bw) - w.toLong * h
      (bid, pad)
    }
    val expect = buckets.map { case (bid, _, _) =>
      val mine = assigned.filter(_._1 == bid)
      (bid, (mine.length.toLong, mine.map(_._2).sum))
    }.toMap
    val got = SourceQueries
      .mmAspectbucket(spark, dir)
      .collect()
      .map(r => (r.getInt(0), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expect)
    assert(got.values.map(_._1).sum == docs.length, "every image lands in exactly one bucket")
  }

  test("q126_dsreturns equals a window-rank replay; st_clipfilter is the batch reject set") {
    val li = spark.read
      .parquet(s"$dir/lineitem.parquet")
      .select("l_linestatus", "l_partkey", "l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
      .collect()
    val base = li
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .map { case ((ch, pk), rows) =>
        def dec(v: Double, s: Int): BigDecimal = BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP)
        val qtyT = rows.map(r => dec(r.getDouble(3), 2)).sum
        val qtyR = rows.filter(_.getString(2) == "R").map(r => dec(r.getDouble(3), 2)).sum
        val amtT = rows.map(r => dec(r.getDouble(4) * (1.0 - r.getDouble(5)), 4)).sum
        val amtR = rows.filter(_.getString(2) == "R").map(r => dec(r.getDouble(4) * (1.0 - r.getDouble(5)), 4)).sum
        (ch, pk, qtyR.toDouble / qtyT.toDouble, amtR.toDouble / amtT.toDouble)
      }
      .toSeq
    def topIds(metric: ((String, Long, Double, Double)) => Double) =
      base
        .groupBy(_._1)
        .flatMap { case (_, rows) =>
          rows.sortBy(r => (-metric(r), r._2)).take(10).zipWithIndex.map { case (r, i) =>
            ((r._1, r._2), i + 1L)
          }
        }
        .toMap
    val rq = topIds(_._3)
    val ra = topIds(_._4)
    val expect = base
      .filter(r => rq.contains((r._1, r._2)) || ra.contains((r._1, r._2)))
      .map(r => ((r._1, r._2), (rq.get((r._1, r._2)), ra.get((r._1, r._2)))))
      .toMap
    val got = RelationalQueries
      .q126Dsreturns(spark, dir)
      .collect()
      .map { r =>
        ((r.getString(0), r.getLong(1)),
          (if (r.isNullAt(4)) None else Some(r.getLong(4)),
            if (r.isNullAt(5)) None else Some(r.getLong(5))))
      }
      .toMap
    assert(got == expect, s"got ${got.size} rows, expected ${expect.size}")
    graft.Caches.releaseAll()

    val batch = SourceQueries
      .mmClipfilter(spark, dir)
      .collect()
      .filter(!_.getBoolean(3))
      .map(r => (r.getLong(0), r.getDouble(2)))
      .toSet
    val stream = graft.streaming.StreamingQueries
      .stClipfilter(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .toSet
    assert(stream == batch, "streaming reject log must equal the batch keep=false set")
    assert(stream.nonEmpty)
  }

  test("ds_decay: exact half-life arithmetic, weights in (0,1]") {
    val rows = DedupQueries
      .dsDecay(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val ev = spark.read
      .parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("ts").cast("date").cast("string"), col("value"))
      .collect()
      .map(r => (r.getString(0), java.time.LocalDate.parse(r.getString(1)), r.getDouble(2)))
    val anchor = java.time.LocalDate.parse("2024-02-01")
    rows.foreach { case (et, n, raw, decayed, w) =>
      val mine = ev.filter(_._1 == et)
      assert(n == mine.length.toLong, s"$et count")
      val byWeek = mine
        .groupBy(t => java.time.temporal.ChronoUnit.DAYS.between(t._2, anchor) / 7)
        .view
        .mapValues(_.map(t => BigDecimal(t._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum)
        .toMap
      val expectRaw = byWeek.values.sum.toDouble
      val expectDecayed = byWeek.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (wkk, m)) =>
        acc + m.toDouble / (1L << wkk).toDouble
      }
      assert(raw == expectRaw, s"$et raw")
      assert(decayed == expectDecayed, s"$et decayed")
      assert(w > 0.0 && w <= 1.0 && w == decayed / raw, s"$et weight")
    }
    assert(rows.nonEmpty)
  }

  test("gr_anf registers and estimate replay from the exact 3-hop ball") {
    val half = spark.read
      .parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val adj = half
      .as("a")
      .join(half.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
      .collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).toSet)
      .toMap
    def ball(n: Long, h: Int): Set[Long] =
      (1 to h).foldLeft(Set(n))((s, _) => s ++ s.flatMap(adj.getOrElse(_, Set.empty)))
    def regsOf(n: Long): Array[Long] = {
      val regs = Array.fill(16)(0L)
      ball(n, 3).foreach { m =>
        val h = graft.expressions.Md5Long60.hash(s"anf|$m".getBytes("UTF-8"))
        val bucket = (h % 16).toInt
        val rest = h >>> 4
        val pos = (0 until 24).indexWhere(i => ((rest >>> i) & 1L) == 1L)
        val rho = if (pos < 0) 25L else pos + 1L
        regs(bucket) = math.max(regs(bucket), rho)
      }
      regs
    }
    val got = GraphQueries
      .grAnf(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (node, regSum, est) =>
      val regs = regsOf(node)
      assert(regSum == regs.sum, s"node $node register checksum")
      val denom = regs.map(r => 1.0 / (1L << r).toDouble).foldLeft(0.0)(_ + _)
      assert(est == 0.673 * 256.0 / denom, s"node $node estimate")
    }
  }

  test("gr_reciprocity replays the weighted dyad census exactly") {
    val ev = spark.read
      .parquet(s"$dir/events.parquet")
      .select(
        col("user_id"),
        col("ts").cast("string").as("us"),
        col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val trans = ev
      .groupBy(_._1)
      .values
      .flatMap { rows =>
        rows.sortBy(r => (r._2, r._3)).map(_._4).toList.sliding(2).collect {
          case List(a, b) if a != b => (a, b)
        }
      }
      .groupBy(p => p)
      .view
      .mapValues(_.size.toLong)
      .toMap
    val dyads: Seq[(Long, Long)] = trans.keys
      .map(p => if (p._1 < p._2) p else p.swap)
      .toSet
      .toSeq
      .map((p: (String, String)) => (trans.getOrElse(p, 0L), trans.getOrElse(p.swap, 0L)))
    val totalW = dyads.map(d => d._1 + d._2).sum
    val recipW = dyads.map(d => 2L * math.min(d._1, d._2)).sum
    val row = GraphQueries.grReciprocity(spark, dir).collect()(0)
    assert(row.getLong(0) == dyads.length.toLong, "n_dyads")
    assert(row.getLong(1) == dyads.count(d => d._1 > 0 && d._2 > 0).toLong, "n_mutual")
    assert(row.getLong(2) == dyads.count(d => d._1 == 0 || d._2 == 0).toLong, "n_asym")
    assert(row.getLong(3) == totalW, "total_w")
    assert(row.getLong(4) == recipW, "recip_w")
    assert(row.getDouble(5) == recipW.toDouble / totalW, "r")
    assert(row.getLong(1) > 0, "vacuous: no mutual dyad in the corpus")
  }

  test("q127_dsvariance replays the co-moment cov and the month-offset join") {
    val li = spark.read
      .parquet(s"$dir/lineitem.parquet")
      .select(
        col("l_partkey"),
        col("l_shipdate").cast("date").cast("string"),
        col("l_quantity").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1).substring(0, 7), r.getLong(2)))
    val stats = li
      .groupBy(t => (t._1, t._2))
      .collect {
        case ((pk, mon), rows) if rows.length >= 2 =>
          val n = rows.length.toLong
          val s = rows.map(_._3).sum
          val s2 = rows.map(t => t._3 * t._3).sum
          val mean = s.toDouble / n
          val cov = math.sqrt((n * s2 - s * s).toDouble / (n * (n - 1)).toDouble) / (s.toDouble / n)
          ((pk, mon), (mean, cov))
      }
      .filter(_._2._2 > 0.5)
      .toMap
    def nextMonth(m: String): String = {
      val Array(y, mo) = m.split("-").map(_.toInt)
      if (mo == 12) f"${y + 1}%04d-01" else f"$y%04d-${mo + 1}%02d"
    }
    val expect = stats.collect {
      case ((pk, mon), (mean, cov)) if stats.contains((pk, nextMonth(mon))) =>
        val (m2, c2) = stats((pk, nextMonth(mon)))
        ((pk, mon + "-01"), (mean, cov, m2, c2))
    }
    val got = RelationalQueries
      .q127Dsvariance(spark, dir)
      .collect()
      .map(r =>
        ((r.getLong(0), r.getString(1)),
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got == expect, s"got ${got.size} rows, expected ${expect.size}")
    assert(got.nonEmpty, "vacuous: no volatile consecutive-month pair at sf0.001")
  }

  test("er_linkage equals the sequential best-first one-to-one assignment") {
    val grp = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), regexp_extract(col("source"), "(\\d+)$", 1).cast("int").as("sfx"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1) < 10))
      .toMap
    val cand = ErQueries
      .matchFull(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .filter { case (a, b, _) => grp(a) != grp(b) }
      .map { case (a, b, jac) =>
        val (u, v) = if (grp(a)) (a, b) else (b, a)
        (1000000L - math.floor(jac * 1000000).toLong, u, v, jac)
      }
      .sortBy(t => (t._1, t._2, t._3))
    val taken = scala.collection.mutable.Set.empty[Long]
    val expect = cand.flatMap { case (_, u, v, jac) =>
      if (!taken(u) && !taken(v)) { taken += u; taken += v; Some(((u, v), jac)) }
      else None
    }.toMap
    val got = ErQueries
      .linkage(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(got == expect, s"got ${got.size} links, expected ${expect.size}")
    assert(got.nonEmpty, "vacuous: no cross-source link at sf0.001")
    // one-to-one: no record appears twice on either side
    val as = got.keys.map(_._1).toSeq
    val bs = got.keys.map(_._2).toSeq
    assert(as.distinct.size == as.size && bs.distinct.size == bs.size)
    graft.Caches.releaseAll()
  }

  test("ta_script and ta_synthetic replay the planting rules") {
    val base = spark.read
      .parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "source", "text", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    def cnt(s: String, lo: Char, hi: Char): Long = s.count(c => c >= lo && c <= hi).toLong
    val script = WebQueries
      .taScript(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getBoolean(5)))
    val byId = base.map(t => (t._1, t)).toMap
    script.foreach { case (id, nl, nc, ncy, dom, mixed) =>
      val (_, lang, _, text, nChars) = byId(id)
      val t = text +
        (if (lang == "zh") " 汉字分析文本" * (nChars / 5 + 1).toInt else "") +
        (if (id % 9 == 0) " проверка текста" else "")
      val (el, ec, ey) =
        (cnt(t, 'A', 'Z') + cnt(t, 'a', 'z'), cnt(t, '一', '鿿'), cnt(t, 'Ѐ', 'ӿ'))
      assert((nl, nc, ncy) == ((el, ec, ey)), s"doc $id counts")
      val ed =
        if (el >= ec && el >= ey) "latin" else if (ec >= ey) "cjk" else "cyrillic"
      assert(dom == ed && mixed == (Seq(el, ec, ey).count(_ > 0) >= 2), s"doc $id class")
    }
    assert(script.exists(_._5 == "cjk") && script.exists(_._6), "cjk/mixed arms unexercised")

    val synth = WebQueries
      .taSynthetic(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    synth.foreach { case (src, nDocs, nFlagged, nMarkers, rate) =>
      val mine = base.filter(_._3 == src)
      val expectMarkers =
        mine.map(t => Seq(23, 31, 41).count(m => t._1 % m == 0).toLong).sum
      val expectFlagged =
        mine.count(t => Seq(23, 31, 41).exists(m => t._1 % m == 0)).toLong
      assert(nDocs == mine.length.toLong, s"$src docs")
      assert(nMarkers == expectMarkers, s"$src markers")
      assert(nFlagged == expectFlagged, s"$src flagged")
      assert(rate == expectFlagged.toDouble / mine.length, s"$src rate")
    }
    assert(synth.map(_._3).sum > 0, "no planted marker in corpus")
  }

  test("dd_winnow pairs equal the shared-fingerprint join over the gated fingerprint table") {
    val fps = TextQueries
      .taWinnow(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .distinct
    val byFp = fps.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val sizes = fps.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val shared = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byFp.foreach { case (_, docs) =>
      if (docs.length >= 2 && docs.length <= 64)
        for (a <- docs; b <- docs if a < b)
          shared((a, b)) = shared.getOrElse((a, b), 0L) + 1L
    }
    val expect = shared.toMap.collect {
      case ((a, b), s) if s >= 5 =>
        ((a, b), (s, sizes(a), sizes(b), s.toDouble / math.min(sizes(a), sizes(b))))
    }
    val got = DedupQueries
      .ddWinnow(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got == expect, s"got ${got.size} pairs, expected ${expect.size}")
    assert(got.nonEmpty, "vacuous: no winnow pair at sf0.001")
    got.values.foreach { case (s, na, nb, c) =>
      assert(s <= math.min(na, nb) && c > 0.0 && c <= 1.0)
    }
    graft.Caches.releaseAll()
  }

  test("er_uncertain equals the brute-force labeling band; st_synthetic equals the batch flags") {
    val docs = spark.read
      .parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String) = t.split("\\s+").toSet
    def lev(x: String, y: String): Int = {
      val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    val expect = (for {
      a <- docs; b <- docs
      if a._1 < b._1 && a._2 == b._2
      inter = toks(a._3).intersect(toks(b._3)).size
      un = toks(a._3).union(toks(b._3)).size
      jac = inter.toDouble / un
      if jac >= 0.80 && jac < 0.9
      if lev(a._3.take(24), b._3.take(24)) < 16
    } yield ((a._1, b._1), jac)).toMap
    val got = ErQueries
      .uncertain(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3)))
      .toMap
    assert(got == expect, s"got ${got.size} band pairs, expected ${expect.size}")
    assert(got.nonEmpty, "vacuous: empty labeling band at sf0.001")
    graft.Caches.releaseAll()

    val stream = graft.streaming.StreamingQueries
      .stSynthetic(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toMap
    val expectFlags = docs.collect {
      case (id, _, _) if Seq(23, 31, 41).exists(m => id % m == 0) =>
        (id, Seq(23, 31, 41).count(m => id % m == 0).toLong)
    }.toMap
    assert(stream == expectFlags, "streaming flag log must equal the planting residues")
  }

  test("ds_overlap registers and estimates replay from exact per-source vocabularies") {
    val toks = spark.read
      .parquet(s"$dir/documents.parquet")
      .select("source", "text")
      .collect()
      .flatMap(r => r.getString(1).split(" ").distinct.map(t => (r.getString(0), t)))
      .distinct
    def regsOf(src: String): Array[Long] = {
      val regs = Array.fill(16)(0L)
      toks.filter(_._1 == src).map(_._2).distinct.foreach { t =>
        val h = graft.expressions.Md5Long60.hash(s"ovl|$t".getBytes("UTF-8"))
        val bucket = (h % 16).toInt
        val rest = h >>> 4
        val p = (0 until 24).indexWhere(i => ((rest >>> i) & 1L) == 1L)
        val rho = if (p < 0) 25L else p + 1L
        regs(bucket) = math.max(regs(bucket), rho)
      }
      regs
    }
    def estOf(regs: Array[Long]): Double =
      0.673 * 256.0 / regs.map(r => 1.0 / (1L << r).toDouble).foldLeft(0.0)(_ + _)
    val got = DedupQueries
      .dsOverlap(spark, dir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
    assert(got.nonEmpty)
    val regCache = scala.collection.mutable.Map.empty[String, Array[Long]]
    got.foreach { case ((sa, sb), (ea, eb, eu, ov)) =>
      val ra = regCache.getOrElseUpdate(sa, regsOf(sa))
      val rb = regCache.getOrElseUpdate(sb, regsOf(sb))
      assert(ea == estOf(ra) && eb == estOf(rb), s"($sa,$sb) component estimates")
      val ru = ra.zip(rb).map { case (x, y) => math.max(x, y) }
      assert(eu == estOf(ru), s"($sa,$sb) union estimate")
      assert(ov == ea + eb - eu, s"($sa,$sb) inclusion-exclusion")
      assert(eu >= math.max(ea, eb) - 1e-9, s"($sa,$sb) union below components")
    }
  }

  test("mm_sniff routes by real magic bytes and flags the corrupted payloads") {
    val rows = SourceQueries
      .mmSniff(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getBoolean(4)))
    val texts = spark.read
      .parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toMap
    assert(rows.length == texts.size, "every document routes exactly once")
    rows.foreach { case (id, declared, sniffed, nBytes, ok) =>
      val bytes = texts(id).getBytes("UTF-8").length
      val expectDecl = if (id % 2 == 0) "bmp" else "wav"
      val expectBytes =
        if (id % 2 == 0) {
          val (w, h) = graft.operators.Multimodal.dims(id, bytes)
          54L + ((3L * w + 3) / 4) * 4 * h
        } else 44L + 2L * graft.operators.Multimodal.audioSamples(id, bytes)
      assert(declared == expectDecl, s"doc $id declared")
      assert(sniffed == (if (id % 97 == 0) "unknown" else expectDecl), s"doc $id sniffed")
      assert(nBytes == expectBytes, s"doc $id size")
      assert(ok == (id % 97 != 0), s"doc $id ok")
    }
    assert(rows.exists(!_._5), "corruption arm unexercised")
  }

  test("q128_dsdev replays the bounded-window deviation join") {
    val li = spark.read
      .parquet(s"$dir/lineitem.parquet")
      .select(
        col("l_partkey"),
        year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("mon"),
        col("l_quantity").cast("long"))
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(2), r.getLong(3))))
    val monthly = li
      .groupBy(t => (t._1, t._2._1))
      .view
      .mapValues(_.map(_._2._2).sum)
      .toMap // ((pk, yr), mon) -> qty
    val got = RelationalQueries
      .q128Dsdev(spark, dir)
      .collect()
      .map(r =>
        ((r.getLong(0), r.getInt(1), r.getInt(2)),
          (r.getLong(3), r.getLong(4), r.getLong(5),
            if (r.isNullAt(6)) None else Some(r.getLong(6)),
            if (r.isNullAt(7)) None else Some(r.getLong(7)),
            r.getDouble(8))))
      .toMap
    val byPkYr = monthly.groupBy { case (((pk, yr), _), _) => (pk, yr) }
    val expect = byPkYr.flatMap { case ((pk, yr), ms) =>
      val mons = ms.toSeq.map { case (((_, _), m), q) => (m, q) }.sortBy(_._1)
      val s = mons.map(_._2).sum
      val n = mons.length.toLong
      mons.zipWithIndex.collect {
        case ((m, q), i) if (q * n).toDouble / s >= 2.0 =>
          ((pk, yr, m),
            (q, n, s,
              if (i > 0) Some(mons(i - 1)._2) else None,
              if (i < mons.length - 1) Some(mons(i + 1)._2) else None,
              (q * n).toDouble / s))
      }
    }
    assert(got == expect, s"got ${got.size} spike rows, expected ${expect.size}")
    assert(got.nonEmpty, "vacuous: no spike month at sf0.001")
  }

  test("q129_dsabsent replays the semi + double-anti cohort") {
    val orders = spark.read
      .parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val li = spark.read
      .parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_discount")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val custOf = orders.map(o => (o._1, o._2)).toMap
    val active = orders.map(_._2).toSet
    val big = orders.filter(_._3 > 450000.0).map(_._2).toSet
    val bulk = li.filter(l => l._2 >= 50.0 && l._3 > 0.09).flatMap(l => custOf.get(l._1)).toSet
    val cust = spark.read
      .parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val cohort = cust.filter(c => active(c._1) && !big(c._1) && !bulk(c._1))
    val expect = cohort.groupBy(_._2).map { case (seg, cs) =>
      (seg,
        (cs.length.toLong,
          cs.map(c => BigDecimal(c._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble,
          cs.map(_._1).min))
    }
    val got = RelationalQueries
      .q129Dsabsent(spark, dir)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got == expect, s"got ${got.size} segments, expected ${expect.size}")
    assert(got.nonEmpty && cohort.nonEmpty, "vacuous: empty absent cohort at sf0.001")
  }

  test("er_blocksweep: width-50 row equals er_blockeval; both meters monotone in width") {
    val sweep = ErQueries
      .blocksweep(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      .sortBy(_._1)
    assert(sweep.map(_._1).toSeq == Seq(25L, 50L, 100L))
    val be = ErQueries.blockEval(spark, dir).collect()(0)
    val w50 = sweep.find(_._1 == 50L).get
    assert(w50._2 == be.getLong(0) && w50._3 == be.getLong(1) && w50._4 == be.getDouble(2) &&
      w50._5 == be.getLong(3) && w50._6 == be.getLong(4) && w50._7 == be.getDouble(5),
      "width-50 sweep row must equal er_blockeval exactly")
    // |a-b| < w implies bucket gap <= 1 at width w, so the blocked
    // candidate SET is contained upward in width: counts/pc nondecreasing,
    // rr nonincreasing.
    sweep.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._3 <= hi._3, s"blocked candidates not monotone at w=${hi._1}")
      assert(lo._4 >= hi._4, s"rr not antitone at w=${hi._1}")
      assert(lo._6 <= hi._6, s"blocked matches not monotone at w=${hi._1}")
    }
    graft.Caches.releaseAll()
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
