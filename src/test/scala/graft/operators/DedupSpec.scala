package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en"),
    (2L, "the quick brown fox jumps over the lazy cat", "en"), // near-dup of 1
    (3L, "THE  quick brown fox jumps over the lazy dog", "en"), // exact dup of 1 after normalize
    (4L, "completely different content about spark engines", "en"),
    (5L, "der schnelle braune fuchs springt", "de"))
    .toDF("doc_id", "text", "lang")

  test("short docs (fewer tokens than the shingle width) still dedup") {
    val tiny = Seq(
      (1L, "hello", "en"),
      (2L, "hello", "en"), // same single token -> same whole-doc shingle hash
      (3L, "goodbye", "en"),
      (4L, "two words", "en"))
      .toDF("doc_id", "text", "lang")
    val pairs = Dedup
      .ngramJaccardPairs(tiny, "doc_id", "text", "lang", 3, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    val mh = Dedup
      .minhashLsh(tiny, "doc_id", "text", 3, 12, 4, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(mh == Set((1L, 2L))) // identical docs always collide in LSH
  }

  test("PPJoin prefix+positional candidate filter is lossless on random corpora") {
    // Random docs over a small vocabulary (maximizing near-dup density),
    // compared against a quadratic ground truth computed from the same
    // hashed shingle sets — any pair the candidate filters drop would
    // surface here as a missing result.
    val rnd = new scala.util.Random(83)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val corpus = (1L to 60L).map { id =>
      val len = 3 + rnd.nextInt(10)
      (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "), "en")
    }.toDF("doc_id", "text", "lang")
    val filtered = Dedup
      .ngramJaccardPairs(corpus, "doc_id", "text", "lang", 3, 0.6)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val brute = {
      val sets = corpus
        .select(col("doc_id"), Dedup.hashedShingleSet(col("text"), 3).as("sh"))
        .as[(Long, Seq[Long])].collect().map { case (id, sh) => id -> sh.toSet }
      (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size if j >= 0.6
      } yield (a, b)).toSet
    }
    assert(filtered == brute, s"missing=${brute -- filtered} extra=${filtered -- brute}")
  }

  test("length-banded prefix join is lossless under extreme length skew") {
    // Tweet-vs-book corpus: lengths spanning two orders of magnitude with
    // a shared hot token everywhere — the shape the length bands exist
    // for. Every qualifying pair (including cross-band near-threshold
    // ones) must survive the banded candidate join.
    val rnd = new scala.util.Random(19)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    val corpus = (1L to 50L).map { id =>
      val len = if (id % 5 == 0) 150 + rnd.nextInt(60) else 4 + rnd.nextInt(8)
      // "hot" prefixes every doc with a common trigram seed
      (id, ("hot hot hot " + Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")), "en")
    }.toDF("doc_id", "text", "lang")
    val filtered = Dedup
      .ngramJaccardPairs(corpus, "doc_id", "text", "lang", 3, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val brute = {
      val sets = corpus
        .select(col("doc_id"), Dedup.hashedShingleSet(col("text"), 3).as("sh"))
        .as[(Long, Seq[Long])].collect().map { case (id, sh) => id -> sh.toSet }
      (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size if j >= 0.5
      } yield (a, b)).toSet
    }
    assert(filtered == brute, s"missing=${brute -- filtered} extra=${filtered -- brute}")
  }

  test("band boundary: a pair at EXACTLY the length-ratio limit crosses bands losslessly") {
    // n=9 vs n=10 at t=0.9 sits exactly at min = t*max — the pair the
    // band partitioning could lose to an off-by-one boundary. A (9 tokens)
    // subset of B (10 tokens): J = 0.9 exactly; prefix of A = 9-9+1 = 1
    // token, prefix of B = 10-9+1 = 2.
    val pref = (
      Seq((1L, "x", 9, 0, 0L)) ++
        Seq((2L, "x", 10, 0, 0L), (2L, "x", 10, 1, 1L))
    ).toDF("id", "block", "n", "pos", "tok")
    val cand = Dedup.ppjoinCandidates(pref, 0.9).as[(Long, Long)].collect().toSet
    assert(cand == Set((1L, 2L)), "exact length-ratio pair lost at a band boundary")
  }

  test("PPJoin bounds keep a pair whose Jaccard is EXACTLY the threshold") {
    // A (63 tokens) subset of B (70 tokens): J = 63/70 = 0.9 exactly. The
    // rounded-up doubles 0.9*70 and 0.9/1.9*133 both exceed their exact
    // values, so without the epsilon slack the size and positional bounds
    // would prune this true boundary match.
    val pref = (
      (0 until 7).map(p => (1L, "x", 63, p, s"t$p")) ++ // prefix of A: 63-57+1 = 7
        (0 until 8).map(p => (2L, "x", 70, p, s"t$p"))  // prefix of B: 70-63+1 = 8
    ).toDF("id", "block", "n", "pos", "tok")
    val cand = Dedup
      .ppjoinCandidates(pref, 0.9)
      .as[(Long, Long)].collect().toSet
    assert(cand == Set((1L, 2L)), "exact-threshold pair pruned by a rounded bound")
  }

  test("suffix (bitmap) filter prunes a near-miss pair the positional bound keeps") {
    // Two 20-token sets sharing EXACTLY their 9-token prefix (sorted order:
    // the shared tokens are the smallest), disjoint suffixes. Positional
    // bound: overlap <= 9 + min(11, 11) = 20 >= 0.6/1.6*40 = 15 -> kept.
    // True overlap is 9 (J = 9/31 << 0.6), and the bitmaps see it:
    // popcount(AND) = 9 < 15 -> pruned before any payload join.
    val shared = (100L to 108L).toSeq // 9 tokens
    val aSet = shared ++ (200L to 210L) // n = 20
    val bSet = shared ++ (300L to 310L) // n = 20
    val pref = (
      shared.zipWithIndex.map { case (tk, p) => (1L, "x", 20, p, tk) } ++
        shared.zipWithIndex.map { case (tk, p) => (2L, "x", 20, p, tk) }
    ).toDF("id", "block", "n", "pos", "tok")
    val masks = Seq((1L, aSet), (2L, bSet))
      .toDF("id", "hs")
      .select(col("id"), Dedup.tokenBitmap(col("hs")).as("bm"))
      .withColumn("bmc", Dedup.bitmapOverlapBound(col("bm"), col("bm")))

    val without = Dedup.ppjoinCandidates(pref, 0.6).as[(Long, Long)].collect().toSet
    assert(without == Set((1L, 2L)), "sanity: positional bound alone keeps the near-miss")
    val withMasks =
      Dedup.ppjoinCandidates(pref, 0.6, Some(masks)).as[(Long, Long)].collect().toSet
    assert(withMasks.isEmpty, "suffix filter must prune the near-miss candidate")
  }

  test("suffix filter keeps a pair whose Jaccard is EXACTLY the threshold") {
    // Same boundary corpus as the positional test (A's 63 tokens a subset
    // of B's 70: J = 0.9 exactly); bitmaps give popcount(AND) = 63, and
    // 63 >= 0.9/1.9*133 (= 63.000000000000014 in doubles) must survive via
    // the epsilon slack on the suffix bound too.
    val aSet = (0L until 63L).toSeq
    val bSet = (0L until 70L).toSeq
    val pref = (
      (0 until 7).map(p => (1L, "x", 63, p, p.toLong)) ++
        (0 until 8).map(p => (2L, "x", 70, p, p.toLong))
    ).toDF("id", "block", "n", "pos", "tok")
    val masks = Seq((1L, aSet), (2L, bSet))
      .toDF("id", "hs")
      .select(col("id"), Dedup.tokenBitmap(col("hs")).as("bm"))
      .withColumn("bmc", Dedup.bitmapOverlapBound(col("bm"), col("bm")))
    val cand =
      Dedup.ppjoinCandidates(pref, 0.9, Some(masks)).as[(Long, Long)].collect().toSet
    assert(cand == Set((1L, 2L)), "exact-threshold pair pruned by the suffix bound")
  }

  test("suffix filter survives within-set bit collisions (deficit term)") {
    // A = B = {5, 1029}: both tokens hash to bit 5 (mod 1024), so
    // popcount(AND) = 1 while true overlap is 2 — the bare popcount would
    // prune this EXACT-DUPLICATE pair (required overlap at t=0.5 is
    // 0.5/1.5*4 = 1.33 > 1). The deficit term min(nA - pc(bmA),
    // nB - pc(bmB)) = 1 restores the lossless bound: 1 + 1 = 2 >= 1.33.
    val set = Seq(5L, 1029L)
    val pref = (
      Seq((1L, "x", 2, 0, 5L), (1L, "x", 2, 1, 1029L)) ++
        Seq((2L, "x", 2, 0, 5L), (2L, "x", 2, 1, 1029L))
    ).toDF("id", "block", "n", "pos", "tok")
    val masks = Seq((1L, set), (2L, set))
      .toDF("id", "hs")
      .select(col("id"), Dedup.tokenBitmap(col("hs")).as("bm"))
      .withColumn("bmc", Dedup.bitmapOverlapBound(col("bm"), col("bm")))
    val cand =
      Dedup.ppjoinCandidates(pref, 0.5, Some(masks)).as[(Long, Long)].collect().toSet
    assert(cand == Set((1L, 2L)), "colliding exact-duplicate pair pruned — bound not lossless")
  }

  test("exact dedup groups normalized-identical docs") {
    val r = Dedup.exact(docs, "doc_id", "text").orderBy("keep_id").collect()
    assert(r.length == 4)
    val g = r.map(x => (x.getAs[Long]("keep_id"), x.getAs[Long]("n_copies"))).toMap
    assert(g(1L) == 2) // docs 1 and 3
    assert(g(2L) == 1)
  }

  test("ngram Jaccard finds the near-dup pair, respects lang blocking") {
    val pairs = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", "lang", 3, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L))) // identical after normalize
    assert(pairs.contains((1L, 2L))) // one-token difference
    assert(!pairs.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("minhash LSH: no false positives, and J=1.0 pairs always collide") {
    val brute = Dedup
      .ngramJaccardPairs(docs.withColumn("one", lit(1)), "doc_id", "text", "one", 3, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val lsh = Dedup
      .minhashLsh(docs, "doc_id", "text", 3, 12, 4, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // verify step makes precision exact; recall is probabilistic EXCEPT at
    // J=1.0 where every signature (hence every band) is identical
    assert(lsh.subsetOf(brute))
    assert(lsh.contains((1L, 3L)))
  }

  test("OPH LSH: no false positives, J=1.0 pairs always collide, short docs densify") {
    val brute = Dedup
      .ngramJaccardPairs(docs.withColumn("one", lit(1)), "doc_id", "text", "one", 3, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val oph = Dedup
      .ophLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // Exact-Jaccard verify makes precision exact; identical shingle sets
    // produce identical bin minima AND identical densified borrows, so
    // J=1.0 pairs collide on every band.
    assert(oph.subsetOf(brute))
    assert(oph.contains((1L, 3L)))
    // A one-token doc fills one bin; the other 15 are all borrowed — the
    // rotation must still produce a complete, deterministic signature and
    // exact-dup single-token docs must collide.
    val tiny = Seq(
      (1L, "hello", "en"),
      (2L, "hello", "en"),
      (3L, "goodbye", "en"))
      .toDF("doc_id", "text", "lang")
    val tinyPairs = Dedup
      .ophLshPairs(tiny, "doc_id", "text", 3, 16, 4, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(tinyPairs == Set((1L, 2L)))
    graft.Caches.releaseAll()
  }

  test("simhash: identical docs collide at hamming 0; banded join is exact to 3") {
    val r = Dedup.simhashPairs(docs, "doc_id", "text", 3, 3)
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    assert(r((1L, 3L)) == 0L)
  }

  test("cosine is 1 for identical vectors, bounded in [-1, 1]") {
    val emb = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(1.0f, 2.0f, 3.0f)),
      (3L, Array(-1.0f, -2.0f, -3.0f)),
      (4L, Array(3.0f, -1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val r = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", -2.0)
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getDouble(2))).toMap
    assert(math.abs(r((1L, 2L)) - 1.0) < 1e-12)
    assert(math.abs(r((1L, 3L)) + 1.0) < 1e-12)
    assert(r.values.forall(c => c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12))
  }

  test("embeddingCosinePairs filters by threshold") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.1f)),
      (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("contaminationHits equals brute-force string n-gram overlap on random corpora") {
    val rnd = new scala.util.Random(271)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val all = (1L to 80L).map { id =>
      val len = 2 + rnd.nextInt(12)
      (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = all.toDF("doc_id", "text")
    val bench = df.filter($"doc_id" % 10 === 0)
    val corpus = df.filter($"doc_id" % 10 =!= 0)
    for (k <- Seq(3, 4)) {
      val got = Dedup.contaminationHits(corpus, bench, "doc_id", "text", k)
        .as[(Long, Long)].collect().toMap
      // Brute force on the STRING shingles (independent of the hash path):
      // per corpus doc, count distinct k-gram strings shared with any
      // benchmark doc.
      def grams(t: String): Set[String] = {
        val tk = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        if (tk.length >= k) tk.sliding(k).map(_.mkString(" ")).toSet
        else Set(tk.mkString(" "))
      }
      val benchGrams = all.filter(_._1 % 10 == 0).flatMap(r => grams(r._2)).toSet
      val expect = all
        .filter(_._1 % 10 != 0)
        .map { case (id, t) => id -> grams(t).count(benchGrams.contains).toLong }
        .filter(_._2 > 0)
        .toMap
      assert(got == expect, s"k=$k")
    }
  }

  test("removeBoilerplateSpans equals a driver-side replay, keeps order, handles edge docs") {
    val rnd = new scala.util.Random(907)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val gen = (1L to 50L).map { id =>
      (id, Seq.fill(2 + rnd.nextInt(11))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // edge docs: empty text, and a single-token doc
    val all = gen ++ Seq((98L, ""), (99L, "aa"))
    val (w, minDocs) = (2, 3)
    val got = Dedup
      .removeBoilerplateSpans(all.toDF("doc_id", "text"), "doc_id", "text", w, minDocs)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    def spans(t: String): Seq[String] = {
      val tk = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      tk.grouped(w).map(_.mkString(" ")).toSeq
    }
    val freq = all.flatMap { case (id, t) => spans(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.size }
    val boiler = freq.filter(_._2 >= minDocs).keySet
    val expect = all.map { case (id, t) =>
      val sp = spans(t)
      val kept = sp.filterNot(boiler)
      id -> ((kept.mkString(" "), kept.size.toLong, (sp.size - kept.size).toLong))
    }.toMap
    assert(got == expect)
    assert(got(98L) == (("", 0L, 0L))) // empty doc -> zero spans, not a crash
  }

  test("removeBoilerplateSpans broadcast gate: both ledger paths return identical rows") {
    // The size-gated dispatch in removeBoilerplateSpans picks between a
    // broadcast ledger probe (small ledger) and a plain shuffled join
    // (the 100 TB arm). This pins the two arms equal on the same corpus:
    // broadcastThreshold = 0 forces the join arm, and the
    // autoBroadcastJoinThreshold override below keeps AQE from quietly
    // re-broadcasting it, so the shuffle join genuinely EXECUTES here.
    val rnd = new scala.util.Random(907)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val all = (1L to 50L).map { id =>
      (id, Seq.fill(2 + rnd.nextInt(11))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } ++ Seq((98L, ""), (99L, "aa"))
    val df = all.toDF("doc_id", "text")
    def rows(threshold: Long): Map[Long, (String, Long, Long)] =
      Dedup
        .removeBoilerplateSpans(df, "doc_id", "text", 2, 3, broadcastThreshold = threshold)
        .as[(Long, String, Long, Long)]
        .collect()
        .map(r => r._1 -> ((r._2, r._3, r._4)))
        .toMap
    val viaBroadcast = rows(Dedup.BoilerplateBroadcastThreshold)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val viaJoin =
      try rows(0L)
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(viaJoin == viaBroadcast)
    assert(viaJoin.nonEmpty)
  }

  test("duplicatedWindowStats equals a driver-side sliding-window replay") {
    val rnd = new scala.util.Random(7741)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val all = (1L to 60L).map { id =>
      (id, Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } :+ ((99L, ""))
    val k = 3
    val got = Dedup
      .duplicatedWindowStats(all.toDF("doc_id", "text"), "doc_id", "text", k)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def wins(t: String): Set[String] = {
      val tk = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      if (tk.length >= k) tk.sliding(k).map(_.mkString(" ")).toSet else Set(tk.mkString(" "))
    }
    val freq = all.flatMap { case (id, t) => wins(t).map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val expect = all.map { case (id, t) =>
      val w = wins(t)
      val d = w.count(freq(_) >= 2)
      id -> ((w.size.toLong, d.toLong, d.toDouble / w.size))
    }.toMap
    assert(got == expect)
    // the empty doc has exactly its one whole-text (empty) window
    assert(got(99L)._1 == 1L)
  }

  test("intraDocSpanDedup keeps first occurrences in order, map-only") {
    val df = Seq(
      (1L, "a b c a b c a b"), // spans(2): [a b][c a][b c][a b] -> drop last
      (2L, "x y x y"), //            [x y][x y] -> one kept
      (3L, ""),
      (4L, "q w e r")) //            no repeats
      .toDF("doc_id", "text")
    val r = Dedup.intraDocSpanDedup(df, "doc_id", "text", 2)
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) == (("a b c a b c", 3L, 1L)))
    assert(r(2L) == (("x y", 1L, 1L)))
    assert(r(3L) == (("", 0L, 0L)))
    assert(r(4L) == (("q w e r", 2L, 0L)))
    val plan = Dedup.intraDocSpanDedup(df, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan) // map-only, no shuffle
  }

  test("ledger LSH equals full-corpus LSH restricted to cross-split pairs") {
    // The incremental variant must find exactly the (new, old) pairs the
    // full-corpus run finds across the split — same coeffs, same bands,
    // so the band keys are identical; only the self-pairs differ.
    val rnd = new scala.util.Random(7741)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val corpus = (1L to 40L).map { i =>
      val base = Seq.fill(8)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i, base, "en")
    }.toDF("doc_id", "text", "lang")
    val split = 20L
    val full = Dedup
      .minhashLsh(corpus, "doc_id", "text", 3, 12, 4, 0.5)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => a < split == b >= split } // crossing pairs only
      .map { case (a, b, j) => (math.max(a, b), math.min(a, b), j) }
      .toSet
    val inc = Dedup
      .minhashLshAgainstLedger(
        corpus.filter($"doc_id" < split),
        corpus.filter($"doc_id" >= split),
        "doc_id", "text", 3, 12, 4, 0.5)
      .as[(Long, Long, Double)].collect()
      .toSet
    assert(inc == full)
  }

  test("contaminationHits keeps the benchmark ledger on the broadcast side") {
    val df = docs.select($"doc_id", $"text")
    val plan = Dedup
      .contaminationHits(df, df.limit(2), "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("globalFirstSpanDedup keeps exactly the corpus-first occurrence of every span") {
    val rnd = new scala.util.Random(4177)
    val vocab = Vector("aa", "bb", "cc")
    val gen = (1L to 40L).map { id =>
      (id, Seq.fill(1 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val all = gen ++ Seq((98L, ""), (99L, "aa bb"))
    val w = 2
    val got = Dedup
      .globalFirstSpanDedup(all.toDF("doc_id", "text"), "doc_id", "text", w)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    def spans(t: String): Seq[String] = {
      val tk = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      tk.grouped(w).map(_.mkString(" ")).toSeq
    }
    // driver replay: walk docs in (id, pos) order, a span survives only
    // at its first sighting — including within one document
    val seen = scala.collection.mutable.Set[String]()
    val expect = all.sortBy(_._1).map { case (id, t) =>
      val sp = spans(t)
      val kept = sp.filter(s => seen.add(s))
      id -> ((kept.mkString(" "), kept.size.toLong, (sp.size - kept.size).toLong))
    }.toMap
    assert(got == expect)
    assert(got(98L) == (("", 0L, 0L)))
    // doc 99's "aa bb" span almost surely occurred earlier in 40 random docs
    assert(got(99L)._3 + got(99L)._2 == 1L)
  }
}
