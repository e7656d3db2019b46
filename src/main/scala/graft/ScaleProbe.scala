package graft

/** Ad-hoc scale probe: inflate the documents corpus N-fold (shifted ids,
  * perturbed text so shingles differ across replicas) and time the
  * candidate-generation-heavy operators — checks for superlinear blowup
  * before it can surprise a real scale-up.
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    // Optional second arg: comma-separated probe names — re-run one probe
    // without paying for the whole suite.
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    val spark = GraftSession.get()
    import org.apache.spark.sql.functions._

    /** Replica shift derived from the observed max of the shifted key
      * columns (r12 advice): a fixed constant (1e8 — the SAME constant
      * make_sf.py uses) silently collides when SPARK_GRAFT_SF_DIR points
      * at an already-inflated dir, merging "disconnected" replicas and
      * invalidating the linearity/frontier-decay evidence. max+1 makes
      * replicas disjoint by construction on ANY input.
      */
    /** Per-key observed maxima in ONE scan (an empty table reads 0). */
    def maxima(df: org.apache.spark.sql.DataFrame, keys: String*): Seq[Long] = {
      val aggs = keys.map(k => max(col(k)).cast("long").as(s"m_$k"))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      keys.indices.map(i => if (row.isNullAt(i)) 0L else row.getLong(i))
    }
    def shiftFor(df: org.apache.spark.sql.DataFrame, keys: String*): Long =
      maxima(df, keys: _*).max + 1L

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val n0 = base.count()
    val docShift = shiftFor(base, "doc_id")
    val inflated = (0 until factor)
      .map { r =>
        base.select(
          (col("doc_id") + lit(r.toLong * docShift)).as("doc_id"),
          // Perturb each replica's text so cross-replica docs are not
          // trivial duplicates (token prefix tag changes every shingle).
          concat(lit(s"r$r "), col("text")).as("text"),
          col("lang"))
      }
      .reduce(_ union _)
      .repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"SCALE docs=${inflated.count()} (base=$n0 x $factor, shift=$docShift)")
    // Each probe row drains the SessionMemo access ledger taken during
    // its span and prints which shared frames it BUILT (with exclusive
    // seconds) vs merely REUSED — the Bench-row attribution, extended
    // here (r12 verdict #5) so cross-round probe comparisons on rows
    // that first-build a shared frame (er_metablock's 100x wobble) stop
    // needing a calibration narrative.
    // Selection guard, exposed so a probe's UNTIMED setup (shift
    // derivation, persist+materialize of its input) can be skipped along
    // with the probe instead of running for filtered-out rows.
    def selected(name: String): Boolean = only.forall(_.contains(name))
    def time(name: String)(f: => Long): Unit =
      if (selected(name)) {
        graft.queries.SessionMemo.drainAccesses() // discard inter-probe traffic
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        val (built, reused) = graft.queries.SessionMemo
          .summarizeAccesses(graft.queries.SessionMemo.drainAccesses())
        val attrib =
          (if (built.nonEmpty)
             built.map { case (t, s) => f"$t=$s%.2f" }.mkString(" built={", ",", "}")
           else "") +
            (if (reused.nonEmpty) reused.mkString(" reused=[", ",", "]") else "")
        println(f"SCALE $name%-18s $dt%8.2f s  rows=$n$attrib")
      }
    time("minhash_lsh")(
      graft.operators.Dedup.minhashLsh(inflated, "doc_id", "text", 3, 12, 4, 0.5).count())
    time("ngram_ppjoin")(
      graft.operators.Dedup.ngramJaccardPairs(inflated, "doc_id", "text", "lang", 3, 0.5).count())
    // One-permutation minhash (dd_oph's exact parameters): signature is
    // one pass over the shingle hashes + a constant 2·bins-row grid per
    // doc — must stay corpus-linear like minhash_lsh but with the cheaper
    // signature stage.
    time("oph_pairs")(
      graft.operators.Dedup.ophLshPairs(inflated, "doc_id", "text", 3, 16, 4, 0.5).count())
    // Suffix-filter effectiveness at scale: candidates surviving to the
    // exact verify, with vs without the bitmap prune (the final pair set
    // is identical by construction — the bound is lossless and the
    // random-corpus property test locks it).
    locally {
      import graft.operators.Dedup
      val corpus = Dedup.shingledCorpus(inflated, "doc_id", "text", 3)
      val blocks = inflated.select(col("doc_id").as("id"), col("lang").as("block"))
      val pref = corpus
        .join(blocks, Seq("id"))
        .select(
          col("id"),
          col("block"),
          size(col("sh")).as("n"),
          posexplode(Dedup.prefixTokens(array_sort(col("sh")), 0.5)).as(Seq("pos", "tok")))
      val masks = corpus
        .select(col("id"), Dedup.tokenBitmap(col("sh")).as("bm"))
        .withColumn("bmc", Dedup.bitmapOverlapBound(col("bm"), col("bm")))
      time("cand_no_suffix")(Dedup.ppjoinCandidates(pref, 0.5).count())
      time("cand_suffix")(Dedup.ppjoinCandidates(pref, 0.5, Some(masks)).count())
    }
    val pairs = graft.operators.Dedup
      .minhashLsh(inflated, "doc_id", "text", 3, 12, 4, 0.5)
      .select(org.apache.spark.sql.functions.col("a_id"), org.apache.spark.sql.functions.col("b_id"))
    time("connected_comp")(
      graft.operators.ConnectedComponents.run(pairs, "a_id", "b_id").count())
    // Round-4 operators: decontamination against a fixed-size benchmark
    // (the bench side must NOT grow with the corpus), boilerplate span
    // removal (one span-hash shuffle + broadcast strip), and the
    // adjacency-intersection triangle census on the inflated near-dup
    // graph (orientation bounds the arrays, so the closure pass must
    // stay wedge-, not pair-, proportional).
    time("contamination") {
      graft.operators.Dedup
        .contaminationHits(
          inflated.filter(col("doc_id") % 25 =!= 0),
          base.filter(col("doc_id") % 25 === 0).select(col("doc_id"), col("text")),
          "doc_id",
          "text",
          4)
        .count()
    }
    time("boilerplate")(
      graft.operators.Dedup
        .removeBoilerplateSpans(inflated, "doc_id", "text", 3, 3 * factor)
        .count())
    // Forced SHUFFLE-JOIN arm of the boilerplate broadcast gate
    // (threshold 0 — the 100 TB path where the ledger exceeds the
    // broadcast bite): must price like the gated row plus one exchange
    // of the slim hash ledger. minDocs stays FIXED (not scaled with the
    // factor) so the ledger genuinely grows with inflation.
    time("boilerplate_join")(
      graft.operators.Dedup
        .removeBoilerplateSpans(
          inflated, "doc_id", "text", 3, 3, broadcastThreshold = 0L)
        .count())
    time("triangles") {
      val e = pairs.select(
        least(col("a_id"), col("b_id")).as("u"),
        greatest(col("a_id"), col("b_id")).as("v"))
        .distinct()
      graft.operators.Triangles.count(e).count()
    }
    // Round-4 additions. BFS and Adamic-Adar run on the inflated near-dup
    // graph (frontier-proportional rounds / query-degree-bounded wedges);
    // the global rank underlies epoch shuffling and curriculum cuts (two-
    // pass, no single-partition window); chunking is the narrow explode
    // whose cost must stay output-bound; the PCA iteration's BIGINT sums
    // must stay flat per row regardless of row count.
    // The near-dup pair graph is the INPUT to every graph-operator probe
    // below; persist and materialize it ONCE, unconditionally, so those
    // rows time the operator, not a re-derivation of the LSH pair join
    // (before round 7 each graph probe silently re-ran the whole
    // shingle→minhash→band→verify chain inside its own timing).
    val sym = {
      val s = pairs
        .select(col("a_id").as("src"), col("b_id").as("dst"))
        .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t0 = System.nanoTime()
      val n = s.count()
      println(f"SCALE pair_graph         ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      s
    }
    time("bfs_3hop") {
      val seeds = sym.select(col("src").as("id")).distinct().filter(col("id") % 97 === 0)
      val n = graft.operators.Bfs.run(sym, seeds, 3, broadcastFrontierUpTo = 4000000L).count()
      graft.Caches.releaseAll()
      n
    }
    // gr_anf's union-sketch rounds: per round one register-frame join +
    // a 16-max aggregate — the shuffle ships (node, 16 ints) rows per
    // edge, so the row must scale with |edges|, never with ball sizes
    // (that edge-proportionality is the entire point of sketched reach).
    time("anf_rounds") {
      val e = sym.select(col("src").as("u"), col("dst").as("v"))
      // the SHIPPED path: gr_anf/gr_effdiameter read the round-TAGGED
      // advance, so that is what the probe times (same-algorithm rule);
      // counting the final radius keeps the row count node-shaped and
      // comparable with the pre-tagged baselines.
      val n = graft.operators.Anf
        .runTagged(e, e.select(col("u")).distinct(), "u", 3)
        .filter(col("h") === 3L)
        .count()
      graft.Caches.releaseAll()
      n
    }
    // gr_walkpairs' step joins are frontier-sized (|nodes|/mod rows
    // against the adjacency) and the pair extraction is walk-length-
    // bounded — the row must stay graph-linear.
    time("walkpair_steps") {
      val n = graft.queries.GraphQueries
        .walkpairsFromSym(sym.select(col("src").as("u"), col("dst").as("v")))
        .count()
      graft.Caches.releaseAll()
      n
    }
    // Attribution variant: same walk, pure-lazy shuffle-join plan (no
    // per-hop count, no frontier broadcast) — separates the adaptive
    // knob's cost from the walk itself.
    time("bfs_3hop_nobc") {
      val seeds = sym.select(col("src").as("id")).distinct().filter(col("id") % 97 === 0)
      val n = graft.operators.Bfs.run(sym, seeds, 3).count()
      graft.Caches.releaseAll()
      n
    }
    time("adamic_topk") {
      val deg = sym.groupBy(col("src").as("x")).agg(count(lit(1)).as("d"))
      val qs = sym.filter(col("src") % 97 === 0).select(col("src").as("q"), col("dst").as("m"))
      qs.join(sym.select(col("src").as("m"), col("dst").as("w")), "m")
        .filter(col("w") =!= col("q"))
        .join(deg.select(col("x").as("m"), col("d")), "m")
        .groupBy("q", "w")
        .agg(count(lit(1)).as("cn"), sum(round(lit(1000000.0) / log(col("d"))).cast("long")).as("aa"))
        .join(sym.select(col("src").as("q"), col("dst").as("w")), Seq("q", "w"), "left_anti")
        .count()
    }
    // Full gr_linkpred eval harness (holdout tag + train-graph scoring +
    // top-k + hit join) on the inflated near-dup graph: the tag is one
    // map-only hash per edge and everything else is the adamic expansion
    // shape, so the row must stay linear alongside adamic_topk.
    time("linkpred_eval") {
      val half = sym
        .filter(col("src") < col("dst"))
        .select(col("src").as("u"), col("dst").as("v"))
      val n = graft.queries.GraphQueries.linkpredOver(half).count()
      graft.Caches.releaseAll()
      n
    }
    // Closed-form blocking-cost estimate (er_blockeval's candidate half):
    // the comparable-pair space grows QUADRATICALLY with docs while the
    // histogram aggregate that counts it stays corpus-linear — the row
    // must stay ~flat as the printed n_comparable explodes.
    time("blockeval_closed") {
      val r = graft.queries.ErQueries
        .blockEvalCounts(inflated.withColumn("n_chars", length(col("text")).cast("long")))
        .head()
      graft.Caches.releaseAll()
      r.getDecimal(0).longValueExact()
    }
    // Round-11 accounting probes (r10 verdict #5). blockeval_pc is the
    // OTHER half of er_blockeval: the shipped pairs-completeness aggregate
    // over a scored-pair frame — here the near-dup pair graph with
    // synthetic size buckets, so the input grows with the corpus and the
    // row must stay pair-linear (one map-side-combined pass).
    time("blockeval_pc") {
      val r = graft.queries.ErQueries
        .blockEvalPc(pairs.select(
          (col("a_id") % 7).as("a_bucket"),
          (col("b_id") % 7).as("b_bucket")))
        .head()
      graft.Caches.releaseAll()
      r.getLong(0)
    }
    // Suffix-chain blocklist gate: join volume is outlinks × labels
    // (≤ ~5 labels/host), ONE equi-join against the broadcast list —
    // must stay corpus-linear.
    time("blockfilter_chain") {
      val n = graft.queries.WebQueries.taBlockfilterOver(inflated).count()
      graft.Caches.releaseAll()
      n
    }
    // Largest-remainder apportionment: one corpus aggregate, then work
    // bounded by the DOMAIN vocabulary — the row must stay ~flat
    // (scan-linear) while docs inflate.
    time("apportion_domains") {
      val n = graft.queries.DedupQueries.apportionOver(inflated).count()
      graft.Caches.releaseAll()
      n
    }
    time("global_rank") {
      val keyed = inflated.select(
        col("doc_id"),
        graft.functions.Hashing
          .md5Long60(concat(lit("epoch0|"), col("doc_id").cast("string")))
          .as("k"))
      graft.operators.GlobalRank.withRank(keyed, Seq(col("k"), col("doc_id")), "pos").count()
    }
    time("chunking") {
      val toks = graft.functions.TextAnalysis.tokens(col("text"))
      val n = size(col("tk"))
      val nChunks = when(n <= 32, lit(1)).otherwise(floor((n - 32 + 23) / 24).cast("int") + 1)
      inflated
        .select(col("doc_id"), toks.as("tk"))
        .select(col("doc_id"), explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
        .count()
    }
    // Round-5 additions: winnowing must stay a map-only per-row pass
    // (cost linear in corpus tokens, zero shuffle before the count);
    // k-core peeling on the inflated near-dup graph must stay
    // edge-proportional per round.
    time("winnow")(graft.queries.TextQueries.winnowFingerprints(inflated).count())
    // dd_winnow's full pipeline: the df-capped fingerprint bucket join.
    // Unlike metablock's trigram blocks, winnow fingerprints from past
    // the replica prefix are IDENTICAL across replicas — families of
    // ~factor docs — so the production cap (64) purges EVERYTHING at
    // factor > 64 (measured: 0 pairs at 100×, correct but measuring
    // nothing). The probe scales the cap with the multiplicity so the
    // join volume it exists to bound actually flows; pair volume is then
    // families × factor², i.e. corpus × factor — the row must track that
    // product, not blow past it.
    time("winnow_pairs") {
      val n = graft.queries.DedupQueries.ddWinnowOver(inflated, dfCap = 4 * factor).count()
      graft.Caches.releaseAll()
      n
    }
    time("kcore_peel") {
      val n = graft.operators.KCore.peelStats(sym.select(col("src").as("u"), col("dst").as("v")), 10, 3).count()
      graft.Caches.releaseAll()
      n
    }
    // Truss peel on the half-edge near-dup graph: per round one
    // degree-ordered orientation + the output-bound triple enumeration +
    // an edge-keyed support join — must stay triangle-output-proportional,
    // never wedge-quadratic on hubs (the orientation bound).
    time("ktruss_peel") {
      val half = sym
        .filter(col("src") < col("dst"))
        .select(col("src").as("u"), col("dst").as("v"))
      val n = graft.operators.KTruss.peelStats(half, 4, 2).count()
      graft.Caches.releaseAll()
      n
    }
    // Round-8 additions: greedy-by-id MIS on the symmetric near-dup graph
    // and longest-path layering on its id-oriented half — each round is
    // one edge-keyed aggregate/semi-join, so both must stay
    // edge-proportional per round (the kcore_peel budget).
    time("mis_rounds") {
      val n = graft.operators.Mis
        .run(sym.select(col("src").as("u"), col("dst").as("v")), 3)
        .count()
      graft.Caches.releaseAll()
      n
    }
    time("topo_layers") {
      val half = sym
        .filter(col("src") < col("dst"))
        .select(col("src").as("u"), col("dst").as("v"))
      val n = graft.operators.TopoLayers.run(half, 3).count()
      graft.Caches.releaseAll()
      n
    }
    // Greedy coloring adds a per-round color-lookup join + degree-bounded
    // collect_set to the topo peel — still one O(|E|) shuffle per round.
    time("coloring_waves") {
      val half = sym
        .filter(col("src") < col("dst"))
        .select(col("src").as("u"), col("dst").as("v"))
      val n = graft.operators.Coloring.run(half, 3).count()
      graft.Caches.releaseAll()
      n
    }
    // Matching walks live edges like mis_rounds; the extra cost is the
    // per-node lightest-edge union-aggregate — still O(|live|) per round.
    time("matching_pairs") {
      val half = sym
        .filter(col("src") < col("dst"))
        .select(col("src").as("u"), col("dst").as("v"))
      val n = graft.operators.Matching.run(half, 3).count()
      graft.Caches.releaseAll()
      n
    }
    // Borůvka MSF on the near-dup graph with hash-derived weights (the
    // single-linkage dendrogram path): per round one component-keyed
    // election aggregate + two relabel joins over LIVE edges, plus a
    // component-sized contraction — must stay edge-proportional per
    // round with log-bounded rounds.
    time("boruvka_msf") {
      val half = sym
        .filter(col("src") < col("dst"))
        .select(
          col("src").as("u"),
          col("dst").as("v"),
          pmod(xxhash64(col("src"), col("dst")), lit(1000000L)).as("w"))
      val n = graft.operators.Boruvka.run(half, 20).count()
      graft.Caches.releaseAll()
      n
    }
    // h-index core decomposition on the near-dup graph: each round is a
    // broadcast probe of the cached edge frame + one compressed
    // (node, distinct-value) count shuffle — must stay edge-proportional
    // per round; the fixpoint sum short-circuits converged graphs.
    time("coreness_rounds") {
      val n = graft.operators.Coreness
        .run(sym, 6, broadcastNodesUpTo = 4000000L)
        .count()
      graft.Caches.releaseAll()
      n
    }
    // Synchronous Louvain move rounds on the near-dup graph: per round
    // one broadcast probe of the cached edges + one (node, community)
    // count shuffle + one fused decision aggregate — must stay
    // edge-proportional per round like the rest of the family.
    time("louvain_rounds") {
      val n = graft.operators.Louvain
        .moveRounds(sym, 4, broadcastNodesUpTo = 4000000L)
        .count()
      graft.Caches.releaseAll()
      n
    }
    // ta_textrank's per-doc PageRank: the corpus is a million small
    // graphs — tokenize/window/adjacency and all three scaled-integer
    // rounds key by doc_id, so the whole walk must scale linearly with
    // the corpus (nothing corpus-global exists).
    time("textrank_rounds") {
      // The SHARED query pipeline (TextQueries.textrankFrom) over the
      // inflated corpus — the probe measures the exact algorithm the
      // benchmarked ta_textrank runs, never a drifted copy.
      val n = graft.queries.TextQueries
        .textrankFrom(
          graft.queries.TextQueries.contentWordsOf(
            inflated.select(col("doc_id"), col("text"))))
        .count()
      graft.Caches.releaseAll()
      n
    }
    // er_metablock's full pipeline (the shipped metablockOver plan):
    // block purging caps per-block pair volume at cap²/2, so the
    // within-block self-join — the only place a quadratic could hide —
    // must stay corpus-linear. Replica prefixes shift every trigram, so
    // blocks never merge across replicas and the cap bites exactly as it
    // would on a real corpus.
    time("metablock_pairs") {
      val n = graft.queries.ErQueries.metablockOver(inflated).count()
      graft.Caches.releaseAll()
      n
    }
    // er_linkage's weighted-matching rounds (Matching.runWeighted over
    // the shipped scored-pair frame shape): each round is one union+min
    // aggregate over LIVE edges plus two slim anti-joins, so time must
    // stay ~linear in scored pairs and the live frontier must decay as
    // matched nodes leave. Replicas shift both endpoint ids — `factor`
    // independent copies of the base candidate graph (same weights, so
    // the same greedy unfolds in each) — and the printed per-round
    // decision histogram is the decay evidence: matches concentrated in
    // round 1, a shrinking tail after.
    // Setup (base frame + derived shift) stays OUTSIDE the timed span —
    // the shiftFor action would otherwise evaluate the scored-pair chain
    // once more inside the row (r13 review: a systematic inflation of
    // exactly the cross-round values this row protects) — and inside the
    // selection guard so filtered-out runs don't pay it.
    if (selected("linkage_rounds")) {
      val base = graft.queries.ErQueries.linkageCross(spark, sfDir).select("u", "v", "w")
      val shift = shiftFor(base, "u", "v")
      time("linkage_rounds") {
      val infl = (0 until factor)
        .map(r =>
          base.select(
            (col("u") + lit(r * shift)).as("u"),
            (col("v") + lit(r * shift)).as("v"),
            col("w")))
        .reduce(_ union _)
      val out = graft.operators.Matching
        .runWeighted(infl, 8)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = out.count()
      out
        // undecided residue carries rnd = NULL; pin it to -1 so the
        // histogram's key and sort position are engine- and
        // run-deterministic in the probe log
        .groupBy(col("status"), coalesce(col("rnd"), lit(-1)).as("rnd"))
        .agg(count(lit(1)).as("n"))
        .orderBy("status", "rnd")
        .collect()
        .foreach(r =>
          println(s"SCALE linkage_rounds     ${r.get(0)} rnd=${r.get(1)} n=${r.get(2)}"))
      out.unpersist(blocking = false)
      graft.Caches.releaseAll()
      n
      }
    }
    // ta_pairlift's fan-out: the chained-Generate pair explosion + slim
    // (t1,t2) count shuffle must stay output-pair-proportional (the
    // interpreted nested-lambda form it replaced was 11x slower at 1x).
    time("pairlift_pairs") {
      val ts = array_sort(array_distinct(graft.functions.TextAnalysis.tokens(col("text"))))
      inflated
        .select(ts.as("ts"))
        .select(posexplode(col("ts")).as(Seq("i", "t1")), col("ts"))
        .select(col("t1"), explode(slice(col("ts"), col("i") + lit(2), size(col("ts")))).as("t2"))
        .groupBy("t1", "t2")
        .agg(count(lit(1)).as("codf"))
        .count()
    }
    // ann_rrf's fused serving path, lexical leg (the shipped
    // rrfLexicalTopK — max-df-pruned posting join + bounded top-k): the
    // query batch is FIXED (ids modulo 50·factor) and hot tokens are
    // pruned before the self-join, so candidate volume — and the row —
    // must stay ~linear in the corpus. The dense leg is the IVFPQ probe
    // measured by ivf_filtered/knn_graph_cells; the fusion itself is
    // k-bounded per query and contributes nothing corpus-sized.
    time("rrf_fused") {
      val n = graft.queries.AnnQueries
        .rrfLexicalTopK(
          inflated, "doc_id", "text", col("id") % (50L * factor) === 0, 5)
        .count()
      graft.Caches.releaseAll()
      n
    }
    // dd_setsim's exact posting join (the shipped setsimFrom plan) on an
    // inflated basket table: replicas shift BOTH keys, so df(p) stays
    // constant and candidates must grow linearly with orders — the
    // documented claim this row backs with measurement.
    // shift derivation hoisted out of the timed span (see linkage_rounds)
    if (selected("setsim_pairs")) {
      val li = spark.read
        .parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      val liShift = shiftFor(li, "l_orderkey", "l_partkey")
      time("setsim_pairs") {
        val membership = (0 until factor)
          .map(r =>
            li.select(
              (col("l_orderkey") + lit(r.toLong * liShift)).as("o"),
              (col("l_partkey") + lit(r.toLong * liShift)).as("p")))
          .reduce(_ union _)
        val n = graft.queries.DedupQueries.setsimFrom(membership).count()
        graft.Caches.releaseAll()
        n
      }
    }
    // mm_phash: real per-image decode+hash is map-only (linear in images);
    // banding runs on DISTINCT hashes only (round 7: exact duplicates —
    // the hot collision mass an inflated corpus is full of — contribute
    // one banded row per distinct hash, and fan back out only where the
    // output itself is pair-shaped). The pair count may grow with corpus
    // density, but the banded join's input must not.
    time("phash_pairs") {
      val hashed = graft.operators.Multimodal
        .dhash56(graft.operators.Multimodal.synthesizeImages(inflated, "doc_id", "text"))
        .select("doc_id", "dhash")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = graft.queries.SourceQueries
        .phashPairFanout(hashed, graft.queries.SourceQueries.bandedHashPairs(hashed))
        .count()
      hashed.unpersist()
      n
    }
    // Round-6 additions. CDC chunking is a narrow native-expression map
    // plus ONE slim (hash, id, pos, len) shuffle for the first-occurrence
    // election — cost must stay linear in corpus characters. Sampled
    // Brandes on the inflated near-dup graph must stay frontier-
    // proportional per round (forward sigma rounds + two backward joins),
    // like bfs_3hop.
    time("cdc_chunks") {
      val chunks = inflated
        .select(
          col("doc_id"),
          graft.functions.Compat
            .column(graft.expressions.CdcChunks(
              graft.functions.Compat.expression(col("text")), 8, 64L))
            .as("cs"))
        .select(col("doc_id"), explode(col("cs")).as("c"))
        .select(col("doc_id"), col("c.pos").as("pos"), col("c.hash").as("hash"))
      val n = chunks
        .groupBy("hash")
        .agg(count(lit(1)).as("n_occ"), min(struct(col("doc_id"), col("pos"))).as("owner"))
        .count()
      graft.Caches.releaseAll()
      n
    }
    // Fixed-K sources — the operator's contract: sampled-Brandes cost is
    // sources × frontier, so the probe holds K constant (as production
    // would) and checks the per-source frontier work stays graph-linear.
    time("betweenness") {
      val seeds = sym.select(col("src").as("id")).distinct()
        .filter(col("id") % 97 === 0).orderBy("id").limit(16)
      val n = graft.operators.Betweenness.scaledBrandes(sym, seeds, 3).count()
      graft.Caches.releaseAll()
      n
    }
    // gr_closeness's shape: PER-SOURCE labeled BFS — state is (q, id)
    // keyed, so per-round shuffle is Σ per-source frontiers. Production
    // holds the source SAMPLE fixed as the graph grows (the standard
    // centrality estimator), so the probe caps sources at a constant and
    // the expectation is frontier-linear growth in graph size.
    time("closeness_labeled") {
      val seeds = sym.select(col("src").as("q")).distinct()
        .filter(col("q") % 97 === 0).orderBy("q").limit(32)
      val n = graft.operators.Bfs.runLabeled(sym, seeds, 2)
        .filter(col("dist") >= 1)
        .groupBy("q")
        .agg(count(lit(1)).as("n_reached"))
        .count()
      graft.Caches.releaseAll()
      n
    }
    locally {
      val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val vecShift = shiftFor(base, "vec_id")
      val infl = (0 until factor)
        .map(r => base.select((col("vec_id") + lit(r.toLong * vecShift)).as("vec_id"), col("embedding")))
        .reduce(_ union _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("pca_int_iter")(graft.queries.AnnQueries.embPcaFrom(infl).count())
      // Filtered IVF at 20x: the index (centroids + assignment) is built on
      // the full inflated table; the allow-list semi-join must price as an
      // ids-only join, so search cost stays ~nprobe/nCells of the corpus
      // regardless of the predicate's shape.
      time("ivf_filtered") {
        val allowed = infl.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
        val n = graft.operators.Ann
          .ivfTopK(
            infl,
            "vec_id",
            "embedding",
            col("id") % 1000000L < 16,
            col("id") % (50L * factor) === 0,
            2,
            5,
            Some(allowed))
          .count()
        graft.Caches.releaseAll()
        n
      }
      // Cell-bucketed kNN graph at 20x: the honest scale knob is growing
      // the cell COUNT with the corpus (k = 8 x factor) so expected cell
      // size — and with it the per-cell all-pairs volume per row — stays
      // constant; total cost must then scale ~linearly with rows.
      time("knn_graph_cells") {
        val v = infl.select(
          col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("v"))
        val assigned = graft.operators.KMeans
          .fit(v, 8 * factor, 64, 1)
          .withColumn("nrm", sqrt(graft.operators.Dedup.dotFold(col("v"), col("v"))))
        val l = assigned
          .select(col("cluster"), col("id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_nrm"))
        val r = assigned
          .select(col("cluster"), col("id").as("n_id"), col("v").as("n_v"), col("nrm").as("n_nrm"))
        val topk = (s: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
          graft.operators.TopKByScore.applied(3, s, i)
        val n = l
          .join(r, Seq("cluster"))
          .filter(col("n_id") =!= col("q_id"))
          .withColumn(
            "cos",
            graft.operators.Dedup.dotFold(col("q_v"), col("n_v")) / (col("q_nrm") * col("n_nrm")))
          .groupBy("q_id")
          .agg(topk(col("cos"), col("n_id")).as("top"))
          .count()
        graft.Caches.releaseAll()
        n
      }
      // Radius search at 20x: the query batch is FIXED size (ids chosen
      // modulo 50 x factor), so the broadcast side is constant and cost
      // must scale linearly with the corpus scan — the map-only claim.
      time("range_search") {
        val n = graft.operators.Ann
          .rangeSearch(infl, "vec_id", "embedding", col("id") % (50L * factor) === 0, 0.25)
          .count()
        graft.Caches.releaseAll()
        n
      }
      infl.unpersist()
      ()
    }
    // Round-5-final additions: the funnel is three filtered user-keyed
    // aggregates — cost must stay linear in events with NO full-stream
    // window; survivorship voting shuffles (cluster, field) count rows
    // only, so it must price with the membership, not the corpus.
    locally {
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      // both shifts from ONE scan (r13 review: two shiftFor calls paid
      // two back-to-back events.parquet scans)
      val Seq(evMax, userMax) = maxima(ev, "event_id", "user_id")
      val (evShift, userShift) = (evMax + 1L, userMax + 1L)
      val evInfl = (0 until factor)
        .map(r => ev.select(
          (col("event_id") + lit(r.toLong * evShift)).as("event_id"),
          col("ts"),
          (col("user_id") + lit(r.toLong * userShift)).as("user_id"),
          col("event_type")))
        .reduce(_ union _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      evInfl.count()
      time("funnel_steps") {
        val e = evInfl.select(col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        val t1 = e.filter(col("event_type") === "view").groupBy("user_id").agg(min("us").as("t1"))
        val t2 = e.filter(col("event_type") === "click").join(t1, Seq("user_id"))
          .filter(col("us") > col("t1")).groupBy("user_id").agg(min("us").as("t2"))
        val t3 = e.filter(col("event_type") === "purchase").join(t2, Seq("user_id"))
          .filter(col("us") > col("t2")).groupBy("user_id").agg(min("us").as("t3"))
        t1.join(t2, Seq("user_id"), "left").join(t3, Seq("user_id"), "left").count()
      }
      // As-of attribution must price as ONE |probe|+|build| shuffle —
      // the union-window formulation's whole point. A superlinear term
      // here means the pair-join shape snuck back in.
      time("asof_attribution") {
        val e = evInfl.select(
          col("event_id"),
          col("user_id"),
          col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        val probe = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "us")
        val build = e.filter(col("event_type") =!= "purchase")
          .groupBy("user_id", "us")
          .agg(max(col("event_id")).as("touch_id"),
            max_by(col("event_type"), col("event_id")).as("touch_type"))
        graft.operators.AsOfJoin
          .asOf(probe, build, key = "user_id", time = "us",
            buildValues = Seq("touch_id", "touch_type"))
          // consume the attached column: a bare count() lets Catalyst
          // prune the whole window, timing nothing
          .filter(col("touch_id").isNotNull)
          .count()
      }
      // Same attribution on the custom sort-merge exec — the two as-of
      // backends should price identically (one co-clustered shuffle each).
      time("asof_merge_exec") {
        val e = evInfl.select(
          col("event_id"),
          col("user_id"),
          col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        val probe = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "us")
        val build = e.filter(col("event_type") =!= "purchase")
          .groupBy("user_id", "us")
          .agg(max(col("event_id")).as("touch_id"),
            max_by(col("event_type"), col("event_id")).as("touch_type"))
        graft.plans.AsOfMerge
          .asOf(probe, build, key = "user_id", time = "us",
            buildValues = Seq("touch_id", "touch_type"))
          .filter(col("touch_id").isNotNull)
          .count()
      }
      // Keyless band join (q134's operator): replicas extend the TIME
      // AXIS (ts shifted past the base span per replica) so event density
      // stays constant and matched pairs grow linearly with rows — the
      // honest scale-up. The inflation is persisted+materialized as
      // UNTIMED setup (the banded plan consumes it twice — purchase and
      // click branches — and would otherwise re-scan events.parquet
      // 2×factor times inside the row); the timed span is the join only.
      if (selected("band_join")) {
        val w = 60L * 1000000L
        val e0 = ev.select(
          col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"),
          col("event_type"))
        // Derive the per-replica time shift from the OBSERVED span (same
        // discipline as the key shifts via shiftFor/max+1): a fixed "31
        // days" constant collides the moment the generator's span grows
        // or the probe points at an already time-inflated dir, and
        // cross-replica pairs would silently break pair-linear growth.
        // + w + 1 keeps even band-edge windows from straddling replicas.
        // Untimed setup scan, same as the key-maxima scans above.
        val spanRow = e0.agg(min(col("us")), max(col("us"))).head()
        // empty/all-null guard (the maxima() discipline): an empty events
        // table degrades to an honest 0-pair run, not a getLong NPE
        val spanShift =
          if (spanRow.isNullAt(0) || spanRow.isNullAt(1)) w + 1L
          else (spanRow.getLong(1) - spanRow.getLong(0)) + w + 1L
        val eInfl = (0 until factor)
          .map(r => e0.select(
            (col("event_id") + lit(r.toLong * evShift)).as("event_id"),
            (col("us") + lit(r.toLong * spanShift)).as("us"),
            col("event_type")))
          .reduce(_ union _)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        eInfl.count()
        time("band_join") {
          val p = eInfl.filter(col("event_type") === "purchase")
            .select(col("event_id").as("p_id"), col("us").as("p_us"))
          val c = eInfl.filter(col("event_type") === "click").select(col("us").as("c_us"))
          val n = graft.operators.BandJoin.banded(p, c, "p_us", "c_us", w).count()
          graft.Caches.releaseAll()
          n
        }
        eInfl.unpersist(blocking = false)
        ()
      }
      evInfl.unpersist()
      ()
    }
    time("survivorship_vote") {
      import org.apache.spark.sql.expressions.Window
      val members = inflated.select(
        col("doc_id"),
        (col("doc_id") % lit(n0 / 10)).as("cluster_id"),
        col("lang"))
      val n = members
        .groupBy("cluster_id", "lang")
        .agg(count(lit(1)).as("c"))
        .withColumn(
          "rn",
          row_number().over(
            Window.partitionBy("cluster_id").orderBy(col("c").desc, col("lang").asc)))
        .filter(col("rn") === 1)
        .count()
      n
    }
    // DSIR importance weighting: two map-side-combined distribution
    // passes + a 64-row broadcast LUT join — cost must stay linear in the
    // token stream with zero corpus-sized shuffles beyond the counts.
    time("dsir_weights") {
      val bk = inflated
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
        .withColumn("b",
          pmod(graft.functions.Hashing.md5Long60(concat(lit("dsir|"), col("tok"))), lit(64L)))
      val corpus = bk.groupBy("b").agg(count(lit(1)).as("n_c"))
      val target = bk.filter(col("lang") === "en").groupBy("b").agg(count(lit(1)).as("n_t"))
      val totals = bk.agg(count(lit(1)).as("nc_total"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt_total"))
      val lut = corpus.join(target, Seq("b"), "left")
        .crossJoin(broadcast(totals))
        .select(col("b"),
          round(lit(1000000.0) *
            ((coalesce(col("n_t"), lit(0L)) + 1L) * (col("nc_total") + 64)).cast("double") /
            ((col("n_c") + 1L) * (col("nt_total") + 64)).cast("double")).cast("long").as("score"))
      bk.groupBy("doc_id", "b").agg(count(lit(1)).as("cnt"))
        .join(broadcast(lut), Seq("b"))
        .groupBy("doc_id")
        .agg(sum(col("cnt") * col("score")).as("w"))
        .count()
    }
    // Round-6 multimodal dedup funnels, round-7 shape: real encode+decode
    // is the per-row cost (must stay map-proportional — payloads never
    // shuffle), banding runs on distinct hashes, and CC runs on the
    // REDUCED graph (exact-group stars + one rep edge per qualifying hash
    // pair) whose edge count is linear in docs + hash pairs — never on
    // the pair fan-out. Superlinearity here would mean a band got hot.
    time("image_dedup") {
      import graft.operators.{ConnectedComponents, Multimodal}
      val hashed = Multimodal
        .dhash56(Multimodal.synthesizeImages(inflated, "doc_id", "text"))
        .select("doc_id", "dhash")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edges = graft.queries.SourceQueries
        .phashDedupEdges(hashed, graft.queries.SourceQueries.bandedHashPairs(hashed))
      val n = ConnectedComponents.run(edges, "a_id", "b_id").count()
      hashed.unpersist()
      n
    }
    time("audio_dedup") {
      // Exact-equality dedup: clusters are hash groups — one groupBy,
      // never a pair self-join (whose output squares on hot contours).
      import graft.operators.Multimodal
      Multimodal.audioFingerprints(inflated, "doc_id", "text", 25).toDF()
        .groupBy("fp")
        .agg(min(col("doc_id")).as("cluster_id"), count(lit(1)).as("n"))
        .count()
    }
    time("video_dedup") {
      // Scene-structure signature (frame count + detected-cut XOR'd md5
      // fingerprint — the SHIPPED videoSignatureDedup stage): equality
      // groups like audio_dedup — narrow flatMap decode + one per-doc
      // window + one groupBy; must stay frame-linear.
      import graft.operators.Multimodal
      val frames = Multimodal.videoFrameLumas(inflated, "doc_id", "text").toDF()
      graft.queries.SourceQueries.videoSignatureDedup(frames).count()
    }
    // Bipartite butterfly census (gr_butterflies' shipped core): replicas
    // shift BOTH sides' ids, so each replica is a disjoint bipartite copy
    // — supplier pairs, wedges, and butterflies all grow exactly x factor
    // and the timed wedge self-join + aggregate must track that. Setup
    // (distinct edges + derived shifts) stays untimed.
    // The guard covers BOTH rows so `ScaleProbe N butterflies_hot` alone
    // still builds its input (round-15 review: the nested guard made the
    // hot row silently unreachable when selected by itself).
    if (selected("butterflies") || selected("butterflies_hot")) {
      val ebase = spark.read
        .parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ebase.count()
      val pShift = shiftFor(ebase, "p")
      val sShift = shiftFor(ebase, "s")
      // Inflation persisted+materialized UNTIMED (the band_join policy):
      // butterfliesOver references its edge frame three times (two wedge
      // sides + the n_edges aggregate), and the shipped query persists
      // its edge frame for the same reason — the timed span is the
      // census, not factor x 3 union rebuilds.
      val eInfl = (0 until factor)
        .map(r =>
          ebase.select(
            (col("p") + lit(r.toLong * pShift)).as("p"),
            (col("s") + lit(r.toLong * sShift)).as("s")))
        .reduce(_ union _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      eInfl.count()
      // The plain census row, shared with the hot variant's exactness
      // check so it is computed once per run (round-15 review).
      var plainRow: org.apache.spark.sql.Row = null
      time("butterflies") {
        val row = graft.queries.GraphQueries.butterfliesOver(eInfl).head()
        plainRow = row
        println(s"SCALE butterflies        pairs=${row.getLong(1)} " +
          s"wedges=${row.getLong(2)} bf=${row.getLong(3)} " +
          s"hot_parts=${row.getLong(5)}")
        row.getLong(3)
      }
      // Planted-hot-key variant (r14 verdict #2's probe): ONE part wired
      // to every supplier in the inflated graph, PADDED with fresh
      // supplier ids up to degree > BflyDegCap when the corpus is small
      // (sf0.001 has ~10 suppliers — without padding the part would be
      // legitimately cool and the probe would blame the purge for its
      // own setup). At factor 20 on sf0.1 the degree is ~20,000, which
      // an uncapped census would fan into C(20k, 2) ≈ 2·10⁸ wedge rows
      // (~23× the whole unskewed census). The purge must (a) keep every
      // unskewed count bit-identical to the plain row, (b) report
      // exactly the planted mass, (c) cost ~the plain row, not the fan.
      if (selected("butterflies_hot")) {
        val hotPart = java.lang.Long.MAX_VALUE / 2 // disjoint from any shifted replica id
        val suppliers = eInfl.select(col("s")).distinct()
        val nSupp = suppliers.count()
        val pad = math.max(0L, graft.queries.GraphQueries.BflyDegCap + 1 - nSupp)
        val hotSupp = suppliers.union(
          spark.range(pad).select((lit(java.lang.Long.MAX_VALUE / 2) + col("id")).as("s")))
        val eHot = eInfl
          .union(hotSupp.select(lit(hotPart).as("p"), col("s")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nHotEdges = eHot.count() - eInfl.count()
        val plain =
          if (plainRow != null) plainRow
          else graft.queries.GraphQueries.butterfliesOver(eInfl).head()
        time("butterflies_hot") {
          val row = graft.queries.GraphQueries.butterfliesOver(eHot).head()
          println(s"SCALE butterflies_hot    pairs=${row.getLong(1)} " +
            s"wedges=${row.getLong(2)} bf=${row.getLong(3)} " +
            s"hot_parts=${row.getLong(5)} hot_edges=${row.getLong(6)}")
          require(row.getLong(5) == 1L && row.getLong(6) == nHotEdges,
            s"planted hot part not purged/reported: ${row.mkString(",")}")
          require(
            (1 to 4).forall(i => row.getLong(i) == plain.getLong(i)),
            s"purge disturbed the unskewed census: ${row.mkString(",")} vs ${plain.mkString(",")}")
          row.getLong(3)
        }
        eHot.unpersist(blocking = false)
      }
      eInfl.unpersist(blocking = false)
      ebase.unpersist(blocking = false)
      ()
    }
    // Facility-location coreset (ds_facility's shipped core): corpus
    // grows x factor while the candidate pool stays the constant
    // FacCandC md5-ranked draw, so each greedy round is C·N dots and the
    // whole selection must track ~linear — the de-quadratic fix's probe
    // (r14 verdict #1). Inflation persisted+materialized UNTIMED (the
    // band_join policy — the 4 rounds each rescan the corpus).
    if (selected("facility")) {
      val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val vShift = shiftFor(embBase, "vec_id")
      val quant = (0 until factor)
        .map(r =>
          embBase.select(
            (col("vec_id") + lit(r.toLong * vShift)).as("id"),
            transform(
              col("embedding").cast("array<double>"),
              x => round(x * 10000).cast("long")).as("qv")))
        .reduce(_ union _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      quant.count()
      time("facility") {
        val rows = graft.queries.DedupQueries.facilityOver(quant).collect()
        println(s"SCALE facility           picks=${rows.map(_.getLong(1)).mkString(",")} " +
          s"obj=${rows.last.getLong(2)}")
        graft.Caches.releaseAll()
        rows.length.toLong
      }
      quant.unpersist(blocking = false)
      ()
    }
    // Multi-probe LSH (ann_multiprobe's shipped operator): corpus grows
    // x factor, the query set stays the BASE replica's (fixed), so the
    // timed cost models per-query serving against a growing index —
    // probed-bucket occupancy grows x factor, hence ~linear total time.
    if (selected("multiprobe")) {
      val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val vShift = shiftFor(embBase, "vec_id")
      // Inflation persisted+materialized UNTIMED (the band_join policy,
      // r14 ADVICE): the timed span is the serving cost the probe
      // models, not the factor-x union build.
      val embInfl = (0 until factor)
        .map(r =>
          embBase.select(
            (col("vec_id") + lit(r.toLong * vShift)).as("vec_id"),
            col("embedding")))
        .reduce(_ union _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      embInfl.count()
      time("multiprobe") {
        graft.operators.Ann
          .multiprobeTopK(
            embInfl,
            "vec_id",
            "embedding",
            // the SHIPPED parameters (shared constants — the probe can
            // never measure a configuration ann_multiprobe doesn't ship)
            col("id") % graft.queries.AnnQueries.QueryMod === 0 && col("id") < vShift,
            graft.queries.AnnQueries.MultiprobeBits,
            graft.queries.AnnQueries.K)
          .count()
      }
      embInfl.unpersist(blocking = false)
      ()
    }
    // Fellegi-Sunter m/u estimation (er_fellegi's shipped core): the
    // labeled pair set and the attribute side both replicate with the
    // same id shift; u needs only per-value marginal counts and m two
    // hash joins on doc_id, so time must stay linear in docs + pairs
    // even as the u NUMERATORS grow x factor^2 (value counts, not pair
    // enumerations, are what's being aggregated).
    if (selected("fellegi_mu") || selected("emstep")) {
      val dbase = spark.read.parquet(s"$sfDir/documents.parquet")
      val pbase = graft.queries.ErQueries
        .matchFull(spark, sfDir)
        .select("a_id", "b_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pbase.count()
      val dShift = shiftFor(dbase, "doc_id")
      time("fellegi_mu") {
        val dInfl = (0 until factor)
          .map(r =>
            dbase.select(
              (col("doc_id") + lit(r.toLong * dShift)).as("doc_id"),
              col("source"),
              col("lang"),
              col("n_chars"),
              col("text")))
          .reduce(_ union _)
        val pInfl = (0 until factor)
          .map(r =>
            pbase.select(
              (col("a_id") + lit(r.toLong * dShift)).as("a_id"),
              (col("b_id") + lit(r.toLong * dShift)).as("b_id")))
          .reduce(_ union _)
        val n = graft.queries.ErQueries.fellegiOver(dInfl, pInfl).count()
        graft.Caches.releaseAll()
        n
      }
      // EM refinement (er_emstep's shipped core, same inflated frames):
      // replicas keep their (lang, bucket) block structure, so blocked
      // candidates grow block-quadratically per replica count — but the
      // pattern AGGREGATE is what the operator materializes (8 groups),
      // so time must track the candidate volume streamed through the
      // map-side combine, never a pair materialization.
      if (selected("emstep")) {
        val dInfl = (0 until factor)
          .map(r =>
            dbase.select(
              (col("doc_id") + lit(r.toLong * dShift)).as("doc_id"),
              col("source"),
              col("lang"),
              col("n_chars"),
              col("text")))
          .reduce(_ union _)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        dInfl.count()
        val pInfl = (0 until factor)
          .map(r =>
            pbase.select(
              (col("a_id") + lit(r.toLong * dShift)).as("a_id"),
              (col("b_id") + lit(r.toLong * dShift)).as("b_id")))
          .reduce(_ union _)
        time("emstep") {
          val rows = graft.queries.ErQueries.emstepOver(dInfl, pInfl).collect()
          println(s"SCALE emstep             " +
            rows.map(r => s"${r.getString(0)}=${r.getLong(2)}").mkString(" "))
          graft.Caches.releaseAll()
          rows.length.toLong
        }
        dInfl.unpersist(blocking = false)
      }
      pbase.unpersist(blocking = false)
      ()
    }
    time("bpe_train") {
      // Distributed BPE merge training on the inflated corpus: the first
      // word count is corpus-sized; every round after is a slim pair
      // aggregate over the VOCAB (not the corpus) + one driver argmax row
      // + a map-only merge fold — so rounds must be ~flat in corpus size
      // once the vocab saturates (the 31-token harness vocabulary
      // saturates immediately; the probe checks nothing corpus-sized
      // leaks into the round loop).
      val (merges, segs) = graft.queries.TextQueries.bpeTrainOn(inflated)
      val n = segs.count() + merges.size
      segs.unpersist(blocking = false)
      n
    }
    spark.stop()
  }
}
