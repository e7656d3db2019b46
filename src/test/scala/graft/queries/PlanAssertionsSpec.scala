package graft.queries

import graft.SparkSpec

/** Regression locks on the physical-plan properties PLANS.md documents:
  * scan pruning/pushdown, the broadcast dimension join, and the
  * TakeOrderedAndProject top-k. A change that silently loses one of these
  * costs nothing at test scale and everything at 100 TB — so they are
  * asserted, not just audited.
  */
class PlanAssertionsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    graft.SparkEntry
      .queries(name)(spark, dir)
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q2_filter pushes predicates and prunes columns at the scan") {
    val plan = planOf("q2_filter")
    assert(plan.contains("PushedFilters:"), plan.take(500))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), "shipdate range not pushed")
    assert(plan.contains("EqualTo(l_returnflag,R)"), "returnflag equality not pushed")
    // pruned read schema: no l_comment/l_tax etc.
    assert(!plan.contains("l_comment"), "scan reads unprojected columns")
  }

  test("q76_orc_roundtrip prunes the status partition and pushes the price filter into ORC") {
    val plan = planOf("q76_orc_roundtrip")
    // partition pruning: only the o_orderstatus=F directory is planned
    assert(
      plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      "status partition filter missing")
    // predicate pushdown into the ORC reader's search arguments
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice"), "price filter not pushed")
    assert(plan.contains("GreaterThan(o_totalprice,50000"), "price bound not pushed")
  }

  test("q3_join_agg broadcasts the customer dimension") {
    val plan = planOf("q3_join_agg")
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("SortMergeJoin"), "dimension join fell back to SMJ")
  }

  test("q12_topk plans TakeOrderedAndProject, not a global sort") {
    val plan = planOf("q12_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("q77_tpch5: hinted dims broadcast; SF-proportional sides are size-planned") {
    // Only nation(⋈region) carries an explicit broadcast hint; customer
    // and supplier are SF-proportional and deliberately UNHINTED (a
    // forced broadcast would OOM at large SF). Static estimation prices
    // the customer⋈nation join output conservatively, so the INITIAL
    // plan may sort-merge it — the lock here is on the AQE FINAL plan,
    // where runtime sizes convert the small sides back to broadcast at
    // test SF while large SF stays free to shuffle them.
    val df = graft.SparkEntry.queries("q77_tpch5")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AdaptiveSparkPlan isFinalPlan=true"), plan.take(300))
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(bhj >= 3, s"expected >=3 broadcast joins in the AQE final plan, got $bhj\n$plan")
    val smj = "SortMergeJoin".r.findAllIn(plan).length
    val shj = "ShuffledHashJoin".r.findAllIn(plan).length
    assert(smj + shj <= 1, s"more than the fact join shuffled: smj=$smj shj=$shj")
    // the forced-broadcast hints on customer/supplier must stay gone
    val src = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "src/main/scala/graft/queries/RelationalQueries.scala")))
    val body = src.substring(src.indexOf("def q77Tpch5"), src.indexOf("val q77Tpch5Sql"))
    assert(!body.contains("broadcast(cust)") && !body.contains("broadcast(supp)"),
      "SF-proportional side re-gained a forced broadcast hint")
  }

  test("q38_lateral decorrelates to a join, not a per-row subquery or cartesian") {
    val plan = planOf("q38_lateral")
    assert(!plan.contains("CartesianProduct"), "lateral planned as cartesian product")
    assert(
      plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"),
      plan.take(800))
  }

  test("q45_range_join keeps the equi key in the join, range as condition") {
    val plan = planOf("q45_range_join")
    // The custkey equality must drive the join (hash/merge), with the date
    // range as a residual condition — NOT a nested-loop over all pairs.
    assert(!plan.contains("CartesianProduct"), "range join planned as cartesian")
    assert(
      plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"),
      plan.take(800))
  }

  test("q44_unpivot expands without a shuffle before the sort") {
    val plan = planOf("q44_unpivot")
    assert(plan.contains("Expand"), "unpivot did not plan an Expand")
  }

  test("q46_skew_salted result equals the unsalted join") {
    val salted = graft.SparkEntry
      .queries("q46_skew_salted")(spark, dir)
      .collect()
      .map(_.toSeq)
      .toSet
    val plain = {
      import org.apache.spark.sql.functions._
      spark.read
        .parquet(s"$dir/lineitem.parquet")
        .join(
          spark.read.parquet(s"$dir/supplier.parquet"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
        .collect()
        .map(_.toSeq)
        .toSet
    }
    assert(salted == plain, "salting changed the join answer")
  }

  test("q64_bloom filters the fact scan by might_contain before a broadcast semi join") {
    val plan = planOf("q64_bloom")
    assert(plan.contains("might_contain"), "bloom membership test missing from the plan")
    assert(plan.contains("LeftSemi"), "exact semi-join settle missing")
    // The fact side must reach the semi join unshuffled: its join branch
    // is the bloom Filter sitting DIRECTLY on the parquet scan.
    val factDirect = "(?m)^\\s*:- Filter \\(\\d+\\)\\s*\\n\\s*:\\s+\\+- Scan parquet".r
    assert(
      factDirect.findFirstIn(plan).isDefined,
      s"fact side is not Filter-over-Scan:\n${plan.take(700)}")
  }

  test("emb_pq codebook assignment is map-only until the output sort") {
    val plan = planOf("emb_pq")
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(plan.split("\\(1\\) Scan")(0)).length
    assert(exchanges <= 1, s"PQ assignment plans $exchanges exchanges; expected only the final sort:\n${plan.take(600)}")
  }

  test("as-of joins plan as union+window — zero Join operators, no pair explosion") {
    for (q <- Seq("q15_asof", "q66_asof_fwd")) {
      val plan = planOf(q)
      assert(!plan.contains("Join"), s"$q planned a join — the union-window as-of must not:\n${plan.take(600)}")
      assert(plan.contains("Window"), s"$q lost its running-last window")
      // build-side (key, time) pre-agg + the per-key timeline + the output
      // sort: three exchanges, none proportional to matched PAIRS; more
      // means the union re-shuffled (count the numbered detail headers —
      // operator names repeat in the tree view)
      val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(plan).length
      assert(exchanges <= 3, s"$q plans $exchanges exchanges; want build pre-agg + key + output sort only:\n${plan.take(600)}")
    }
  }

  test("ta_scrub and ta_repetition are map-only scans until the output sort") {
    for (q <- Seq("ta_scrub", "ta_repetition")) {
      val plan = planOf(q)
      assert(!plan.contains("Join"), s"$q planned a join:\n${plan.take(600)}")
      val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(plan).length
      assert(exchanges <= 1, s"$q plans $exchanges exchanges; want only the output sort:\n${plan.take(600)}")
    }
  }

  test("gr_triangles closure joins broadcast — the edge stream never sort-merges") {
    val plan = planOf("gr_triangles")
    // Both adjacency lookups must be explicit broadcast hash joins (a
    // cached input defeats AQE's runtime promotion, so the static plan
    // must already show them). SMJs also appear — but only as the
    // edge-build subtree (lp ⋈ lp on the order key) replicated per explain
    // branch; the persist collapses those at runtime, and the closure
    // pass itself must not sort-merge, which the semi-join-free broadcast
    // form below guarantees.
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(bhj >= 2, s"adjacency lookups not broadcast ($bhj BHJ):\n${plan.take(800)}")
    assert(!plan.contains("SortMergeJoin LeftSemi"),
      s"closure semi join sort-merges the wedge stream:\n${plan.take(800)}")
  }

  test("dd_contaminate keeps the corpus side un-broadcast and un-self-joined") {
    val plan = planOf("dd_contaminate")
    // one broadcast (the benchmark ledger), no SMJ, no cartesian
    assert(plan.contains("BroadcastExchange"), plan.take(500))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("ta_winnow is a map-only pass until the presentation sort") {
    val plan = planOf("ta_winnow")
    assert(!plan.contains("Join"), s"winnowing planned a join:\n${plan.take(600)}")
    val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"winnowing plans $exchanges exchanges:\n${plan.take(600)}")
  }

  test("ds_bucket ranks via range repartition — no single-partition window") {
    val plan = planOf("ds_bucket")
    assert(
      !plan.contains("Window"),
      s"ds_bucket fell back to a window rank:\n${plan.take(600)}")
    assert(plan.contains("BroadcastHashJoin"), s"bucket offsets not broadcast:\n${plan.take(600)}")
  }

  test("mm_shard sizes the payload at the scan and shuffles no other column") {
    val plan = planOf("mm_shard")
    assert(!plan.contains("Join"), s"mm_shard planned a join:\n${plan.take(600)}")
    // the scan projects only (doc_id, text) — text is consumed by the
    // octet_length projection and must not be a window/sort attribute
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan reads more than (doc_id, text):\n${plan.take(900)}")
  }

  test("ann_rerank fetches shortlist vectors by equi join, never a cartesian") {
    val plan = planOf("ann_rerank")
    assert(!plan.contains("CartesianProduct"), s"rerank planned a cartesian:\n${plan.take(800)}")
    // stage-2 vector fetches: equi joins on q_id/n_id
    assert(
      plan.contains("BroadcastHashJoin") || plan.contains("ShuffledHashJoin") ||
        plan.contains("SortMergeJoin"),
      plan.take(800))
  }

  test("k-means assignment is map-side: no exchange, no join above the vector scan") {
    val v = graft.queries.Tables
      .t(spark, dir, "embeddings")
      .selectExpr("vec_id AS id", "CAST(embedding AS array<double>) AS v")
      .persist()
    try {
      val assigned = graft.operators.KMeans.fit(v, k = 4, dims = 64, iters = 1)
      val plan = assigned.queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!plan.contains("Join"), s"assignment planned a join:\n${plan.take(600)}")
      assert(!"(?<!Broadcast)Exchange".r.findFirstIn(plan).isDefined,
        s"assignment shuffles the vector table:\n${plan.take(600)}")
    } finally { v.unpersist(); () }
  }

  test("ta_pairlift fans out pairs with codegen'd Generates, not nested lambdas") {
    val plan = planOf("ta_pairlift")
    // The combination fan-out must stay two chained Generate(explode)s —
    // a nested transform() lambda evaluates interpreted and measured 11x
    // slower at sf0.1 for the identical 1.4M-pair fan-out.
    val generates = "(?m)^\\(\\d+\\) Generate".r.findAllIn(plan).length
    assert(generates >= 2, s"pair fan-out lost its Generate chain:\n${plan.take(600)}")
    assert(!plan.contains("LambdaFunction"),
      s"pair fan-out regressed to an interpreted nested lambda:\n${plan.take(600)}")
    assert(!plan.contains("CartesianProduct"), "pairlift planned a cartesian")
  }

  test("mm_phash joins banded hashes — image payloads never cross a shuffle") {
    val plan = planOf("mm_phash")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"phash candidate join regressed to a pair explosion:\n${plan.take(600)}")
    // The band self-join must key on the exploded band struct, and no
    // Exchange may carry the BMP payload column (slim (id, hash) rows only).
    val exchangeSections = plan.split("(?m)^\\(\\d+\\) Exchange").drop(1)
    assert(exchangeSections.nonEmpty, "expected a shuffle for the band join")
    exchangeSections.foreach { s =>
      val header = s.linesIterator.take(3).mkString("\n")
      assert(!header.contains("payload"), s"payload crosses a shuffle:\n$header")
    }
  }

  test("ann_ivfpq scores codes against a broadcast LUT and ranks with the bounded aggregator") {
    val plan = planOf("ann_ivfpq")
    assert(!plan.contains("CartesianProduct"),
      s"ivfpq candidate generation regressed to a cartesian:\n${plan.take(800)}")
    // LUT scoring join must broadcast the per-query lookup table.
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    // Ranking is the TopKByScore aggregator, never a per-query window sort.
    assert(!plan.contains("Window"), s"ivfpq ranked via a window funnel:\n${plan.take(800)}")
  }

  test("ann_pq ranks with the bounded aggregator — no window over the scored frame") {
    val plan = planOf("ann_pq")
    // The r5 plan ranked the corpus-sized scored frame with row_number;
    // the bounded TopKByScore funnel shuffles k rows per query instead.
    assert(!plan.contains("Window"), s"ann_pq ranked via a window funnel:\n${plan.take(800)}")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("ann_sq broadcasts the range table; ranking is the bounded aggregator") {
    val plan = planOf("ann_sq")
    assert(!plan.contains("Window"), s"ann_sq ranked via a window funnel:\n${plan.take(800)}")
    // the (dims x 2) range frame and the query side ride broadcasts; the
    // declared query x corpus scoring pass is the only nested loop.
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(800))
  }

  test("ann_knngraph buckets all-pairs work per cell and reverses edges by equi join") {
    val plan = planOf("ann_knngraph")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"knn graph regressed to an unbucketed pair explosion:\n${plan.take(800)}")
    assert(!plan.contains("Window"), s"knn ranking regressed to a window funnel:\n${plan.take(800)}")
  }

  test("dd_keepbest selects the canonical member with an aggregate, not a window") {
    val plan = planOf("dd_keepbest")
    // max(struct(quality, doc_id)) must plan as a partial+final aggregate
    // (one slim candidate row per partition per cluster crosses the
    // shuffle); a row_number window would funnel every member through a
    // per-cluster sort.
    assert(!plan.contains("Window"), s"keepbest regressed to a window funnel:\n${plan.take(600)}")
    assert("partial_max".r.findFirstIn(plan).isDefined ||
      "HashAggregate".r.findFirstIn(plan).isDefined,
      s"keepbest lost its partial aggregate:\n${plan.take(600)}")
  }

  test("q82_tpch18 broadcasts the qualifying-order key set into the fact joins") {
    val plan = planOf("q82_tpch18")
    // The HAVING aggregate is threshold-bounded and must ride a broadcast;
    // orders/customer must not sort-merge against it.
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"),
      s"qualifying-key semi-join fell back to SMJ:\n${plan.take(800)}")
  }

  test("q83_attribution plans ONE union-window pass, no purchase×touch join") {
    val plan = planOf("q83_attribution")
    // The as-of attachment must be the union-window formulation: zero
    // joins anywhere in the plan (a probe⋈build formulation pays O(pairs)).
    assert(!plan.contains("Join"), s"as-of regressed to a pair join:\n${plan.take(800)}")
    assert(plan.contains("Window"), plan.take(800))
    assert(plan.contains("hashpartitioning(user_id"),
      s"window not keyed on user_id:\n${plan.take(800)}")
  }

  test("q81_retention broadcasts the cohort-size frame") {
    val plan = planOf("q81_retention")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("q85_asof_exec plans the custom merge exec and no window") {
    val plan = planOf("q85_asof_exec")
    assert(plan.contains("AsOfMergeJoin"), plan.take(800))
    assert(!plan.contains("Window"), s"merge backend regressed to a window:\n${plan.take(800)}")
  }

  test("q92_tpch7 broadcasts nation onto both dims; fact joins stay size-planned") {
    val plan = planOf("q92_tpch7")
    // two broadcast joins (nation onto supplier, nation onto customer);
    // no explicit hint on the SF-proportional sides.
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan.take(800))
    assert(!plan.contains("CartesianProduct"), "nation pair filter degraded to a cartesian")
  }

  test("dd_cdc evaluates the native chunker exactly once per document") {
    val plan = planOf("dd_cdc")
    // The O(n) chunker must appear ONLY in the Generate's input — the
    // explode_outer form keeps InferFiltersFromGenerate from planting a
    // `size(graft_cdc_chunks(...)) > 0` filter that re-runs the chunker
    // per row. The ledger join is unhinted (size-planned broadcast at
    // toy SF is fine; nothing forces it at scale), never a cartesian.
    assert(
      "graft_cdc_chunks".r.findAllIn(plan).size <= 2, // Generate arg + its schema echo
      s"chunker evaluated more than once:\n${plan.take(900)}")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
  }

  test("mm_audiofp joins banded fingerprints — audio payloads never cross a shuffle") {
    val plan = planOf("mm_audiofp")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    // the pair join's keys are the (band, value) struct, shipping longs
    assert(!plan.contains("payload"), "audio payload column reached the join")
  }

  test("gr_betweenness plans keyed joins only — no cartesian anywhere in 5 rounds") {
    val plan = planOf("gr_betweenness")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("ds_pareto dominance is decided on the per-value aggregate, not the corpus") {
    val plan = planOf("ds_pareto")
    // the only non-equi join is the domain-bounded (a' > a) self-join of
    // the per-length aggregate — broadcast nested loop over a tiny frame
    // is acceptable; a document-level cartesian is not. The corpus frame
    // appears exactly twice (signal build + final keyed join back).
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q97_tpch3 plans top-k (TakeOrderedAndProject) with all three filters pushed") {
    val plan = planOf("q97_tpch3")
    assert(plan.contains("TakeOrderedAndProject"), "top-10 fell back to a global sort")
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"), "segment filter not pushed")
    assert(plan.contains("LessThan(o_orderdate"), "order-date bound not pushed")
    assert(plan.contains("GreaterThan(l_shipdate"), "ship-date bound not pushed")
  }

  test("q98_tpch10 plans top-k and pushes the returnflag filter to the fact scan") {
    val plan = planOf("q98_tpch10")
    assert(plan.contains("TakeOrderedAndProject"), "top-20 fell back to a global sort")
    assert(plan.contains("EqualTo(l_returnflag,R)"), "returnflag not pushed")
  }

  test("q100_tpch19 runs ONE equi-join with the disjunction as a filter, never a loop") {
    val plan = planOf("q100_tpch19")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "disjunctive predicate degraded the join to a nested loop")
    assert(
      plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"),
      plan.take(600))
  }

  test("q101_tpch22 anti-joins on the order key; the totals side is a 1-row broadcast") {
    val plan = planOf("q101_tpch22")
    assert(plan.contains("LeftAnti"), "no-orders test lost its anti join")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    // the date filter must reach the orders scan feeding the anti join
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), "lapse date not pushed")
  }

  test("ta_bpeapply joins the corpus to the vocab-sized tokenizer table by BROADCAST") {
    val plan = planOf("ta_bpeapply")
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(!plan.contains("SortMergeJoin"),
      "tokenizer lookup shuffled the corpus — the vocab table must broadcast")
  }

  test("q106_tpch9 pushes the p_name contains filter to the part scan") {
    val plan = planOf("q106_tpch9")
    assert(plan.contains("StringContains(p_name,widget)"), "name filter not pushed to parquet")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(plan.contains("BroadcastHashJoin"), "nation lookup must broadcast")
  }

  test("q107_tpch11 joins the global total as a 1-row broadcast, fact scanned once") {
    val plan = planOf("q107_tpch11")
    // The scalar-threshold HAVING: per-part values cross-joined to the
    // 1-row total via broadcast nested loop — never a shuffle, and never
    // a second fact aggregate.
    assert(plan.contains("BroadcastNestedLoopJoin"), "total must join as 1-row broadcast")
    val scans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 lineitem scan, got $scans")
  }

  test("q108_tpch15 date-prunes the fact scan and broadcasts the bounded winner set") {
    val plan = planOf("q108_tpch15")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), "ship-date range not pushed")
    // The max-equality rides a broadcast (Catalyst turns the 1-row cross
    // join + equality filter into a broadcast hash join); nothing about
    // this query may sort-merge.
    assert(plan.contains("BroadcastHashJoin"), "max/winner joins must broadcast")
    assert(!plan.contains("SortMergeJoin"), "a bounded side fell back to SMJ")
    assert(plan.contains("InMemoryRelation"), "the revenue view must persist, not recompute")
    val scans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 lineitem scan, got $scans")
  }

  test("q109_tpch17 decorrelates the per-part mean as a window — one lineitem scan") {
    val plan = planOf("q109_tpch17")
    val scans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 lineitem scan, got $scans")
    assert(plan.contains("Window"), "per-part avg must be a partitioned window")
    assert(plan.contains("EqualTo(p_brand,Brand#13)"), "brand filter not pushed to part scan")
  }

  test("q110_tpch4 prunes orders by the quarter and semi-joins the late set") {
    val plan = planOf("q110_tpch4")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), "quarter window not pushed")
    assert(plan.contains("LeftSemi"), "EXISTS must decorrelate to a semi join")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    // The quarter-pruned orders frame is referenced twice — the persist
    // must keep it ONE scan.
    val scans = "orders\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 orders scan, got $scans")
  }

  test("q111_tpch6 pushes all three predicates and aggregates map-side") {
    val plan = planOf("q111_tpch6")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), "date range not pushed")
    assert(plan.contains("GreaterThanOrEqual(l_discount"), "discount band not pushed")
    assert(plan.contains("LessThan(l_quantity,24"), "quantity cap not pushed")
    assert(!plan.contains("Join"), "Q6 is one scan + one aggregate — no join belongs here")
  }

  test("q114_tpch1 partially aggregates before its single exchange") {
    val plan = planOf("q114_tpch1")
    assert(plan.contains("partial_sum"), "map-side partial aggregation missing")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"Q1 needs only the agg exchange (+ sort), got $exchanges")
    assert(plan.contains("LessThanOrEqual(l_shipdate"), "ship-date bound not pushed")
  }

  test("q89_tpch2 scans lineitem ONCE (window min, not agg + join-back)") {
    // r7 verdict #1: the aggregate+join-back form computed the whole
    // lineitem⋈part⋈supplier tree twice (no shareable exchange between an
    // agg on partkey and a join on (partkey, price)). The window form is
    // one scan; this lock keeps it that way.
    val plan = planOf("q89_tpch2")
    val scans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 lineitem scan, got $scans")
    assert(plan.contains("Window"), "per-part min must be a partitioned window")
  }

  test("q115_dscte computes the reused CTE once — exactly one orders scan") {
    val plan = planOf("q115_dscte")
    // The per-customer spend CTE is consumed twice (nation average +
    // own-value probe); the persist must keep it ONE orders⋈customer
    // aggregate — the failure mode TPC-DS Q1 punishes is planning the
    // subtree per consumer.
    val scans = "orders\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 orders scan, got $scans")
    assert(plan.contains("InMemoryRelation"), "the spend CTE must persist, not recompute")
    // the nation-bounded aggregate rides a broadcast
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
  }

  test("q116_dswindow windows partition on real keys over the joined aggregate") {
    val plan = planOf("q116_dswindow")
    assert(plan.contains("Window"), "rank/deviation lost their windows")
    assert(
      plan.contains("hashpartitioning(month") || plan.contains("hashpartitioning(nationkey"),
      s"window not partition-keyed:\n${plan.take(800)}")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
  }

  test("q117_dschannels unions two pruned fact scans into ONE aggregate") {
    val plan = planOf("q117_dschannels")
    assert(plan.contains("Union"), "channel union missing")
    assert(!plan.contains("Join"), s"channels must never join:\n${plan.take(600)}")
    // partial aggregation must sit above the union so each branch
    // combines map-side before the single exchange
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"no map-side partial aggregate above the union:\n${plan.take(800)}")
  }

  test("q118_dsrollup windows over the rollup output, one lineitem scan") {
    val plan = planOf("q118_dsrollup")
    // the rollup plans as Expand feeding ONE aggregate
    assert(plan.contains("Expand"), s"rollup lost its Expand:\n${plan.take(600)}")
    val scans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 lineitem scan, got $scans")
    // the rank window reads the (bounded) rollup output, partitioned on
    // the hierarchy key — never a partitionless funnel
    assert(plan.contains("Window"), "hierarchy rank lost its window")
    assert(plan.contains("hashpartitioning(lochierarchy"),
      s"window not keyed on the grouping level:\n${plan.take(800)}")
    // both dimensions broadcast
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
  }

  test("q119_dsexists decorrelates the OR-of-EXISTS to one semi join") {
    val plan = planOf("q119_dsexists")
    assert(plan.contains("LeftSemi"), s"semi join missing:\n${plan.take(600)}")
    // ONE customer scan probed by the union of the two key channels
    val scans = "customer\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 customer scan, got $scans")
    assert(plan.contains("Union"), "two-channel key union missing")
    // the year/flag predicates prune each channel at its scan
    assert(plan.contains("EqualTo(l_returnflag,R)"),
      s"lineitem channel filter not pushed:\n${plan.take(900)}")
  }

  test("q120_dsintersect builds the channel relationship once — two lineitem scans") {
    val plan = planOf("q120_dsintersect")
    // one scan for the persisted (part, segment) frame, one for revenue
    val scans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(scans == 2, s"expected exactly 2 lineitem scans, got $scans")
    assert(plan.contains("InMemoryRelation"),
      "the (part, segment) relationship frame must persist, not recompute per channel")
    // the INTERSECT chain plans as key-only semi joins
    assert(plan.contains("LeftSemi"), s"intersect lost its semi joins:\n${plan.take(600)}")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
  }

  test("q121_dscumulative windows the bounded month spine after a full outer join") {
    val plan = planOf("q121_dscumulative")
    assert(plan.contains("FullOuter"), s"channel spine join missing:\n${plan.take(600)}")
    assert(plan.contains("Window"), "running totals lost their window")
    // the heavy lifting is two partially-aggregated fact scans; the
    // partitionless window only ever sees the month-bounded aggregate
    assert(plan.contains("partial_sum") || plan.contains("partial merge"),
      s"fact scans must pre-aggregate map-side:\n${plan.take(800)}")
  }

  test("q122_dsgrowth aggregates each channel once — no per-year rescan") {
    val plan = planOf("q122_dsgrowth")
    // both years come out of ONE conditional aggregate per channel
    val liScans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(liScans == 1, s"expected exactly 1 lineitem scan, got $liScans")
    // orders: one scan for its own channel + one slim custkey projection
    val ordScans = "orders\\.parquet".r.findAllIn(plan).length
    assert(ordScans == 2, s"expected exactly 2 orders scans, got $ordScans")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    // The year prune reaches both fact scans as a CONCRETE pushed range —
    // the bare "PushedFilters" token appears in every parquet scan node
    // even when the pushed list is empty (the r10-advice vacuity), so
    // assert the actual predicates. `year(col) IN (…)` would push nothing.
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"orders year prune not pushed:\n${plan.take(1200)}")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"lineitem year prune not pushed:\n${plan.take(1200)}")
  }

  test("q123_dsreuse materializes the three-table CTE once — one lineitem scan") {
    val plan = planOf("q123_dsreuse")
    // The Q64 point: the self-joined sales profile must come from ONE
    // materialized frame, never two runs of the three-table join.
    val liScans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(liScans == 1, s"expected exactly 1 lineitem scan, got $liScans")
    assert(plan.contains("InMemoryRelation"),
      "the sales-profile CTE must persist, not recompute per year")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    // the year prune reaches the orders scan as a concrete range
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"orders range not pushed:\n${plan.take(1200)}")
  }

  test("q124_dsspine bands the date-offset join — equi joins only, pushed ranges") {
    val plan = planOf("q124_dsspine")
    // The Q72 point: the 14-day-offset fact-to-fact join must plan as
    // banded EQUI joins (week explode), never a nested-loop range join.
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"range join regressed to a loop join:\n${plan.take(800)}")
    // the week spine broadcasts
    assert(plan.contains("BroadcastHashJoin"), s"spine not broadcast:\n${plan.take(800)}")
    // both fact scans carry their concrete pushed date ranges
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"demand range not pushed:\n${plan.take(1200)}")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"supply range not pushed:\n${plan.take(1200)}")
  }

  test("ann_rrf fuses the IVFPQ shortlist with a df-capped posting join") {
    val plan = planOf("ann_rrf")
    assert(!plan.contains("CartesianProduct"),
      s"rrf regressed to a pair explosion:\n${plan.take(800)}")
    // the hot-token max-df prune is a broadcast anti join ahead of the
    // posting self-join
    assert(plan.contains("LeftAnti"), s"max-df prune lost its anti join:\n${plan.take(800)}")
    // the dense leg is the IVFPQ chain: broadcast LUT join present
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("mm_videodedup is one window + two aggregates — no join of any kind") {
    val plan = planOf("mm_videodedup")
    assert(plan.contains("Window"), "scene-cut detection lost its per-doc window")
    assert(
      !plan.contains("Join") && !plan.contains("CartesianProduct"),
      "equality-group dedup must not build a pair join")
  }

  test("q126_dsreturns plans bounded top-k aggregates — no window sort anywhere") {
    val plan = planOf("q126_dsreturns")
    // the Q49 scale decision: per-channel ranks come from the bounded
    // TopKByScore buffer, never a whole-item-aggregate window sort
    assert(!plan.contains("Window"), s"rank regressed to a window sort:\n${plan.take(800)}")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"TopKByScore udaf aggregate missing:\n${plan.take(800)}")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    graft.Caches.releaseAll()
  }

  test("er_metablock joins on block keys only — no pair cartesian") {
    val plan = planOf("er_metablock")
    assert(!plan.contains("CartesianProduct"),
      s"meta-blocking regressed to a pair explosion:\n${plan.take(800)}")
    // the exploded shingle frame persists once for its two consumers
    assert(plan.contains("InMemoryRelation"),
      "the shingle frame must persist, not re-explode per consumer")
    graft.Caches.releaseAll()
  }

  test("metablockOver production frame ends at the WNP filter — no gate-only sort") {
    // The registered er_metablock wrapper owns the hash gate's canonical
    // orderBy; the production frame ScaleProbe measures (and a pairwise
    // matcher consumes) is corpus-linear and must not pay a full-output
    // range-sort Exchange for presentation order.
    val plan = ErQueries
      .metablockOver(Tables.t(spark, dir, "documents"))
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("rangepartitioning"),
      s"gate-only sort leaked back into the production frame:\n${plan.take(800)}")
    graft.Caches.releaseAll()
  }

  test("mm_clipfilter is one pair-key equi join + map-only scoring") {
    val plan = planOf("mm_clipfilter")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    val embScans = "embeddings\\.parquet".r.findAllIn(plan).length
    val docScans = "documents\\.parquet".r.findAllIn(plan).length
    assert(embScans == 1 && docScans == 1,
      s"expected 1 scan per side, got emb=$embScans docs=$docScans")
  }

  test("q130_dsrollup plans one lineitem scan + one Expand + one bounded window") {
    val plan = planOf("q130_dsrollup")
    val scans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"rollup must read the fact once, got $scans scans")
    assert("\\bExpand\\b".r.findFirstIn(plan).isDefined,
      s"ROLLUP must plan Expand (grouping sets), not a union of rescans:\n${plan.take(600)}")
    // the window runs over the dimension-bounded rollup OUTPUT — after
    // the aggregate, never over the fact table
    assert(plan.contains("Window"), plan.take(600))
    assert(!plan.contains("CartesianProduct"), plan.take(600))
  }

  test("q131_dsmultihop decorrelates both EXISTS to semi joins — no fact-fact multiplication") {
    val plan = planOf("q131_dsmultihop")
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as semi joins:\n${plan.take(600)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(600))
    // the orders date window reaches the scan
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"date range not pushed:\n${plan.take(800)}")
    // r12 verdict #2: the 1994-pruned orderkey keyset (a second, slim,
    // date-filtered orders scan) must semi-filter the fact BEFORE the
    // self semi-join — one keyset semi per lineitem reference (a, b,
    // returned) + the self semi + the two final semis = 6, vs 3 in the
    // unpruned plan that self-joined all of lineitem.
    val semis = "LeftSemi".r.findAllIn(plan).length
    assert(semis >= 6,
      s"pruned keyset must feed the fact self-join (>=6 semi joins), got $semis:\n${plan.take(1200)}")
    // 4 orders scans = the final full scan + one slim keyset replica per
    // lineitem reference (the static plan replicates the canonically-equal
    // broadcast subtree; AQE's runtime exchange reuse collapses the three
    // replicas to one broadcast). Each replica must stay SLIM — exactly
    // o_orderkey + the pushed o_orderdate filter column.
    val ordersScans = "orders\\.parquet".r.findAllIn(plan).length
    assert(ordersScans == 4,
      s"expected the final scan + 3 keyset replicas, got $ordersScans")
    val slimKeyset =
      "ReadSchema: struct<o_orderkey:bigint,o_orderdate".r.findAllIn(plan).length
    assert(slimKeyset == 3,
      s"keyset replicas must prune to (o_orderkey, o_orderdate), got $slimKeyset:\n${plan.take(1200)}")
  }

  test("q132_dsfreqbuyer persists the spend CTE once and single-passes the fact") {
    val plan = planOf("q132_dsfreqbuyer")
    // the Q23 reuse: the per-customer spend frame persists (consumed by
    // the max scalar, the best-buyer count scalar, and the keyset)
    assert(plan.contains("InMemoryRelation"),
      s"spend CTE must persist, not rebuild per scalar consumer:\n${plan.take(800)}")
    // Q23's two channel branches collapse to ONE tagged fact pass: the
    // target-year lineitem scans exactly twice (frequent-part keyset +
    // the fact), never once per channel
    val liScans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(liScans == 2, s"expected 2 lineitem scans (keyset + fact), got $liScans")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    // the year filter reaches both lineitem scans
    assert("PushedFilters: \\[[^\\]]*IsNotNull\\(l_shipdate\\)".r.findFirstIn(plan).isDefined ||
      plan.contains("l_shipdate"), plan.take(600))
  }

  test("q133_dsalign3 aligns three channels with two co-partitioned outer joins") {
    val plan = planOf("q133_dsalign3")
    // Declared as two FULL outer joins; the ord-channel anchor filter
    // (ord_rev IS NOT NULL) lets EliminateOuterJoin narrow both to LEFT
    // outer — the optimal plan this lock pins. A regression to Inner
    // would silently drop the null-channel rows the query exists to keep.
    // count tree nodes only (each join also repeats its type in the
    // formatted detail section)
    val outers = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) (LeftOuter|RightOuter|FullOuter)"
      .r.findAllIn(plan).length
    assert(outers == 2,
      s"three channels must align via exactly 2 outer joins, got $outers")
    // the top-100 must plan as TakeOrderedAndProject, never a full sort
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k regressed to a full sort:\n${plan.take(600)}")
    // one lineitem scan per lineitem-derived channel (shipped, returned)
    val liScans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(liScans == 2, s"expected 2 lineitem scans, got $liScans")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(600))
    // the returned channel's flag filter is pushed to its scan
    assert(plan.contains("EqualTo(l_returnflag,R)"),
      s"returnflag filter not pushed:\n${plan.take(800)}")
  }

  test("q134_bandjoin plans the keyless band as explode + equi-join, never nested-loop") {
    val plan = planOf("q134_bandjoin")
    // the whole point of BandJoin: the |L|x|R| shapes must be gone
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"keyless band regressed to a nested loop:\n${plan.take(800)}")
    // the 3-cell replication is one narrow Generate on the right side
    assert(plan.contains("Generate"), s"cell explode missing:\n${plan.take(600)}")
    // and the join is a plain equi-join on the cell
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) Inner".r.findFirstIn(plan).isDefined,
      s"expected an equi join on the cell:\n${plan.take(800)}")
  }

  test("q125_dstimebands fuses all eight bands into one events scan") {
    val plan = planOf("q125_dstimebands")
    // the Q88 point: eight scalar subqueries = ONE fact scan, not eight
    val scans = "events\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 events scan, got $scans")
    assert(!plan.contains("Join"), "band fusion must not join")
    // map-side partial aggregation collapses each partition to one row
    // before the single-row exchange
    assert(plan.contains("partial_sum"), s"bands must pre-aggregate map-side:\n${plan.take(800)}")
  }

  test("ann_multiprobe joins candidates on the bucket code, never a corpus scan") {
    val plan = planOf("ann_multiprobe")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"multi-probe regressed to a corpus scan per query:\n${plan.take(800)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"probe list must broadcast into a hash join on the code:\n${plan.take(800)}")
  }

  test("gr_butterflies wedges via an equi self-join with map-side partial aggregation") {
    val plan = planOf("gr_butterflies")
    assert(!plan.contains("CartesianProduct"),
      s"wedge enumeration must join on the part key:\n${plan.take(600)}")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"wedge counts must pre-aggregate map-side:\n${plan.take(800)}")
  }

  test("q136_dschannelmix aligns channels with one co-partitioned full outer join") {
    val plan = planOf("q136_dschannelmix")
    assert(plan.contains("FullOuter"), s"alignment must be a full outer join:\n${plan.take(600)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(600))
  }

  test("ta_sparsedot bounds the ranking with the top-k aggregate, not a pair-wide window sort") {
    val plan = planOf("ta_sparsedot")
    assert(!plan.contains("CartesianProduct"),
      s"posting join must be an equi join on the term:\n${plan.take(600)}")
    // the bounded TopKByScore udaf, not a Window row_number over all pairs
    assert(plan.contains("TopKByScore") || plan.contains("topkbyscore"),
      s"expected the bounded top-k aggregate:\n${plan.take(800)}")
    // the ONE legitimate window shape is the per-term posting truncation
    // (partitioned/ordered on tok/tf/doc_id): require at least one spec
    // (proves the plan string still prints them — the guard cannot go
    // vacuously green) and require EVERY spec to sort on tf, which any
    // pair-score ranking window (whatever the score column is called)
    // would not
    val specs = "windowspecdefinition\\([^)]*".r.findAllIn(plan).toSeq
    assert(specs.nonEmpty, "no window spec printed — the truncation window vanished")
    assert(specs.forall(sp => sp.contains("tf#") && !sp.contains("dot")),
      s"a window that is not the posting truncation crept in:\n${specs.mkString("\n")}")
  }
}
