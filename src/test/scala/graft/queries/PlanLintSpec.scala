package graft.queries

import graft.SparkSpec

/** Plan lint over the join-heavy query surface: none of these may ever
  * plan a CartesianProduct or BroadcastNestedLoopJoin — losing an equi key
  * (e.g. a renamed column breaking a join condition) degrades silently to
  * a product at test scale and catastrophically at 100 TB. Queries whose
  * SEMANTICS are a cross join (q6_cross, brute-force similarity baselines,
  * ANN query fan-out) are deliberately not listed.
  */
class PlanLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val equiJoinQueries = Seq(
    "q3_join_agg",
    "q4_semi",
    "q5_anti",
    "q38_lateral",
    "q45_range_join",
    "q46_skew_salted",
    "q48_outer",
    "er_match_full",
    "er_match_blocked",
    "dd_ngram",
    "dd_minhash",
    "dd_simhash",
    "dd_srp",
    "dd_incremental",
    "dd_clusters",
    "ds_leakage",
    "q70_dynamic_pivot",
    "emb_pca",
    "ds_contrastive",
    "gr_adamic")
  // ta_tfidf is deliberately absent: its one-row corpus-size frame rides
  // in as an intentional broadcast nested-loop cross join.

  test("no equi-join query plans a cartesian or nested-loop join") {
    equiJoinQueries.foreach { name =>
      val plan = graft.SparkEntry
        .queries(name)(spark, dir)
        .queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!plan.contains("CartesianProduct"), s"$name plans CartesianProduct")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name plans BroadcastNestedLoopJoin")
    }
  }

  /** Queries whose SEMANTICS are an all-pairs product: the declared exact
    * baselines paired with bucketed scale paths, plus the cross-join demo
    * itself. ONLY these may plan CartesianProduct. Everything else in the
    * registry — present or future — is swept below, so a new query that
    * silently degrades to a product fails this suite, not the 100 TB run.
    */
  private val declaredCross = Set(
    "q6_cross", // the J1 cross-join operator itself
    "dd_embcos", // brute cosine baseline (scale path: dd_semantic)
    "ann_brute", // brute top-k baseline (scale path: ann_ivf/ann_pq)
    "ann_recall") // recall harness — reruns the brute baseline as oracle

  test("no registered query outside the declared baselines plans CartesianProduct") {
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted
      // Streaming queries execute their stream on construction and return
      // a batch read of the sink; their plans are trivial scans. Skip.
      .filterNot(_.startsWith("st_"))
      .filterNot(declaredCross)
      .flatMap { name =>
        val plan = graft.SparkEntry
          .queries(name)(spark, dir)
          .queryExecution
          .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        graft.Caches.releaseAll()
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty, s"undeclared CartesianProduct in: ${offenders.mkString(", ")}")
  }
}
