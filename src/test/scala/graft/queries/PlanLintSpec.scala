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
}
