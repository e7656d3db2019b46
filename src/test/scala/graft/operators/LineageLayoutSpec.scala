package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Locks the two partitioning facts the round-10 edge-layout discipline
  * stands on, so a Spark upgrade that changes either fails a test
  * instead of silently shifting plans:
  *
  *  1. A PERSISTED repartitioned frame keeps planner-visible hash
  *     partitioning (InMemoryRelation preserves the child's layout) —
  *     this is what lets Coreness/Louvain/Betweenness/PageRank/textrank
  *     probe one edge layout every round with exchange-free aggregates.
  *  2. A [[Lineage.cut]] checkpoint does NOT keep it: under AQE the
  *     cut's LogicalRDD reports UnknownPartitioning (the coalesced
  *     shuffle read drops the hash property at the boundary). Operators
  *     whose round state crosses a cut (KCore, Mis, Matching) therefore
  *     get only the PHYSICAL clustering benefit (map-side partials
  *     compress on the clustered key), not planner co-partitioning —
  *     their comments say so, and this test keeps the claim true. If a
  *     future Spark version starts preserving it, this test fails and
  *     the per-round plans should be re-audited (they would improve).
  */
class LineageLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def partitioningOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.outputPartitioning.toString

  test("a persisted repartitioned frame keeps planner-visible hash(u)") {
    val df = (1L to 1000L)
      .map(i => (i % 37, i))
      .toDF("u", "v")
      .repartition(col("u"))
      .persist()
    try {
      df.count()
      // The aggregate over the cached frame must plan no exchange ABOVE
      // the cache scan (the cache's own build plan — which contains the
      // repartition exchange — prints inside the tree; only the prefix
      // above InMemoryTableScan is the per-round cost).
      val agg = df.groupBy("u").agg(count(lit(1)).as("c"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString.split("InMemoryTableScan")(0)
      assert(
        !"(?<!Broadcast)Exchange".r.findFirstIn(plan).isDefined,
        s"aggregate re-exchanged a cached hash(u) frame:\n${plan.take(800)}")
    } finally { df.unpersist(); () }
  }

  test("a groupBy on a secondary key atop the persisted layout also plans no exchange") {
    val df = (1L to 1000L)
      .map(i => (i % 37, i % 5, i))
      .toDF("u", "w", "v")
      .repartition(col("u"))
      .persist()
    try {
      df.count()
      val agg = df.groupBy("u", "w").agg(count(lit(1)).as("c"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString.split("InMemoryTableScan")(0)
      assert(
        !"(?<!Broadcast)Exchange".r.findFirstIn(plan).isDefined,
        s"subset-rule aggregate re-exchanged:\n${plan.take(800)}")
    } finally { df.unpersist(); () }
  }

  test("Lineage.cut does NOT carry planner-visible partitioning (the documented caveat)") {
    val cut = Lineage.cut(
      (1L to 1000L).map(i => (i % 37, i)).toDF("u", "v").repartition(col("u")))
    // Under AQE the checkpointed LogicalRDD reports UnknownPartitioning.
    // If this ever starts reporting HashPartitioning(u), the KCore/Mis/
    // Matching round comments (and their explicit layout choices) should
    // be revisited — the planner would then keep co-partitioning across
    // rounds for free.
    assert(
      !partitioningOf(cut).contains("hashpartitioning"),
      s"cut now PRESERVES partitioning (${partitioningOf(cut)}) — " +
        "re-audit the iterative operators' round plans; they can drop work")
  }
}
