package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Locks the chaining audit's CHAINED branch on a synthetic transitive
  * merge — the harness corpus's near-dup groups are cliques, so the
  * oracle-gated run never exercises it.
  */
class ChainingSpec extends SparkSpec {
  import spark.implicits._

  test("a transitive chain is flagged; a clique is not; the weakest link surfaces") {
    // Cluster {1,2,3}: pairs 1-2 and 2-3 qualified, 1-3 never did — a
    // chain. Cluster {10,11}: a complete 2-clique.
    val pairs = Seq(
      (1L, 2L, 0.60),
      (2L, 3L, 0.55),
      (10L, 11L, 0.90)).toDF("a_id", "b_id", "jac")
    val cc = graft.operators.ConnectedComponents.run(pairs, "a_id", "b_id")
    val got = DedupQueries
      .chainingStats(pairs, cc)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getDouble(5)))
      .toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 3L, true, 0.55),
      (10L, 2L, 1L, 1L, false, 0.90)), got.toString)
    graft.Caches.releaseAll()
  }
}
