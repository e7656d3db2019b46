package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Longest-path layering of a DAG, fixed synchronous rounds — the
  * parallel form of topological scheduling depth: round 1 decides the
  * sources (no in-edges), round r decides every node whose in-neighbors
  * are ALL decided. A node decided at round r has at least one
  * in-neighbor decided at exactly r−1 (else it would have decided
  * earlier), so by induction its deciding round EQUALS 1 + the longest
  * directed path into it — `layer` is both the Coffman–Graham level (the
  * earliest step the node could run in a fully parallel schedule) and
  * the longest-chain depth. Nodes still blocked after the fixed rounds
  * report a null layer; the decided prefix is exact regardless (a
  * node's layer is fixed the round its last in-neighbor resolves, so
  * running more rounds only APPENDS layers).
  *
  * Over the id-oriented co-purchase DAG (u < v edges) this measures how
  * deep the sequential dependency chains of the greedy-by-id family run
  * — the same chains [[Mis]]'s round curve probes from the
  * symmetry-breaking side — and bounds the wave count of any
  * smaller-id-first pass over the graph.
  *
  * Scale shape: each round is one edge semi-join against the undecided
  * frame plus one distinct and one join — O(|E|) shuffle per round, the
  * k-core budget. Input is the ORIENTED edge frame `(u, v)` (u → v,
  * acyclic by construction when oriented by id). Barrier budget: ONE
  * cut frame per round — the fused per-node state `(id, b)` (blocked
  * flag) that the ready rows and the next round's undecided set both
  * filter from; re-referencing the undecided set re-reads that
  * materialized leaf, never recomputes the round.
  */
object TopoLayers {

  /** Per-node result: `(id, layer)` — the 1-based longest-path depth,
    * or null if still blocked after `rounds`.
    */
  def run(dag: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val e = graft.Caches.track(
      dag
        .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    var und = Lineage.cut(
      e.select(col("u").as("id")).union(e.select(col("v").as("id"))).distinct())
    var decided: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      // Nodes with an in-edge from a still-undecided node cannot place
      // yet. The left join against the undecided frame restricts the
      // blocked set to undecided nodes.
      val blockedSet = e
        .join(und.select(col("id").as("u")), Seq("u"), "left_semi")
        .select(col("v").as("id"))
        .distinct()
        .select(col("id"), lit(true).as("b"))
      val st = Lineage.cut(und.join(blockedSet, Seq("id"), "left"))
      val ready = st
        .filter(col("b").isNull)
        .select(col("id"), lit(r).cast("int").as("layer"))
      decided = Some(decided.map(_.union(ready)).getOrElse(ready))
      und = st.filter(col("b")).select("id")
    }
    val residue = und.select(col("id"), lit(null).cast("int").as("layer"))
    decided.map(_.union(residue)).getOrElse(residue)
  }
}
