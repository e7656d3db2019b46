package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Greedy-by-id maximal independent set over an undirected graph, fixed
  * synchronous rounds — the deterministic parallel form of the sequential
  * greedy: each round, every undecided node that is the MINIMUM id in its
  * undecided closed neighborhood joins the set, and its undecided
  * neighbors are excluded. The parallel peel provably computes the SAME
  * set as the sequential id-order greedy (adjacent nodes cannot both be
  * local minima, and a node's fate is fixed the round its smaller
  * neighbors resolve), so the result is a deterministic, oracle-replayable
  * function of (graph, rounds); nodes still unresolved after the fixed
  * rounds report `undecided` — the round curve tells a curation pipeline
  * how deep the sequential dependency chains run.
  *
  * MIS is the standard symmetry-breaking primitive for conflict-free
  * scheduling over a similarity graph: an independent set of the near-dup
  * graph is a maximal set of documents with NO qualifying pair between
  * them — a diversity-maximal cover, the graph-exact counterpart of the
  * MMR heuristic.
  *
  * Scale shape: each round is one edge-keyed min-aggregate plus one
  * edge-keyed semi-join — O(|E|) shuffle per round, the k-core budget.
  * Input is the SYMMETRIC edge frame `(u, v)`. Each round's undecided
  * frame is referenced three times downstream (the min-neighbor
  * aggregate, the exclusion semi-join, the survivor anti-join), so it is
  * materialized behind a [[Lineage.cut]]; the per-round exclusion frame
  * is cut for the same reason (output union + survivor anti-join).
  */
object Mis {

  /** Per-node result: `(id, status, rnd)` — status `in`/`out` with the
    * deciding round, or `undecided` with null round after `rounds`.
    */
  def run(sym: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val e = graft.Caches.track(sym.persist(StorageLevel.MEMORY_AND_DISK))
    var und = Lineage.cut(e.select(col("u").cast("long").as("id")).distinct())
    var decided: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      // Min UNDECIDED neighbor per node (nodes whose neighbors are all
      // decided get no row and win via the null coalesce below).
      val minNbr = e
        .select(col("u").cast("long").as("id"), col("v").cast("long").as("v"))
        .join(und.select(col("id").as("v")), Seq("v"), "left_semi")
        .groupBy("id")
        .agg(min(col("v")).as("mn"))
      val status = Lineage.cut(
        und
          .join(minNbr, Seq("id"), "left")
          .select(col("id"), (col("mn").isNull || col("mn") > col("id")).as("win")))
      val winners = status.filter(col("win")).select("id")
      // Undecided neighbors of this round's winners leave as `out`.
      val out = Lineage.cut(
        e
          .select(col("u").cast("long").as("id"), col("v").cast("long").as("v"))
          .join(winners, Seq("id"), "left_semi")
          .select(col("v").as("id"))
          .distinct()
          .join(und, Seq("id"), "left_semi"))
      val roundRows = winners
        .select(col("id"), lit("in").as("status"), lit(r).as("rnd"))
        .union(out.select(col("id"), lit("out").as("status"), lit(r).as("rnd")))
      decided = Some(decided.map(_.union(roundRows)).getOrElse(roundRows))
      und = Lineage.cut(
        status
          .filter(!col("win"))
          .select("id")
          .join(out, Seq("id"), "left_anti"))
    }
    val residue =
      und.select(col("id"), lit("undecided").as("status"), lit(null).cast("int").as("rnd"))
    decided.map(_.union(residue)).getOrElse(residue)
  }
}
