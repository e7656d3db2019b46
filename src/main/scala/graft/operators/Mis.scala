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
  * Scale shape: the round walks only the LIVE subgraph — edges whose
  * endpoints are both still undecided (the k-core discipline: a decided
  * node's edges can never influence a later round). The per-round
  * min-neighbor aggregate is then ONE shuffle over the live edges with
  * no semi-join (live u-side IS the undecided set with neighbors), the
  * exclusion pass is one semi-join over the same live frame, and the
  * live frame shrinks with the frontier, so late rounds price with
  * survivors, not the input graph. Barrier budget: three cut frames per
  * round (win-flag, fused `(id, win, o)` state, live survivors) — the
  * undecided set itself is a narrow filter over the state checkpoint,
  * re-read, never recomputed.
  */
object Mis {

  /** Per-node result: `(id, status, rnd)` — status `in`/`out` with the
    * deciding round, or `undecided` with null round after `rounds`.
    */
  def run(sym: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    // u-clustered PHYSICALLY (the round-10 layout discipline, cut
    // caveat): the checkpoint boundary does NOT carry planner-visible
    // partitioning (under AQE the cut's LogicalRDD reports
    // UnknownPartitioning — LineageLayoutSpec locks this), but the RDD's
    // rows stay hash(u)-clustered on disk, so the min-neighbor
    // aggregate's map-side partials compress to ~one row per key per
    // partition; the survivor rebuild keeps the clustering by running
    // the u-side join LAST (its exchange is the one that lays out the
    // next round's frame).
    var live = Lineage.cut(
      sym
        .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
        .repartition(col("u")))
    var und = Lineage.cut(live.select(col("u").as("id")).distinct())
    var decided: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      // Min UNDECIDED neighbor per node: live edges are undecided-to-
      // undecided by construction, so this is a bare aggregate. Undecided
      // nodes whose neighbors are all decided have no live edge, get no
      // row, and win via the null coalesce below.
      val minNbr = live.groupBy(col("u").as("id")).agg(min(col("v")).as("mn"))
      val status = Lineage.cut(
        und
          .join(minNbr, Seq("id"), "left")
          .select(col("id"), (col("mn").isNull || col("mn") > col("id")).as("win")))
      val winners = status.filter(col("win")).select("id")
      // Undecided neighbors of this round's winners leave as `out`.
      // Winners never appear (adjacent nodes cannot both win), so `win`
      // and `o` are mutually exclusive in the fused state.
      val outSet = live
        .join(winners.select(col("id").as("u")), Seq("u"), "left_semi")
        .select(col("v").as("id"))
        .distinct()
        .select(col("id"), lit(true).as("o"))
      val st = Lineage.cut(status.join(outSet, Seq("id"), "left"))
      val roundRows = st
        .filter(col("win") || col("o"))
        .select(
          col("id"),
          when(col("win"), lit("in")).otherwise(lit("out")).as("status"),
          lit(r).as("rnd"))
      decided = Some(decided.map(_.union(roundRows)).getOrElse(roundRows))
      und = st.filter(!col("win") && col("o").isNull).select("id")
      if (r < rounds) {
        // Survivor subgraph: both endpoints still undecided. v-side semi
        // FIRST, u-side LAST (semi joins commute): the last join's
        // exchange leaves the survivor frame physically hash(u)-clustered
        // for the next round's aggregate (see the note above).
        live = Lineage.cut(
          live
            .join(und.select(col("id").as("v")), Seq("v"), "left_semi")
            .join(und.select(col("id").as("u")), Seq("u"), "left_semi"))
      }
    }
    val residue =
      und.select(col("id"), lit("undecided").as("status"), lit(null).cast("int").as("rnd"))
    decided.map(_.union(residue)).getOrElse(residue)
  }
}
