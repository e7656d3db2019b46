package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy maximal matching by edge id, fixed synchronous rounds — the
  * parallel locally-lightest-edge form of the sequential greedy over
  * edges in ascending `(u, v)` order: each round, a live edge matches
  * when its id is the minimum among live edges at BOTH endpoints, the
  * matched nodes leave, and their remaining edges die. The globally
  * smallest live edge is always a two-sided local minimum, so by
  * induction the rounds commit exactly the sequential greedy's pairs —
  * the result is a deterministic, oracle-replayable function of
  * (graph, rounds). A node whose edges all die without it matching is
  * decided `unmatched` that round; nodes still carrying a live edge
  * after the fixed rounds report `undecided`.
  *
  * Matching is the edge dual of [[Mis]] (it IS an MIS of the line
  * graph): over a near-dup/similarity graph it selects a maximal set of
  * DISJOINT pairs — the pair-up primitive for merge scheduling,
  * contrastive pair mining, or A/B assignment where no record may
  * appear twice.
  *
  * Scale shape: the round walks only the LIVE subgraph (k-core
  * discipline). The per-node lightest-edge table is one union + one
  * min-aggregate over live edges, winners are two slim joins against
  * it, and survivors shrink with the frontier. Barrier budget: three
  * cut frames per round — the winner edges (consumed by the output
  * union AND the survivor anti-joins), the survivor subgraph, and the
  * covered node set (the union+distinct over live edges is itself an
  * O(|live|) shuffle, and two consumers per round — the isolated-node
  * anti-joins and the next round's — would re-pay it per reference).
  */
object Matching {

  /** Per-node result: `(id, status, mate, rnd)` — `matched` with the
    * partner and deciding round, `unmatched` (isolated by neighbors'
    * matches) with the deciding round, or `undecided` after `rounds`.
    * Self-loops are ignored; a node whose ONLY edges are self-loops has
    * no live edge and is absent from the output.
    */
  def run(half: DataFrame, rounds: Int): DataFrame = runBy(half, rounds, weighted = false)

  /** Weighted greedy matching: the same synchronous rounds in ascending
    * `(w, u, v)` order — the sequential-equivalence induction is
    * order-agnostic (the globally least live edge under ANY total order
    * is a two-sided local minimum), so the rounds commit exactly the
    * sequential greedy's pairs under the weight order. Input carries a
    * long `w` column (lower = matched earlier); ties break on the pair
    * id. This is the one-to-one ASSIGNMENT primitive: best-scoring
    * record pairs link first, each record links at most once.
    */
  def runWeighted(half: DataFrame, rounds: Int): DataFrame =
    runBy(half, rounds, weighted = true)

  private def runBy(half: DataFrame, rounds: Int, weighted: Boolean): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val eStruct =
      if (weighted) struct(col("w"), col("u"), col("v")) else struct(col("u"), col("v"))
    val liveCols =
      Seq(col("u").cast("long").as("u"), col("v").cast("long").as("v")) ++
        (if (weighted) Seq(col("w").cast("long").as("w")) else Nil)
    // Edge identity is the PAIR (u, v) compared lexicographically
    // (struct min) — no packed-integer id, so node ids are unbounded
    // (a 100 TB key space exceeds 2^32, where a u*2^32+v pack would
    // overflow the sign bit at u >= 2^31... and alias across edges).
    // Self-loops are dropped (every sibling operator's contract): a loop
    // (u, u) is always u's struct-min edge yet appears only ONCE in the
    // node-min table, so it can never win — left in, it pins u (and
    // transitively u's neighborhood) `undecided` forever.
    // u-clustered PHYSICALLY (the round-10 layout discipline, cut
    // caveat — the checkpoint boundary hides partitioning from the
    // planner, see LineageLayoutSpec, but the rows stay hash(u)-clustered
    // so the per-node union-aggregate's map-side partials compress well
    // on the u orientation): the survivor anti-joins run v-side first,
    // u-side last, so the LAST exchange re-lays the live frame out by u
    // for the next round. The lightest-edge union-aggregate still
    // shuffles (a union has no single layout) — that one is the
    // operator's honest per-round cost.
    var live = Lineage.cut(
      half
        .select(liveCols: _*)
        .filter(col("u") =!= col("v"))
        .repartition(col("u")))
    def covered(l: DataFrame): DataFrame =
      Lineage.cut(
        l.select(col("u").as("id")).union(l.select(col("v").as("id"))).distinct())
    var und = covered(live)
    var decided: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      val mn = live
        .select(col("u").as("n"), eStruct.as("e"))
        .union(live.select(col("v").as("n"), eStruct.as("e")))
        .groupBy("n")
        .agg(min(col("e")).as("m"))
      // An edge wins iff BOTH endpoints elect it as their lightest —
      // i.e. its pair appears twice in the node-min table. The struct
      // carries (u, v), so this is one NODE-sized groupBy + unpack,
      // never a join back against the live edges.
      val winners = Lineage.cut(
        mn.groupBy(col("m"))
          .agg(count(lit(1)).as("c"))
          .filter(col("c") === 2)
          .select(col("m").getField("u").as("u"), col("m").getField("v").as("v")))
      val matchedRows = winners
        .select(col("u").as("id"), col("v").as("mate"))
        .union(winners.select(col("v").as("id"), col("u").as("mate")))
      val nextLive = Lineage.cut(
        live
          .join(matchedRows.select(col("id").as("v")), Seq("v"), "left_anti")
          .join(matchedRows.select(col("id").as("u")), Seq("u"), "left_anti"))
      val stillCovered = covered(nextLive)
      val roundRows = matchedRows
        .select(col("id"), lit("matched").as("status"), col("mate"), lit(r).as("rnd"))
        .union(
          und
            .join(matchedRows.select("id"), Seq("id"), "left_anti")
            .join(stillCovered, Seq("id"), "left_anti")
            .select(
              col("id"),
              lit("unmatched").as("status"),
              lit(null).cast("long").as("mate"),
              lit(r).as("rnd")))
      decided = Some(decided.map(_.union(roundRows)).getOrElse(roundRows))
      live = nextLive
      und = stillCovered
    }
    val residue = und.select(
      col("id"),
      lit("undecided").as("status"),
      lit(null).cast("long").as("mate"),
      lit(null).cast("int").as("rnd"))
    decided.map(_.union(residue)).getOrElse(residue)
  }
}
