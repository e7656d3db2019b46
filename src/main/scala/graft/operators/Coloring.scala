package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Greedy-by-id graph coloring, fixed synchronous rounds — the parallel
  * form of the sequential id-order greedy: a node colors itself the
  * round ALL its smaller-id neighbors are colored, taking the minimum
  * positive color none of them holds (the mex). The wave schedule is
  * exactly [[TopoLayers]]' peel of the id-oriented DAG, so a node's
  * deciding round equals its longest-chain depth, and the computed
  * colors are identical to running the sequential greedy in ascending
  * id order — a deterministic, oracle-replayable function of
  * (graph, rounds). Nodes still blocked after the fixed rounds report a
  * null color; the decided prefix is exact (a node's color is fixed the
  * round its last smaller neighbor resolves).
  *
  * Coloring is the scheduling dual of [[Mis]]: color classes partition
  * the conflict graph into independent sets, so over a near-dup /
  * same-resource graph the color count is the number of conflict-free
  * waves needed to process EVERY node (MIS picks one maximal wave).
  * Greedy-by-id uses at most 1 + max-degree colors, and the mex at
  * round r is at most r (all smaller-neighbor colors are < r).
  *
  * Scale shape: each round is one edge semi-join (blocked set), one
  * edge-keyed color lookup join against the colored frame, and one
  * degree-bounded `collect_set` + mex — O(|E|) shuffle per round, the
  * k-core budget; the per-node set holds DISTINCT smaller-neighbor
  * colors, bounded by in-degree (and by the round index). Input is the
  * ORIENTED edge frame `(u, v)` with u < v. Barrier budget: TWO cut
  * frames per round — the fused per-node state `(id, b)` that the ready
  * set and the next round's undecided set both filter from, and the
  * accumulated colored frame (re-joined every later round).
  */
object Coloring {

  /** Smallest positive integer absent from `cs` (distinct colors). */
  private def mex(cs: org.apache.spark.sql.Column) =
    element_at(
      filter(
        sequence(lit(1), size(cs) + 1),
        k => !array_contains(cs, k)),
      1)

  /** Per-node result: `(id, color)` — the sequential-greedy color, or
    * null if still blocked after `rounds`.
    */
  def run(dag: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    // Edge-layout discipline (r10 verdict #3, the [[Hits]] dual-layout
    // form): the edge frame is STATIC here — every round semi-joins it on
    // `u` (blocked set) and on `v` (ready-edge slice) — so it is persisted
    // once per probe key and never re-exchanged: each round's joins shuffle
    // only the slim node-sized state frames onto the standing layouts.
    val base = dag.select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
    val eU = graft.Caches.track(
      base.repartition(col("u")).persist(StorageLevel.MEMORY_AND_DISK))
    val eV = graft.Caches.track(
      base.repartition(col("v")).persist(StorageLevel.MEMORY_AND_DISK))
    var und = Lineage.cut(
      eU.select(col("u").as("id")).union(eU.select(col("v").as("id"))).distinct())
    var colored: Option[DataFrame] = None
    for (_ <- 1 to rounds) {
      val blockedSet = eU
        .join(und.select(col("id").as("u")), Seq("u"), "left_semi")
        .select(col("v").as("id"))
        .distinct()
        .select(col("id"), lit(true).as("b"))
      val st = Lineage.cut(und.join(blockedSet, Seq("id"), "left"))
      val ready = st.filter(col("b").isNull).select("id")
      val fresh = colored match {
        case None =>
          // Round 1's ready set is the sources — no smaller neighbors.
          ready.select(col("id"), lit(1).cast("int").as("color"))
        case Some(c) =>
          // eV-first: the v-keyed semi slices out just the edges INTO
          // this round's ready nodes on the standing hash(v) layout; only
          // that slim slice then re-keys to `u` for the color lookup.
          val nbrColors = eV
            .join(ready.select(col("id").as("v")), Seq("v"), "left_semi")
            .join(c.select(col("id").as("u"), col("color")), Seq("u"))
            .groupBy(col("v").as("id"))
            .agg(collect_set(col("color")).as("cs"))
          ready
            .join(nbrColors, Seq("id"), "left")
            .select(
              col("id"),
              when(col("cs").isNull, lit(1)).otherwise(mex(col("cs"))).cast("int").as("color"))
      }
      colored = Some(Lineage.cut(colored.map(_.union(fresh)).getOrElse(fresh)))
      und = st.filter(col("b")).select("id")
    }
    val residue = und.select(col("id"), lit(null).cast("int").as("color"))
    colored.map(_.union(residue)).getOrElse(residue)
  }
}
