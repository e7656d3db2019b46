package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate Neighbourhood Function via union-mergeable HLL-style
  * register sketches — Palmer et al.'s ANF (KDD 2002) / Boldi–Vigna's
  * HyperBall: every node carries a fixed [[Registers]]-register sketch of
  * the node set within h hops, and one round of "registers ← elementwise
  * max over self + in-neighbors" advances every ball radius by one. The
  * per-round shuffle ships only (node, 16 small ints) rows — never
  * neighborhoods — which is the whole point: exact |ball(h)| by
  * BFS-per-node is node × frontier work, the sketch is edge-proportional
  * per round and answers ALL nodes at once. That trade is how
  * reach-based centralities get estimated on billion-node graphs.
  *
  * Determinism discipline (the hash-gate requirement): the register draw
  * is md5-derived ([[graft.functions.Hashing.md5Long60]] — the ds_split
  * device), bucket = low 4 bits, rank ρ = position of the lowest set bit
  * of the next [[RhoBits]] bits (+0, 1-based; capped at RhoBits+1 when
  * none) — a BOUNDED integer bit probe (array_position over a 24-element
  * bit array), no log2 and no leading-zero intrinsic the oracle could
  * not replay. Merge is elementwise integer MAX — order-free — so every
  * register is bit-identical under any partitioning, and the estimate
  * `α₁₆·16² / Σ 2^(−Mⱼ)` is a fixed 16-term chain written in the same
  * textual order on both engines (each term an exact power-of-two
  * division).
  */
object Anf {

  val Registers = 16
  val RhoBits = 24

  /** (r0..r15) one-hot initial registers for an id column. */
  def initRegisters(node: Column): Seq[Column] = {
    val h = graft.functions.Hashing.md5Long60(concat(lit("anf|"), node.cast("string")))
    val bucket = pmod(h, lit(Registers.toLong))
    val rest = shiftrightunsigned(h, 4)
    val bits = array((0 until RhoBits).map(i => pmod(shiftrightunsigned(rest, i), lit(2L))): _*)
    val pos = array_position(bits, 1L)
    val rho = when(pos === 0L, lit((RhoBits + 1).toLong)).otherwise(pos)
    (0 until Registers).map(j => when(bucket === j, rho).otherwise(lit(0L)).as(s"r$j"))
  }

  private def regCols: Seq[Column] = (0 until Registers).map(j => col(s"r$j"))

  /** ONE sketch round — self ∪ in-neighbor messages, 16-register max,
    * hard Lineage cut — shared by [[run]] and [[runTagged]] so the probe
    * and the shipped queries can never advance different sketches.
    */
  private def advance(cur: DataFrame, e: DataFrame): DataFrame = {
    val self = cur.select(Seq(col("node")) ++ regCols: _*)
    val msgs = cur
      .join(e, col("node") === col("m_src"))
      .select(Seq(col("m_dst").as("node")) ++ regCols: _*)
    Lineage.cut(
      self
        .union(msgs)
        .groupBy("node")
        .agg(
          max(col("r0")).as("r0"),
          (1 until Registers).map(j => max(col(s"r$j")).as(s"r$j")): _*))
  }

  /** `rounds` union-sketch steps over a symmetric `(u, v)` edge frame:
    * returns (node, r0..r15) with each node's registers covering its
    * `rounds`-hop ball. One register-frame-sized join + one 16-max
    * aggregate per round.
    *
    * The round is DELIBERATELY the two-arm "self ∪ messages" form. The
    * r11 advice to fold the self arm into identity edges
    * (`e' = e ∪ {(n, n)}` — one join + one aggregate per round, single
    * predecessor reference) was built and A/B-measured in round 12 and
    * REGRESSED both ways: warm gr_anf 3.39–3.57 s shipped vs 4.15–4.35 s
    * folded (4.69–5.25 s with the folded edge frame additionally cut).
    * The self arm costs nothing but a checkpoint scan feeding the
    * aggregate directly, while identity edges push |nodes| extra rows
    * through the join's build/probe AND re-shuffle the widened edge
    * frame every round — the union-shuffle the fold saves is cheaper
    * than the join it buys. Measurement recorded in PLANS.md (the
    * betweenness-broadcast precedent).
    */
  def run(edges: DataFrame, nodes: DataFrame, idCol: String, rounds: Int): DataFrame = {
    val e = edges.select(col("u").as("m_dst"), col("v").as("m_src"))
    // Each round references its predecessor TWICE (the self arm and the
    // message arm of the union), so the hard per-round cut is mandatory —
    // the k>1-references rule from the KTruss plan-blow-up lesson; lazy
    // rounds re-execute the whole chain once per extra reference.
    val init = Lineage.cut(
      nodes.select(Seq(col(idCol).as("node")) ++ initRegisters(col(idCol)): _*))
    (1 to rounds).foldLeft(init)((cur, _) => advance(cur, e))
  }

  /** All rounds' register frames, tagged: `(h, node, r0..r15)` for
    * h = 0..rounds — ONE sketch advance serving every consumer (the
    * final-round per-node estimates AND the per-round totals), so two
    * queries reading different radii share one memoized frame instead of
    * advancing the sketch twice. Round frames are already Lineage-cut;
    * the tagged union is a narrow projection over them.
    */
  def runTagged(edges: DataFrame, nodes: DataFrame, idCol: String, rounds: Int): DataFrame = {
    val e = edges.select(col("u").as("m_dst"), col("v").as("m_src"))
    def tag(h: Int, df: DataFrame): DataFrame =
      df.select(Seq(lit(h.toLong).as("h"), col("node")) ++ regCols: _*)
    val init = Lineage.cut(
      nodes.select(Seq(col(idCol).as("node")) ++ initRegisters(col(idCol)): _*))
    val (_, tagged) = (1 to rounds).foldLeft((init, Seq(tag(0, init)))) {
      case ((cur, acc), h) =>
        val next = advance(cur, e)
        (next, acc :+ tag(h, next))
    }
    tagged.reduce(_ union _)
  }

  /** The fixed-order HLL estimate over the 16 register columns. */
  def estimate: Column = {
    val denom = (0 until Registers)
      .map(j => expr(s"1.0 / cast(shiftleft(1L, cast(r$j as int)) as double)"))
      .reduce(_ + _)
    lit(0.673) * lit(256.0) / denom
  }

  /** Integer register checksum (order-free exact hash anchor). */
  def regSum: Column = regCols.reduce(_ + _)
}
