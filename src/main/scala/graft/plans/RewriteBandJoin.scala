package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Abs,
  Add,
  Alias,
  Attribute,
  AttributeReference,
  CreateArray,
  EqualTo,
  Explode,
  Expression,
  GreaterThan,
  GreaterThanOrEqual,
  LessThan,
  LessThanOrEqual,
  Literal,
  Pmod,
  Subtract
}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter,
  Generate,
  Join,
  LogicalPlan,
  Project
}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: de-cartesian the PURE band join.
  *
  * A join whose ONLY condition is `abs(l.t - r.t) <= w` has no equi key,
  * so Spark plans BroadcastNestedLoopJoin (small side) or a cartesian
  * product — |L|×|R| comparisons at any scale. [[graft.operators.BandJoin]]
  * rescues callers of the library API with the cell rewrite (bucket the
  * time axis into width-`w` cells, replicate the right side to its cell
  * ± one neighbor, equi-join on the cell, re-check the exact band as a
  * residual); this rule applies the SAME rewrite to the LOGICAL PLAN, so
  * a user-written band join arriving through the SQL frontend or the
  * DataFrame API gets the rescue without knowing the operator exists
  * (r13 verdict #3 / r14 verdict #5).
  *
  * Matched shape — deliberately narrow, the library operator's exact
  * contract: inner join; condition is a single `abs(a − b) ≤ w` (or
  * `< w`, or the mirrored `w ≥ abs(...)`) comparison; `a` and `b` are
  * LongType and resolve one to each side; `w` a positive Long literal
  * (analysis has already promoted/folded an integer literal by the time
  * extended operator-optimization rules run). Each matching pair lands
  * in exactly one of the three replicated cells (the left row's cell),
  * so the rewrite needs no dedup; null times get a null cell, which the
  * equi join drops — exactly the naive semantics. The original
  * comparison is re-applied verbatim as the residual, so `<` vs `<=`
  * and every boundary case are decided by the SAME expression the user
  * wrote. Contract carried over from the operator: |t| must sit at
  * least `w` away from Long overflow (the ±w cell shifts are ANSI
  * arithmetic).
  *
  * After the rewrite the join's condition is a plain cell equality, so
  * the rule cannot re-match its own output (no fixed-point loop), and
  * Catalyst's normal machinery (predicate pushdown folds the residual
  * into the join, ExtractEquiJoinKeys finds the cell key) plans a hash
  * or sort-merge join plus one narrow 3-row Generate — never a BNLJ.
  * BandJoinRuleSpec locks plan shape and bit-equality against the naive
  * form; the ScaleProbe `band_join` row carries the scale evidence for
  * the shared cell design.
  */
object RewriteBandJoin extends Rule[LogicalPlan] {

  /** The band comparison, normalized to (timeA, timeB, width, whole). */
  private def asBand(cond: Expression): Option[(Expression, Expression, Long)] = {
    def abs2(e: Expression): Option[(Expression, Expression)] = e match {
      case Abs(Subtract(a, b, _), _) => Some((a, b))
      case _                         => None
    }
    val parts = cond match {
      case LessThanOrEqual(a, Literal(w: Long, LongType))    => abs2(a).map((_, w))
      case LessThan(a, Literal(w: Long, LongType))           => abs2(a).map((_, w))
      case GreaterThanOrEqual(Literal(w: Long, LongType), a) => abs2(a).map((_, w))
      case GreaterThan(Literal(w: Long, LongType), a)        => abs2(a).map((_, w))
      case _                                                 => None
    }
    parts.collect {
      case ((a, b), w) if w > 0 && a.dataType == LongType && b.dataType == LongType =>
        (a, b, w)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      asBand(cond) match {
        case Some((a, b, w)) =>
          // Resolve which comparison operand belongs to which side; both
          // must be pure single-side expressions (a column, typically).
          val sides =
            if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
              Some((a, b))
            else if (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
              Some((b, a))
            else None
          sides match {
            case Some((lt, rt)) => rewrite(j, left, right, lt, rt, w, cond)
            case None           => j
          }
        case None => j
      }
  }

  /** Floored cell start in exact Long arithmetic (pmod is non-negative,
    * so negative times floor correctly) — bit-identical to
    * [[graft.operators.BandJoin]]'s cellOf.
    */
  private def cellOf(t: Expression, w: Long): Expression =
    Subtract(t, Pmod(t, Literal(w)))

  private def rewrite(
      j: Join,
      left: LogicalPlan,
      right: LogicalPlan,
      lt: Expression,
      rt: Expression,
      w: Long,
      cond: Expression): LogicalPlan = {
    val cellL = Alias(cellOf(lt, w), "__band_cell_l")()
    val leftP = Project(left.output :+ cellL, left)
    val rc = Alias(cellOf(rt, w), "__band_rc")()
    val rightRc = Project(right.output :+ rc, right)
    val arr = CreateArray(Seq(
      Subtract(rc.toAttribute, Literal(w)),
      rc.toAttribute,
      Add(rc.toAttribute, Literal(w))))
    val gen = Explode(arr)
    val cellR: Attribute =
      AttributeReference("__band_cell_r", LongType, gen.elementSchema.head.nullable)()
    val rightG = Generate(gen, Nil, outer = false, None, Seq(cellR), rightRc)
    val rightP = Project(right.output :+ cellR, rightG)
    // The original node's hint (e.g. an explicit broadcast() on either
    // side) carries over — sides keep their roles, only cell columns are
    // added between, so a user-requested strategy survives the rewrite.
    val joined =
      Join(leftP, rightP, Inner, Some(EqualTo(cellL.toAttribute, cellR)), j.hint)
    // The user's own comparison, verbatim, as the exact residual.
    Project(j.output, Filter(cond, joined))
  }
}
