package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The r15 reduce fast path (reject a candidate that orders strictly after
  * a full buffer's worst entry without re-sorting) must be invisible:
  * streaming any input order through reduce, in any partition split merged
  * after, equals the brute-force (score desc, id asc) top-k.
  */
class TopKByScoreSpec extends AnyFunSuite {

  private def brute(xs: Seq[ScoredId], k: Int): TopKBuf = {
    val s = xs.sortBy(x => (-x.score, x.id)).take(k)
    TopKBuf(s.map(_.score), s.map(_.id))
  }

  private def stream(agg: TopKByScore, xs: Seq[ScoredId]): TopKBuf =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("reduce matches brute force on every prefix and input order") {
    val agg = new TopKByScore(3)
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(200)(ScoredId(rnd.nextInt(20).toDouble, rnd.nextInt(50).toLong))
    // Ascending, descending, and shuffled orders all hit both the reject
    // fast path (full buffer, strictly-worse candidate) and the insert path.
    for (order <- Seq(xs, xs.sortBy(_.score), xs.sortBy(-_.score), rnd.shuffle(xs)))
      for (n <- Seq(1, 2, 3, 4, 50, 200))
        assert(stream(agg, order.take(n)) == brute(order.take(n), 3))
  }

  test("reject fast path keeps score ties ordered by lower id") {
    val agg = new TopKByScore(2)
    // Buffer full with (5.0, 1), (5.0, 2); a tied score with HIGHER id is
    // rejected, a tied score with LOWER id displaces the worst.
    val b = stream(agg, Seq(ScoredId(5.0, 1L), ScoredId(5.0, 2L)))
    assert(agg.reduce(b, ScoredId(5.0, 9L)) == b)
    assert(agg.reduce(b, ScoredId(5.0, 0L)) == TopKBuf(Seq(5.0, 5.0), Seq(0L, 1L)))
    // Strictly worse score: rejected; strictly better: inserted at front.
    assert(agg.reduce(b, ScoredId(4.9, 0L)) == b)
    assert(agg.reduce(b, ScoredId(6.0, 7L)) == TopKBuf(Seq(6.0, 5.0), Seq(7L, 1L)))
  }

  test("merge of partial buffers equals brute force over the union") {
    val agg = new TopKByScore(4)
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(100)(ScoredId(rnd.nextDouble(), rnd.nextInt(40).toLong))
    val (l, r) = xs.splitAt(37)
    assert(agg.merge(stream(agg, l), stream(agg, r)) == brute(xs, 4))
  }
}
