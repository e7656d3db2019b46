package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[AnnQueries.rrfLexicalTopK]] — the max-df-pruned posting-join
  * lexical leg of ann_rrf — against a driver-side brute replay: same
  * tokenization (whitespace, distinct per doc), same prune rule
  * (df · 10 > N drops the token), same overlap counts, same
  * (overlap DESC, id ASC) bounded top-k.
  */
class RrfLexicalSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3

  private def replay(
      docs: Seq[(Long, String)],
      isQuery: Long => Boolean): Map[Long, Seq[(Long, Long)]] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty).toSet
    }.toMap
    val n = docs.size
    val df = toks.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val kept = toks.view.mapValues(_.filter(t => df(t) * 10 <= n)).toMap
    docs
      .collect { case (q, _) if isQuery(q) =>
        val cands = docs
          .collect { case (x, _) if x != q =>
            x -> kept(q).intersect(kept(x)).size.toLong
          }
          .filter(_._2 > 0)
          .sortBy { case (id, ov) => (-ov, id) }
          .take(K)
          .zipWithIndex
          .map { case ((id, _), i) => (id, (i + 1).toLong) }
        q -> cands
      }
      .filter(_._2.nonEmpty)
      .toMap
  }

  test("capped posting join equals the brute replay on a random corpus") {
    val rnd = new scala.util.Random(4111)
    // Vocab with a deliberately HOT head: "the" lands in nearly every doc
    // and must be pruned (df > N/10); the tail tokens carry the overlap.
    val tail = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi",
      "pi", "rho", "sig", "tau", "ups")
    // 96 is EVEN — the query predicate selects it, so the all-hot doc
    // genuinely exercises the pruned-empty-query path (an odd id would
    // be filtered by the predicate and assert nothing about the prune);
    // 98 (empty text) is the no-tokens edge.
    val docs = (0L until 40L).map { id =>
      val words = Seq("the") ++ Seq.fill(4 + rnd.nextInt(5))(tail(rnd.nextInt(tail.size)))
      (id, words.mkString(" "))
    } ++ Seq((98L, ""), (96L, "the the the")) // empty + all-hot docs
    val got = AnnQueries
      .rrfLexicalTopK(docs.toDF("doc_id", "text"), "doc_id", "text", col("id") % 2 === 0, K)
      .as[(Long, Long, Long)]
      .collect()
      .groupBy(_._1)
      .view
      .mapValues(_.sortBy(_._3).map(r => (r._2, r._3)).toSeq)
      .toMap
    val exp = replay(docs, _ % 2 == 0)
    assert(got == exp)
    // the hot token was genuinely pruned: the all-"the" doc IS a query
    // (even id) and must have no candidates — "the" alone never creates
    // an overlap once pruned. If the prune regressed (e.g. the anti-join
    // flipped to semi), this doc would suddenly overlap every other doc.
    assert(!got.contains(96L))
    graft.Caches.releaseAll()
  }

  test("without the hot head, low-df tokens survive and drive candidates") {
    // 12 docs, every token df <= 1 or 2 <= N/10 boundary is respected:
    // the prune keeps df*10 <= N (N=20 here, so df <= 2 survives).
    val docs = (0L until 18L).map(i => (i, s"tok$i shared${i % 2}")) ++
      Seq((90L, "shared0 only"), (91L, "shared1 only"))
    val n = docs.size
    // shared0/shared1 have df = 10 each -> 10*10 > 20 -> pruned; tok_i
    // are unique -> kept but never overlap; "only" has df 2 -> kept.
    val got = AnnQueries
      .rrfLexicalTopK(docs.toDF("doc_id", "text"), "doc_id", "text", col("id") >= 90, K)
      .as[(Long, Long, Long)]
      .collect()
    // the two "only" docs see each other through the kept low-df token
    assert(got.toSet == Set((90L, 91L, 1L), (91L, 90L, 1L)))
    assert(n == 20)
    graft.Caches.releaseAll()
  }
}
