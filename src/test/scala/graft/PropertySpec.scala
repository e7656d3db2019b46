package graft

import graft.functions.Cleaning
import graft.operators.{ConnectedComponents, Dedup}
import org.apache.spark.sql.functions._

import scala.collection.mutable
import scala.util.Random

/** Randomized property tests (seeded — deterministic across runs), per the
  * SURVEY §5 test plan: similarity bounds/symmetry, cleaning idempotence,
  * and connected components checked against a driver-side union-find
  * oracle on random graphs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("token jaccard is within [0,1], symmetric, and 1.0 on self") {
    val rnd = new Random(11)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def sentence() = Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" ")
    val rows = Seq.fill(200)((sentence(), sentence()))
    val df = rows.toDF("a", "b")
    def jac(x: String, y: String) =
      size(array_intersect(split(col(x), "\\s+"), split(col(y), "\\s+"))).cast("double") /
        size(array_union(split(col(x), "\\s+"), split(col(y), "\\s+")))
    val out = df.select(jac("a", "b").as("ab"), jac("b", "a").as("ba"), jac("a", "a").as("aa")).collect()
    out.foreach { r =>
      val (ab, ba, aa) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(ab >= 0.0 && ab <= 1.0 && ab == ba && aa == 1.0)
    }
  }

  test("cleanAuthors and cleanRecord are idempotent on noisy strings") {
    val rnd = new Random(13)
    val chars = "abcdefghij ÁÉÍñü ,;:!?()[]{}#@/\\\"'’“”″`-–—0123456789".toCharArray
    def noisy() = Seq.fill(1 + rnd.nextInt(40))(chars(rnd.nextInt(chars.length))).mkString
    val df = Seq.fill(200)(noisy()).toDF("s")
    val out = df
      .select(
        Cleaning.cleanRecord(col("s")).as("r1"),
        Cleaning.cleanRecord(Cleaning.cleanRecord(col("s"))).as("r2"),
        Cleaning.cleanAuthors(col("s")).as("a1"),
        Cleaning.cleanAuthors(Cleaning.cleanAuthors(col("s"))).as("a2"))
      .collect()
    out.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"cleanRecord not idempotent: ${r.getString(0)}")
      assert(r.getString(2) == r.getString(3), s"cleanAuthors not idempotent: ${r.getString(2)}")
    }
  }

  test("cleanTitle is deliberately NOT idempotent (reference quirk)") {
    // The reference filters stopwords BEFORE stripping punctuation
    // (`cleaning.py:86-98`): "[i" is not a stopword, survives pass 1 as
    // "i", and pass 2 then drops it. The port preserves this faithfully.
    val df = Seq("deletion [i trees").toDF("s")
    val r = df
      .select(
        Cleaning.cleanTitle(col("s")).as("once"),
        Cleaning.cleanTitle(Cleaning.cleanTitle(col("s"))).as("twice"))
      .collect()(0)
    assert(r.getString(0) == "deletion i trees")
    assert(r.getString(1) == "deletion trees")
  }

  test("connected components equals union-find oracle on random graphs") {
    val rnd = new Random(17)
    (1 to 3).foreach { trial =>
      val n = 60
      val edges = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find oracle
      val parent = mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
      val expected = edges
        .flatMap { case (a, b) => Seq(a, b) }
        .distinct
        .groupBy(find)
        .values
        .map(_.toSet)
        .toSet

      val got = ConnectedComponents
        .run(edges.toDF("src", "dst"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val gotClusters = got.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
      assert(gotClusters == expected, s"trial $trial component mismatch")
      // min-label determinism: every component is labeled by its min node
      got.groupBy(_._2).foreach { case (comp, members) =>
        assert(members.map(_._1).min == comp)
      }
    }
  }

  test("prefix filter is lossless for jaccard thresholds") {
    val rnd = new Random(19)
    val universe = (0 until 30).map(i => f"tok$i%02d")
    def set() = rnd.shuffle(universe).take(3 + rnd.nextInt(10)).sorted
    val threshold = 0.5
    (1 to 50).foreach { _ =>
      val (a, b) = (set(), set())
      val inter = a.toSet.intersect(b.toSet).size
      val jac = inter.toDouble / a.toSet.union(b.toSet).size
      if (jac >= threshold) {
        def prefix(s: Seq[String]) = s.take(s.size - math.ceil(threshold * s.size).toInt + 1)
        assert(
          prefix(a).toSet.intersect(prefix(b).toSet).nonEmpty,
          s"prefix filter dropped a qualifying pair: $a / $b jac=$jac")
      }
    }
  }
}
