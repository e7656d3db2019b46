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

  test("as-of join equals a driver-side scan on random timelines, both directions") {
    val rnd = new Random(29)
    val probe = Seq.fill(300)((rnd.nextInt(8).toLong, rnd.nextInt(100).toLong, rnd.nextInt(10000).toLong))
      .zipWithIndex
      .map { case ((k, t, _), i) => (k, t, i.toLong) }
    val build = Seq.fill(120)((rnd.nextInt(10).toLong, rnd.nextInt(100).toLong))
      .distinct // unique (key, time) -> deterministic winner
      .map { case (k, t) => (k, t, k * 1000 + t) }
    val p = probe.toDF("k", "t", "pid")
    val b = build.toDF("k", "t", "bv")

    for (backward <- Seq(true, false)) {
      val dir = if (backward) graft.operators.AsOfJoin.Backward else graft.operators.AsOfJoin.Forward
      val got = graft.operators.AsOfJoin
        .asOf(p, b, "k", "t", Seq("bv"), dir)
        .collect()
        .map(r => r.getLong(2) -> (if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .toMap
      probe.foreach { case (k, t, pid) =>
        val want = build
          .filter(e => e._1 == k && (if (backward) e._2 <= t else e._2 >= t))
          .sortBy(e => if (backward) -e._2 else e._2)
          .headOption
          .map(_._3)
        assert(got(pid) == want, s"pid=$pid k=$k t=$t backward=$backward: got ${got(pid)}, want $want")
      }
    }
  }

  test("scd2 versions replay the change log exactly on random logs") {
    val rnd = new Random(31)
    val log = (for {
      k <- 0L until 6L
      t <- 1L to 60L
      if rnd.nextBoolean()
    } yield (k, t, ("s" + rnd.nextInt(3)))).toVector
    val dim = graft.operators.Scd2
      .build(log.toDF("k", "t", "attr"), "k", "t", Seq("attr"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(2),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(6)))
    // driver-side replay: collapse consecutive duplicates
    val want = log
      .groupBy(_._1)
      .flatMap { case (k, rows) =>
        val sorted = rows.sortBy(_._2)
        val changes = sorted.foldLeft(Vector.empty[(Long, String)]) { (acc, r) =>
          if (acc.nonEmpty && acc.last._2 == r._3) acc else acc :+ (r._2 -> r._3)
        }
        changes.zipWithIndex.map { case ((from, attr), i) =>
          val to = changes.lift(i + 1).map(_._1)
          (k, from, attr, to, (i + 1).toLong)
        }
      }
      .toSet
    assert(dim.toSet == want)
  }

  test("snapshot diff inverts: applying the diff to BEFORE reproduces AFTER") {
    val rnd = new Random(37)
    def snap(seed: Int) = {
      val r = new Random(seed)
      (0L until 200L).flatMap { k =>
        if (r.nextInt(10) == 0) None else Some((k, r.nextInt(5).toString, r.nextInt(100).toLong))
      }
    }
    val before = snap(1)
    val after = snap(2)
    val diff = graft.operators.SnapshotDiff
      .diff(before.toDF("k", "s", "v"), after.toDF("k", "s", "v"), Seq("k"), Seq("s", "v"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    val beforeMap = before.map(r => r._1 -> r).toMap
    val afterMap = after.map(r => r._1 -> r).toMap
    // every key in exactly the right class
    (beforeMap.keySet ++ afterMap.keySet).foreach { k =>
      (beforeMap.get(k), afterMap.get(k)) match {
        case (None, Some(_)) => assert(diff.get(k).contains("added"))
        case (Some(_), None) => assert(diff.get(k).contains("removed"))
        case (Some(x), Some(y)) if x != y => assert(diff.get(k).contains("changed"))
        case _ => assert(!diff.contains(k))
      }
    }
  }
}
