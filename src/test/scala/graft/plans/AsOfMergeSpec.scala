package graft.plans

import graft.SparkSpec
import graft.operators.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the custom sort-merge as-of exec ([[AsOfMergeJoinExec]]) equal to
  * the window-composition backend ([[AsOfJoin]]) — the CcEquivalence
  * pattern: two independent formulations, randomized inputs, exact
  * result-set equality. Also asserts the physical plan actually contains
  * the custom exec (the strategy fired) and nothing else joins.
  */
class AsOfMergeSpec extends SparkSpec {
  import spark.implicits._

  private def normalize(df: DataFrame): Seq[(Long, Long, Long, Option[Long], Option[Long])] =
    df.select("k", "t", "pid", "asof_t", "v")
      .collect()
      .toSeq
      .map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))
      }
      .sortBy(x => (x._1, x._2, x._3))

  private def randomFrames(seed: Int, nKeys: Int, nProbe: Int, nBuild: Int): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(seed)
    val probe = (0 until nProbe).map { i =>
      (rnd.nextInt(nKeys).toLong, rnd.nextInt(50).toLong, i.toLong)
    }.toDF("k", "t", "pid")
    // Unique (k, t) per build row — both backends are then fully
    // deterministic without a tiebreak column.
    val build = rnd
      .shuffle((0 until nKeys).flatMap(k => (0 until 50).map(t => (k.toLong, t.toLong))))
      .take(nBuild)
      .map { case (k, t) => (k, t, k * 1000 + t) }
      .toDF("k", "t", "v")
    (probe, build)
  }

  test("merge exec equals the window backend on randomized inputs") {
    for (seed <- 1 to 5) {
      val (probe, build) = randomFrames(seed, nKeys = 7, nProbe = 200, nBuild = 120)
      val viaWindow = AsOfJoin.asOf(probe, build, "k", "t", Seq("v"))
      val viaMerge = AsOfMerge.asOf(probe, build, "k", "t", Seq("v"))
      assert(normalize(viaMerge) == normalize(viaWindow), s"backend divergence at seed=$seed")
    }
  }

  test("plan contains the custom exec and no join or window") {
    val (probe, build) = randomFrames(99, nKeys = 3, nProbe = 20, nBuild = 20)
    val df = AsOfMerge.asOf(probe, build, "k", "t", Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"unexpected join operator:\n${plan.take(800)}")
    assert(!plan.contains("Window"), s"unexpected window:\n${plan.take(800)}")
  }

  test("unmatched probe keys keep nulls; equal timestamps match inclusively") {
    val probe = Seq((1L, 10L, 1L), (2L, 5L, 2L), (3L, 7L, 3L)).toDF("k", "t", "pid")
    val build = Seq((1L, 10L, 111L), (2L, 6L, 222L)).toDF("k", "t", "v")
    val out = normalize(AsOfMerge.asOf(probe, build, "k", "t", Seq("v")))
    assert(out == Seq(
      (1L, 10L, 1L, Some(10L), Some(111L)), // equal time matches (inclusive)
      (2L, 5L, 2L, None, None),             // build row is strictly later
      (3L, 7L, 3L, None, None)))            // key absent from build
  }

  test("tiebreak resolves equal (key, time) build rows to the greatest") {
    val probe = Seq((1L, 10L, 1L)).toDF("k", "t", "pid")
    val build = Seq((1L, 10L, 5L), (1L, 10L, 9L), (1L, 10L, 2L)).toDF("k", "t", "v")
    val viaMerge = normalize(AsOfMerge.asOf(probe, build, "k", "t", Seq("v"), tieBreak = Some("v")))
    assert(viaMerge == Seq((1L, 10L, 1L, Some(10L), Some(9L))))
  }

  test("adversarial pre-partitioning is realigned by EnsureRequirements") {
    val (probe, build) = randomFrames(7, nKeys = 5, nProbe = 150, nBuild = 100)
    // Partition probe by the WRONG column and build into a mismatched
    // partition count: the exec's requiredChildDistribution must force
    // both back into co-clustered hash partitions.
    val p = probe.repartition(5, col("pid"))
    val b = build.repartition(3, col("v"))
    val expected = normalize(AsOfJoin.asOf(probe, build, "k", "t", Seq("v")))
    assert(normalize(AsOfMerge.asOf(p, b, "k", "t", Seq("v"))) == expected)
  }

  test("forward direction equals the window backend on randomized inputs") {
    for (seed <- 11 to 13) {
      val (probe, build) = randomFrames(seed, nKeys = 7, nProbe = 200, nBuild = 120)
      val viaWindow = AsOfJoin.asOf(probe, build, "k", "t", Seq("v"),
        direction = AsOfJoin.Forward)
      val viaMerge = AsOfMerge.asOf(probe, build, "k", "t", Seq("v"), forward = true)
      assert(normalize(viaMerge) == normalize(viaWindow), s"forward divergence at seed=$seed")
    }
  }

  test("tolerance masks the attachment past the bound, matching the window backend") {
    val (probe, build) = randomFrames(21, nKeys = 5, nProbe = 150, nBuild = 80)
    val tol = lit(3L)
    val viaWindow = AsOfJoin.asOf(probe, build, "k", "t", Seq("v"), tolerance = Some(tol))
    val viaMerge = AsOfMerge.asOf(probe, build, "k", "t", Seq("v"), tolerance = Some(tol))
    assert(normalize(viaMerge) == normalize(viaWindow))
    // the mask must actually fire somewhere on this data
    assert(viaMerge.filter(col("asof_t").isNull).count() >
      AsOfMerge.asOf(probe, build, "k", "t", Seq("v"))
        .filter(col("asof_t").isNull).count())
  }

  test("nullable key/time inputs: both backends agree and nulls match nothing") {
    def normNullable(df: DataFrame): Seq[Seq[Option[Long]]] =
      df.select("k", "t", "pid", "asof_t", "v")
        .collect()
        .toSeq
        .map(r => (0 until 5).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))))
        .sortBy(_.map(_.map(_.toString).getOrElse("")).mkString("|"))
    for (seed <- 31 to 33) {
      val rnd = new scala.util.Random(seed)
      def opt(v: Long): Option[Long] = if (rnd.nextInt(8) == 0) None else Some(v)
      val probe = (0 until 150)
        .map(i => (opt(rnd.nextInt(5).toLong), opt(rnd.nextInt(40).toLong), i.toLong))
        .toDF("k", "t", "pid")
      val build = rnd
        .shuffle((0 until 5).flatMap(k => (0 until 40).map(t => (k.toLong, t.toLong))))
        .take(80)
        .map { case (k, t) => (opt(k), opt(t), k * 1000 + t) }
        .toDF("k", "t", "v")
      for (fwd <- Seq(false, true)) {
        val dir = if (fwd) AsOfJoin.Forward else AsOfJoin.Backward
        val viaWindow = AsOfJoin.asOf(probe, build, "k", "t", Seq("v"), direction = dir)
        val viaMerge = AsOfMerge.asOf(probe, build, "k", "t", Seq("v"), forward = fwd)
        val (w, m) = (normNullable(viaWindow), normNullable(viaMerge))
        assert(m == w, s"null-input divergence at seed=$seed forward=$fwd")
        // semantic pin, not just agreement: a null probe key/time never attaches
        m.filter(row => row(0).isEmpty || row(1).isEmpty)
          .foreach(row => assert(row(3).isEmpty && row(4).isEmpty,
            s"null probe key/time attached a build row: $row"))
      }
    }
  }

  test("self-as-of (probe and build from one frame) re-aliases cleanly") {
    val ev = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 5L, 3L)).toDF("k", "t", "pid")
    val probe = ev
    val build = ev.select(col("k"), col("t"), (col("pid") * 100L).as("v"))
    val out = normalize(AsOfMerge.asOf(probe, build, "k", "t", Seq("v")))
    assert(out == Seq(
      (1L, 10L, 1L, Some(10L), Some(100L)),
      (1L, 20L, 2L, Some(20L), Some(200L)),
      (2L, 5L, 3L, Some(5L), Some(300L))))
  }
}
