package graft

/** Ad-hoc stage profiler (not part of the driver contract): times labelled
  * bench hotspots cold and warm so optimization targets facts. A labelled
  * warmup query runs (and is printed) first — exclude the
  * `warmup(q1_agg)` row when aggregating PROFILE lines.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.Profile [query ...]
  * With no args, times the historical hotspot set.
  */
object Profile {

  private val DefaultSet = Seq(
    "dd_simhash",
    "dd_simhash",
    "er_match_blocked",
    "er_entities",
    "er_entities",
    "st_hourly",
    "st_join",
    "st_dedup",
    "dd_ngram",
    "dd_minhash",
    "ds_leakage",
    "ann_recall",
    "q25_bucketed",
    "q23_json_roundtrip")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Fail fast on typo'd names BEFORE paying session startup.
    val unknown = args.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(
        s"unknown queries: ${unknown.mkString(", ")}\nvalid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val spark = GraftSession.get()
    // Each row is bracketed by the Bench ioProbe pair (chained: row i's
    // after is row i+1's before) and drains the SessionMemo ledger, so a
    // profiled value carries the same episode-vs-plan and built-vs-reused
    // context a Bench row does (r12 verdict #4: the graph-family cold
    // doubling needed host attribution stamped, not inferred).
    def io(): (Double, Double, Double) =
      try Bench.ioProbe(sfDir) catch { case _: Throwable => (-1.0, -1.0, -1.0) }
    def ioStr(t: (Double, Double, Double)): String =
      f"r=${t._2}%.0f/w=${t._3}%.0f MB/s"
    var probePrev = io()
    def time(name: String)(f: => Long): Unit = {
      graft.queries.SessionMemo.drainAccesses()
      val before = probePrev
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      val accesses = graft.queries.SessionMemo.drainAccesses()
      Caches.releaseAll()
      val after = io()
      probePrev = after
      val (built, reused) = graft.queries.SessionMemo.summarizeAccesses(accesses)
      val attrib =
        (if (built.nonEmpty)
           built.map { case (t, s) => f"$t=$s%.2f" }.mkString(" built={", ",", "}")
         else "") +
          (if (reused.nonEmpty) reused.mkString(" reused=[", ",", "]") else "")
      println(
        f"PROFILE $name%-28s $dt%8.3f s  rows=$n  io[${ioStr(before)} -> ${ioStr(after)}]$attrib")
    }
    time("warmup(q1_agg)")(SparkEntry.queries("q1_agg")(spark, sfDir).count())
    val names = if (args.nonEmpty) args.toSeq else DefaultSet
    val seen = scala.collection.mutable.Map.empty[String, Int]
    names.foreach { q =>
      val k = seen.updateWith(q)(c => Some(c.getOrElse(0) + 1)).get
      val label = if (k > 1) s"$q(run $k)" else q
      time(label)(SparkEntry.queries(q)(spark, sfDir).count())
    }
    spark.stop()
  }
}
