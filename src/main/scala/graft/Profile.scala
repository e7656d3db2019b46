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
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
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
