package graft

/** Ad-hoc stage profiler (not part of the driver contract): times labelled
  * sub-stages of the bench hotspots so optimization targets facts.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    // warmup: small query to absorb session init
    time("warmup(q1_agg)")(SparkEntry.queries("q1_agg")(spark, sfDir).count())
    time("dd_simhash")(SparkEntry.queries("dd_simhash")(spark, sfDir).count())
    time("dd_simhash(again)")(SparkEntry.queries("dd_simhash")(spark, sfDir).count())
    time("er_match_blocked")(SparkEntry.queries("er_match_blocked")(spark, sfDir).count())
    time("er_entities")(SparkEntry.queries("er_entities")(spark, sfDir).count())
    time("er_entities(again)")(SparkEntry.queries("er_entities")(spark, sfDir).count())
    time("st_hourly")(SparkEntry.queries("st_hourly")(spark, sfDir).count())
    time("dd_ngram")(SparkEntry.queries("dd_ngram")(spark, sfDir).count())
    time("q25_bucketed")(SparkEntry.queries("q25_bucketed")(spark, sfDir).count())
    time("q23_json_roundtrip")(SparkEntry.queries("q23_json_roundtrip")(spark, sfDir).count())
    spark.stop()
  }
}
