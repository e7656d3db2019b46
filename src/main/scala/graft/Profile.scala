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
    locally {
      import org.apache.spark.sql.functions._
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val base = docs.select(
        col("doc_id").as("id"),
        col("lang"),
        floor(col("n_chars") / 50).as("bucket"),
        array_distinct(split(col("text"), "\\s+")).as("toks"),
        substring(col("text"), 1, 24).as("prefix"))
      time("er.base")(base.count())
      val exploded = base.select(col("id"), explode(col("toks")).as("tok"))
      val tokFreq = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
      time("er.tokFreq")(tokFreq.count())
      val ranked = exploded
        .join(tokFreq, Seq("tok"))
        .groupBy("id")
        .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ft"))
        .select(col("id"), transform(col("ft"), f => f.getField("tok")).as("ftoks"))
      time("er.ranked")(ranked.count())
      time("er.matchSide.join")(base.join(ranked, Seq("id")).count())
    }
    time("dd_simhash")(SparkEntry.queries("dd_simhash")(spark, sfDir).count())
    time("dd_simhash(again)")(SparkEntry.queries("dd_simhash")(spark, sfDir).count())
    time("er_match_blocked")(SparkEntry.queries("er_match_blocked")(spark, sfDir).count())
    time("er_entities")(SparkEntry.queries("er_entities")(spark, sfDir).count())
    time("er_entities(again)")(SparkEntry.queries("er_entities")(spark, sfDir).count())
    time("st_hourly")(SparkEntry.queries("st_hourly")(spark, sfDir).count())
    time("st_join")(SparkEntry.queries("st_join")(spark, sfDir).count())
    time("st_dedup")(SparkEntry.queries("st_dedup")(spark, sfDir).count())
    time("dd_ngram")(SparkEntry.queries("dd_ngram")(spark, sfDir).count())
    time("q25_bucketed")(SparkEntry.queries("q25_bucketed")(spark, sfDir).count())
    time("q23_json_roundtrip")(SparkEntry.queries("q23_json_roundtrip")(spark, sfDir).count())
    spark.stop()
  }
}
