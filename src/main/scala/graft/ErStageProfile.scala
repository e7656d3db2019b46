package graft

import org.apache.spark.sql.functions._

/** Temporary stage-level profiler for the ER scored chain. */
object ErStageProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark
      .range(1000000)
      .groupBy((col("id") % 7).as("g"))
      .agg(count(lit(1)), sum(col("id")))
      .collect()
    sys.env.get("GRAFT_PROFILE_AQE").foreach(v => spark.conf.set("spark.sql.adaptive.enabled", v))
    sys.env.get("GRAFT_PROFILE_WSCG").foreach(v => spark.conf.set("spark.sql.codegen.wholeStage", v))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    time("matchSide") { graft.queries.ErQueries.matchSide(spark, dir).count() }
    time("scored") { graft.queries.ErQueries.scored(spark, dir).count() }
    time("cluster(cc)") { graft.queries.ErQueries.cluster(spark, dir).count() }
    time("entities") { graft.queries.ErQueries.entities(spark, dir).count() }
    spark.stop()
  }
}
