package graft

/** Builder tooling (not part of the driver contract): decomposes the
  * per-query fixed floor the r15 bench shows (~0.5 s × 320 tail queries).
  * Times, over N reps each: a fresh `spark.read.parquet` (per-call schema
  * inference + file listing), the same read with an explicit schema, a
  * reused analyzed DataFrame, and a representative tail query end-to-end —
  * so the floor's composition (inference job vs listing vs planning vs
  * execution) is measured, not guessed.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.FloorProbe
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    import org.apache.spark.sql.functions._

    def rep(name: String, n: Int)(f: => Unit): Unit = {
      // one untimed warmup rep
      f
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { f; i += 1 }
      val dt = (System.nanoTime() - t0) / 1e6 / n
      println(f"FLOOR $name%-42s ${dt}%9.1f ms/rep  (n=$n)")
    }

    // Session warmup (codegen init etc.)
    spark.range(100000).groupBy((col("id") % 7).as("g")).agg(count(lit(1))).collect()

    val path = s"$sfDir/lineitem.parquet"
    val schema = spark.read.parquet(path).schema

    rep("read.parquet: analysis only", 20) {
      spark.read.parquet(path).schema
      ()
    }
    rep("read.parquet(schema): analysis only", 20) {
      spark.read.schema(schema).parquet(path).schema
      ()
    }
    rep("read.parquet.count", 20) {
      spark.read.parquet(path).count(); ()
    }
    rep("read.parquet(schema).count", 20) {
      spark.read.schema(schema).parquet(path).count(); ()
    }
    val reused = spark.read.schema(schema).parquet(path)
    rep("reused df.count", 20) { reused.count(); () }
    rep("reused df filter+agg.count", 20) {
      reused.filter(col("l_quantity") > 25).groupBy("l_returnflag").agg(sum("l_extendedprice")).count()
      ()
    }
    // A representative tail query end-to-end, as Bench times it.
    Seq("q1_agg", "q2_filter", "q3_join_agg", "ta_entropy", "ds_split").foreach { q =>
      if (SparkEntry.queries.contains(q))
        rep(s"query $q", 10) { SparkEntry.queries(q)(spark, sfDir).count(); Caches.releaseAll() }
    }
    spark.stop()
  }
}
