package graft

/** Builder tooling (not part of the driver contract): episode-resilient A/B
  * measurement of a RUNTIME SQL conf against named queries. Cold single runs
  * on this host vary ±50% during its recurring I/O-collapse episodes (r13–r15
  * verdicts), so cross-JVM before/after pairs are uninterpretable; this probe
  * alternates the conf value across warm reruns of the same query INSIDE one
  * JVM (pattern A B B A after an untimed warmup run), so both arms share page
  * cache, codegen cache, and whatever episode the host is in.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_AB="key=valueB" \
  *     runMain graft.AbProbe <query> [query ...]
  *
  * Arm A is the session default for `key`; arm B sets `valueB`.
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ab = sys.env.getOrElse("SPARK_GRAFT_AB", "spark.sql.join.preferSortMergeJoin=false")
    val Array(key, valueB) = ab.split("=", 2)
    val unknown = args.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val spark = GraftSession.get()
    val valueA = spark.conf.getOption(key).getOrElse("")
    def run(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Caches.releaseAll()
      dt
    }
    SparkEntry.queries("q1_agg")(spark, sfDir).count() // session warmup
    Caches.releaseAll()
    args.foreach { q =>
      run(q) // untimed warm-in
      val arms = Seq("A" -> valueA, "B" -> valueB, "B" -> valueB, "A" -> valueA)
      val times = arms.map { case (arm, v) =>
        spark.conf.set(key, v)
        arm -> run(q)
      }
      spark.conf.set(key, valueA)
      val a = times.filter(_._1 == "A").map(_._2)
      val b = times.filter(_._1 == "B").map(_._2)
      println(f"AB $q%-20s A=${a.map(t => f"$t%.2f").mkString("/")}  B=${b.map(t => f"$t%.2f").mkString("/")}  " +
        f"minA=${a.min}%.2f minB=${b.min}%.2f  ($key: '${valueA}' vs '${valueB}')")
    }
    spark.stop()
  }
}
