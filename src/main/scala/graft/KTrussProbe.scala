package graft

/** Scratch phase profiler for the KTruss layout experiment (builder
  * tooling, not driver contract): reproduces gr_ktruss's co-purchase
  * input and times each internal phase of the peel so the old-vs-new
  * A/B can be attributed to a stage, not guessed at.
  */
object KTrussProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.storage.StorageLevel

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"KTPROBE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // Mirrors KTruss.peelStats' support() on the oriented layout.
    def support(g: DataFrame): DataFrame = {
      val adj = g.groupBy("s").agg(sort_array(collect_list(col("t"))).as("nbrs"))
      val triples = g
        .join(broadcast(adj.select(col("s"), col("nbrs").as("nu"))), Seq("s"))
        .join(broadcast(adj.select(col("s").as("t"), col("nbrs").as("nv"))), Seq("t"))
        .select(col("s"), col("t"), explode(array_intersect(col("nu"), col("nv"))).as("c"))
      triples
        .select(explode(array(
          struct(col("s"), col("t")),
          struct(col("s"), col("c").as("t")),
          struct(col("t").as("s"), col("c").as("t"))))
          .as("e"))
        .select(col("e.s").as("s"), col("e.t").as("t"))
        .groupBy("s", "t")
        .agg(count(lit(1)).as("supp"))
    }

    // Mirrors Triangles.orientedAdjacency(partitionBySrc = true).
    def orientPartitioned(e: DataFrame): DataFrame = {
      val deg = e
        .select(col("u").as("x"))
        .union(e.select(col("v").as("x")))
        .groupBy("x")
        .agg(count(lit(1)).as("d"))
      val uFirst = e
        .join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
        .withColumn(
          "u_first",
          col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")))
      uFirst
        .select(
          when(col("u_first"), col("u")).otherwise(col("v")).as("s"),
          when(col("u_first"), col("v")).otherwise(col("u")).as("t"))
        .repartition(col("s"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

    val lp = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val half = lp.alias("a")
      .join(lp.alias("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(s"KTPROBE half_edges rows=${half.count()}")

    val cur0 = time("orient+layout") {
      val c = orientPartitioned(half)
      c.count()
      c
    }
    val supp0 = time("support_r0") {
      val s = support(cur0).persist(StorageLevel.MEMORY_AND_DISK)
      println(s"KTPROBE   supp0 s3=${s.agg(coalesce(sum(col("supp")), lit(0L))).head().getLong(0)}")
      s
    }
    val next1 = time("peel_r1") {
      val p = cur0.join(supp0, Seq("s", "t"), "left")
        .filter(coalesce(col("supp"), lit(0L)) >= 10L)
        .select(col("s"), col("t"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"KTPROBE   next1 rows=${p.count()}")
      p
    }
    val supp1 = time("support_r1") {
      val s = support(next1).persist(StorageLevel.MEMORY_AND_DISK)
      println(s"KTPROBE   supp1 s3=${s.agg(coalesce(sum(col("supp")), lit(0L))).head().getLong(0)}")
      s
    }
    val next2 = time("peel_r2") {
      val p = next1.join(supp1, Seq("s", "t"), "left")
        .filter(coalesce(col("supp"), lit(0L)) >= 10L)
        .select(col("s"), col("t"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"KTPROBE   next2 rows=${p.count()}")
      p
    }
    time("support_r2") {
      val s = support(next2)
      println(s"KTPROBE   supp2 s3=${s.agg(coalesce(sum(col("supp")), lit(0L))).head().getLong(0)}")
    }
    spark.stop()
  }
}
