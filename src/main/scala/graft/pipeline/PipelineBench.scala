package graft.pipeline

import graft.GraftSession
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** End-to-end ER pipeline throughput at the reference's published scale.
  *
  * The reference (report.pdf §6.2: Apple M2 Pro 10 cores) matches ~2.6k
  * records per side (~40M-pair unblocked space) in 56 s and runs the full
  * monolith in ~52 s. This bench renders TWO AMiner-format datasets from
  * the harness documents table (sf0.1: 5,000 records per side, ~25M
  * venue-gated pair space) such that every record has a true near-match on
  * the other side (one title token dropped — Jaccard 0.9, same authors),
  * then times parse -> clean -> match (full and blocked N=2) -> cluster ->
  * emit. Prints one JSON line.
  *
  * Usage: runMain graft.pipeline.PipelineBench [sfDir]
  */
object PipelineBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // Default side size 2600 = the reference's dataset scale (report.pdf §3).
    val perSide = args.lift(1).map(_.toInt).getOrElse(2600)
    val spark = GraftSession.get()
    println(s"""{"pipeline_bench":${runJson(spark, sfDir, perSide)}}""")
    spark.stop()
  }

  /** Runs the reference-scale pipeline and returns the stage timings as a
    * JSON object string — called by [[main]] and embedded in
    * [[graft.Bench]]'s output so the per-round bench artifact carries the
    * direct BASELINE.md comparison.
    */
  def runJson(
      spark: org.apache.spark.sql.SparkSession,
      sfDir: String,
      perSide: Int): String = {
    import spark.implicits._

    // Render both sides from the documents table. Venue alternates between
    // the two filtered venues; years roll through the filter window so the
    // rolling-year blocking has real work to do.
    val docs = Tables
      .t(spark, sfDir, "documents")
      .filter(col("doc_id") < perSide)
      .select(
        col("doc_id"),
        split(col("text"), "\\s+").as("toks"),
        (col("doc_id") % 2).as("venue_pick"),
        (lit(1995) + col("doc_id") % 10).as("year"))
      .withColumn("venue",
        when(col("venue_pick") === 0, "SIGMOD Record").otherwise("VLDB Journal"))
      .withColumn("title_a", concat_ws(" ", slice(col("toks"), 1, 10)))
      // drop one mid-title token on the B side: Jaccard 9/10 >= 0.6
      .withColumn(
        "title_b",
        concat_ws(" ", concat(slice(col("toks"), 1, 4), slice(col("toks"), 6, 5))))
      .withColumn("authors", concat(lit("Alex Writer, Sam Scribe"), lit("")))
      .cache()

    def render(titleCol: String, tag: String) =
      docs
        .select(
          concat(
            lit("#*"), col(titleCol), lit("\n"),
            lit("#@"), col("authors"), lit("\n"),
            lit("#t"), col("year").cast("string"), lit("\n"),
            lit("#c"), col("venue"), lit("\n"),
            lit("#index"), lit(tag), col("doc_id").cast("string")).as("value"))
        .as[String]
        .collect()
        .mkString("\n\n")

    val dir = java.nio.file.Files.createTempDirectory("graft-pbench")
    val dblpPath = dir.resolve("dblp.txt")
    val acmPath = dir.resolve("acm.txt")
    java.nio.file.Files.writeString(dblpPath, render("title_a", "d"))
    java.nio.file.Files.writeString(acmPath, render("title_b", "a"))

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val caches = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    caches += docs
    try {
      val (prepared, tPrep) = timed {
        val d = EntityResolution.prepareDataset(spark, dblpPath.toString).cache()
        val a = EntityResolution.prepareDataset(spark, acmPath.toString).cache()
        caches += d
        caches += a
        (d.count(), a.count(), d, a)
      }
      val (dblp, acm) = (prepared._3, prepared._4)

      val (nFull, tFull) = timed {
        EntityResolution.matchPairs(dblp, acm).count()
      }
      val cfgB = EntityResolution.Config(yearBlockSize = Some(2))
      val (nBlocked, tBlocked) = timed {
        EntityResolution.matchPairs(dblp, acm, cfgB).count()
      }
      val (nEntities, tCluster) = timed {
        val pairs = EntityResolution.matchPairs(dblp, acm, cfgB).cache()
        caches += pairs
        val wide = EntityResolution.emitEntities(EntityResolution.resolveEntities(pairs), dblp, acm)
        wide.count()
      }

      s"""{"records_per_side":${prepared._1},"full_pairs":$nFull,""" +
        s""""blocked_pairs":$nBlocked,"entities":$nEntities,""" +
        s""""prepare_sec":$tPrep,"match_full_sec":$tFull,""" +
        s""""match_blocked_sec":$tBlocked,"cluster_emit_sec":$tCluster,""" +
        s""""reference_sec":{"match_full":56,"match_blocked_n2":16,"monolith_total":52}}"""
    } finally {
      // Release session caches and the rendered temp datasets whether the
      // run succeeded or died mid-stage.
      caches.foreach(df => scala.util.Try(df.unpersist(blocking = false)))
      Seq(dblpPath, acmPath).foreach(p => scala.util.Try(java.nio.file.Files.deleteIfExists(p)))
      scala.util.Try(java.nio.file.Files.deleteIfExists(dir))
      ()
    }
  }
}
