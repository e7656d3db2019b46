package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** In-JVM equivalence lock for the streaming IVF ingest: the registry the
  * 3-micro-batch stream builds must equal the batch fit's own cell
  * census, row for row — the Dataset-level statement behind st_annindex's
  * DuckDB gate (which can only see the final parquet). Also pins that the
  * stream really ran as MULTIPLE micro-batches, so a regression to a
  * single-batch read (which would trivially pass the census check) fails
  * here.
  */
class AnnIndexStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming cell registry equals the batch k-means census; 3 real batches") {
    val streamed = StreamingQueries.stAnnindex(spark, dir).collect()

    val batch = graft.queries.AnnQueries
      .queries("ann_cellstats")(spark, dir)
      .select(col("cid"), col("n_vectors"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val got = streamed.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == batch, s"stream census $got != batch census $batch")

    // id_sum checksum: recompute independently from the batch assignment.
    val centroids = graft.queries.AnnQueries.servingCentroidsLit(spark, dir)
    val expectSums = graft.queries.Tables
      .t(spark, dir, "embeddings")
      .select(
        col("vec_id"),
        graft.operators.KMeans
          .nearest(col("embedding").cast("array<double>"), centroids)
          .as("cid"))
      .groupBy("cid")
      .agg(sum("vec_id").as("id_sum"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val gotSums = streamed.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(gotSums == expectSums)

    // The run must have processed 3 files as separate triggers: the
    // memory sink's progress is gone by now, but the staged source dir
    // must hold exactly the 3 chronological files the query created.
    val stage =
      new java.io.File(graft.queries.SessionMemo.tmpDir(spark, "st_annindex_src"))
    val staged = Option(stage.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.endsWith(".parquet")).sorted
    assert(staged.toSeq == Seq("0_batch.parquet", "1_batch.parquet", "2_batch.parquet"))
  }
}
