package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the streaming LSH near-dup ledger — the value-level
  * equality against the batch replay is the DuckDB oracle's job; these
  * lock the SEMANTICS that make the stream deterministic.
  */
class NearDupStreamSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("batch-0 docs are never flagged; partners always precede their doc's batch") {
    val out = StreamingQueries.stNeardup(spark, dir).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(out.nonEmpty)
    // Every doc appears exactly once.
    assert(byId.size == out.length, "per-doc rollup emitted duplicates")
    out.foreach { r =>
      val (id, batch, hits, nd, partner) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4))
      assert(batch == id % 3, s"doc $id carries batch $batch")
      if (batch == 0L) assert(!nd && hits == 0L && partner == -1L, s"batch-0 doc $id flagged")
      if (nd) {
        assert(hits >= 1L && hits <= 4L, s"doc $id n_band_hits=$hits out of range")
        assert(partner >= 0L && partner % 3 < batch, s"doc $id partner $partner not earlier-batch")
      } else assert(partner == -1L && hits == 0L)
    }
    // The sf0.001 corpus contains near-dups across the batch split — the
    // lock must not be vacuous.
    assert(out.exists(_.getBoolean(3)), "no doc flagged: vacuous fixture")
  }

  test("flags agree with the batch band-collision derivation") {
    import spark.implicits._
    val (k, numHashes, bands) = graft.queries.DedupQueries.LshParams
    val docs = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val rows = numHashes / bands
    val banded = graft.operators.Dedup
      .bandRowsMapOnly(docs, "doc_id", "text", k, numHashes, bands)
      .select(col("id"), (col("id") % 3).as("batch"), col("bv"))
    val expected = banded
      .as("a")
      .join(
        banded.select(col("id").as("p_id"), (col("id") % 3).as("p_batch"), col("bv")).as("p"),
        col("a.bv") === col("p.bv") && col("p_batch") < col("a.batch"),
        "left")
      .groupBy(col("a.id"))
      .agg(coalesce(min(col("p_id")), lit(-1L)).as("partner"))
      .as[(Long, Long)]
      .collect()
      .toMap
    val got = StreamingQueries
      .stNeardup(spark, dir)
      .select(col("doc_id"), col("partner"))
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(got == expected, {
      val diff = (got.keySet ++ expected.keySet)
        .filter(k0 => got.get(k0) != expected.get(k0))
        .take(5)
      s"diff at $diff: got ${diff.map(got.get)}, want ${diff.map(expected.get)}"
    })
  }
}
