package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Locks ta_chunk's window arithmetic: every token covered, chunk count
  * exactly 1 + ceil(max(n-W,0)/S), tail chunk reaching the last token —
  * replayed driver-side over lengths that straddle every boundary case.
  */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private val W = 32
  private val S = 24

  test("chunk layout covers every token with the closed-form chunk count") {
    // Lengths around the boundaries: empty, under/at/over one window,
    // exact stride multiples and off-by-one on both sides.
    val lengths = Seq(0, 1, 31, 32, 33, 55, 56, 57, 80, 81, 100, 104, 105)
    val df = lengths.zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(t => s"t$t").mkString(" ")) }
      .toDF("doc_id", "text")

    val n = size(col("tk"))
    val nChunks = when(n <= W, lit(1)).otherwise(floor((n - W + (S - 1)) / S).cast("int") + 1)
    val got = df
      .select(col("doc_id"), graft.functions.TextAnalysis.tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"), explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(
        col("doc_id"),
        col("chunk_id"),
        slice(col("tk"), col("chunk_id") * S + 1, lit(W)).as("chunk"))
      .as[(Long, Int, Seq[String])]
      .collect()
      .groupBy(_._1)

    lengths.zipWithIndex.foreach { case (n, i) =>
      val chunks = got(i.toLong).sortBy(_._2).map(_._3)
      val expectCount = if (n <= W) 1 else (n - W + S - 1) / S + 1
      assert(chunks.length == expectCount, s"len=$n count")
      // Reassembling chunk c's tokens at offset c*S must reproduce 1..n.
      val covered = chunks.zipWithIndex.flatMap { case (c, ci) =>
        c.zipWithIndex.map { case (t, j) => (ci * S + j) -> t }
      }.toMap
      assert(covered.size == n, s"len=$n coverage")
      (0 until n).foreach(j => assert(covered(j) == s"t${j + 1}", s"len=$n pos=$j"))
      // No chunk is empty unless the document itself is.
      if (n > 0) assert(chunks.forall(_.nonEmpty), s"len=$n empties")
    }
  }
}
