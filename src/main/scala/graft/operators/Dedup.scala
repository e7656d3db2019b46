package graft.operators

import graft.functions.{Hashing, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline.
  *
  * Four families, ordered from exact to fuzzy:
  *   - exact content dedup (hash group-by — one shuffle on the hash);
  *   - n-gram Jaccard pairs (quadratic verify — the correctness baseline);
  *   - MinHash + LSH banding (the scale path: shuffle on band key, candidates
  *     only where a band collides, then verify true Jaccard);
  *   - SimHash with banded Hamming join (pigeonhole over 4 x 8-bit bands
  *     guarantees every pair within Hamming distance 3 collides in >=1 band).
  *
  * All hashes are md5-derived ([[Hashing]]) so the DuckDB oracle reproduces
  * every signature, band key, and verdict bit-for-bit. All operators are
  * pure Column expressions + joins: no UDFs, no driver-side loops.
  */
object Dedup {

  /** Exact dedup: one row per distinct content hash with the kept (min) id
    * and the number of copies. Single hash-shuffle; at 100 TB this is the
    * map-side-combine `groupBy` Spark already does best.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(TextAnalysis.normalized(col(textCol))).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct k-token shingles of the normalized text. */
  def shingleSet(textCol: Column, k: Int): Column =
    TextAnalysis.shingles(TextAnalysis.tokens(TextAnalysis.normalized(textCol)), k)

  /** Jaccard similarity of two pre-computed shingle-set columns. */
  def setJaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** All same-`blockCol` pairs with shingle Jaccard >= threshold. Quadratic
    * within each block — correctness baseline for [[minhashLsh]], not the
    * 100 TB path.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      k: Int,
      threshold: Double): DataFrame = {
    val s = docs.select(
      col(idCol).as("id"),
      col(blockCol).as("block"),
      shingleSet(col(textCol), k).as("sh"))
    val a = s.select(col("id").as("a_id"), col("block"), col("sh").as("a_sh"))
    val b = s.select(col("id").as("b_id"), col("block"), col("sh").as("b_sh"))
    a.join(b, Seq("block"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("jac", setJaccard(col("a_sh"), col("b_sh")))
      .filter(col("jac") >= threshold)
      .select("a_id", "b_id", "jac")
  }

  /** MinHash signature: for each of `numHashes` seeded permutations, the
    * lexicographic min of md5(seed || '|' || shingle). A string-min MinHash:
    * md5's output order is the permutation.
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(sh, s => md5(concat(lit(s"$i|"), s))))
    }: _*)

  /** LSH band keys: md5 over (band index | the band's signature rows). */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1))
      md5(concat_ws("|", lit(b.toString) +: parts: _*))
    }: _*)

  /** MinHash+LSH near-dup pairs: explode band keys, self-join on the key
    * (the only shuffle — keyed by band hash, so it scales horizontally),
    * dedupe candidates, then verify true shingle Jaccard >= threshold.
    * Recall < 1 by LSH design; probability of missing a pair at similarity s
    * is (1 - s^rows)^bands.
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val s = docs.select(
      col(idCol).as("id"),
      shingleSet(col(textCol), k).as("sh"))
    val banded = s
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .withColumn("band", explode(bandKeys(col("sig"), bands, rows)))
      .select("id", "band", "sh")
    val a = banded.select(col("id").as("a_id"), col("band"), col("sh").as("a_sh"))
    val b = banded.select(col("id").as("b_id"), col("band"), col("sh").as("b_sh"))
    a.join(b, Seq("band"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("jac", setJaccard(col("a_sh"), col("b_sh")))
      .filter(col("jac") >= threshold)
      .select("a_id", "b_id", "jac")
  }

  /** 32-bit SimHash over an array of string features (shingles — raw tokens
    * collide too much on small vocabularies): bit j is set when more than
    * half the features have bit j set in their md5-derived hash. Unrolled
    * into 32 static bit tests — stays in whole-stage codegen.
    */
  def simhash32(features: Column): Column = {
    val harr = transform(
      features,
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    val n = size(harr)
    (0 until 32)
      .map { j =>
        val ones = size(filter(harr, h => shiftright(h, j).bitwiseAND(lit(1L)) === lit(1L)))
        when(lit(2) * ones > n, lit(1L << j)).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming (<= 3 for
    * the 4-band pigeonhole to be exact): join on any equal 8-bit band, then
    * verify the full distance. Shuffles on (band index, band value) only.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "4 x 8-bit bands are only exact up to Hamming 3")
    val s = docs.select(col(idCol).as("id"), simhash32(shingleSet(col(textCol), k)).as("sim"))
    val banded = s.withColumn(
      "bv",
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"), shiftright(col("sim"), 8 * b).bitwiseAND(lit(255L)).as("v"))
      }: _*)))
    val a = banded.select(col("id").as("a_id"), col("sim").as("a_sim"), col("bv"))
    val b = banded.select(col("id").as("b_id"), col("sim").as("b_sim"), col("bv"))
    a.join(b, Seq("bv"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", expr("bit_count(a_sim ^ b_sim)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Dot product of two double-array columns as an ordered left fold from
    * 0.0 — the same IEEE operation sequence DuckDB's list_reduce performs,
    * so scores compare bit-for-bit across engines.
    */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dotFold(a, b) / (sqrt(dotFold(a, a)) * sqrt(dotFold(b, b)))

  /** Embedding near-dup pairs: all pairs with cosine >= threshold.
    * Brute-force a < b here (exact baseline); the 100 TB path is the IVF
    * search in [[Ann]] — bucket first, verify within buckets.
    */
  def embeddingCosinePairs(emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val s = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val a = s.select(col("id").as("a_id"), col("v").as("a_v"))
    val b = s.select(col("id").as("b_id"), col("v").as("b_v"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", cosine(col("a_v"), col("b_v")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }
}
