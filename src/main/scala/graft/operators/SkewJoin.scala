package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for equi-joins on hot keys.
  *
  * AQE's skew-join splitting (on by default in [[graft.GraftSession]])
  * handles most skew at runtime by splitting oversized partitions, but it
  * only applies to sort-merge/shuffled-hash joins and cannot help when one
  * key dominates so heavily that a single key's rows exceed an executor.
  * Salting is the explicit fallback: replicate the build side `salt` ways,
  * scatter the probe side uniformly across the replicas, join on
  * (key, salt), then drop the salt — same rows, `salt`x better balance on
  * the hot key's partitions.
  *
  * Left side gets a uniform random-free deterministic salt derived from a
  * row hash (so results and tests are reproducible); right side explodes
  * to all salt values.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `key`, salted `salt` ways.
    * `leftScatter` must be a deterministic per-row column used to scatter
    * left rows across salt buckets (e.g. a unique id).
    */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftScatter: Column,
      salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val l = left.withColumn("_salt", pmod(xxhash64(leftScatter), lit(salt.toLong)))
    val r = right.withColumn("_salt", explode(array((0 until salt).map(s => lit(s.toLong)): _*)))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
