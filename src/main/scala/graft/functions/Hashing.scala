package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine-reproducible hashing.
  *
  * Every hash the dedup/fingerprint operators use derives from md5 so the
  * DuckDB oracle can replay it bit-for-bit: Spark's xxhash64/hash and
  * DuckDB's hash() are different algorithms, but md5 is md5 everywhere.
  * The 60-bit integer form takes the first 15 hex chars (4 bits each), so
  * the value always fits a signed 64-bit long without overflow on either
  * engine.
  */
object Hashing {

  /** First 15 hex chars of md5 parsed as a 60-bit non-negative long.
    * Native expression ([[graft.expressions.Md5Long60]]) — digest bytes to
    * long directly; bit-identical to the composable
    * `conv(substring(md5(c), 1, 15), 16, 10)` form ([[md5Long60Hof]]).
    */
  def md5Long60(c: Column): Column =
    Compat.column(graft.expressions.Md5Long60(Compat.expression(c)))

  /** Composable reference form of [[md5Long60]], kept for cross-checking. */
  def md5Long60Hof(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Same, usable inside a higher-order-function lambda (SQL text form). */
  def sqlMd5Long60Spark(e: String): String =
    s"CAST(conv(substring(md5($e), 1, 15), 16, 10) AS BIGINT)"

  /** DuckDB mirror of [[md5Long60]] — hex-digit fold, no hex cast needed. */
  def sqlMd5Long60Duck(e: String): String =
    s"list_reduce(list_transform(range(1, 16), i -> strpos('0123456789abcdef', substr(md5($e), i, 1)) - 1), (a, b) -> a * 16 + b)"
}
