package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * Sorting a table by the bit-interleave of two filter columns clusters
  * rows that are close in BOTH dimensions into the same files, so a scan
  * filtered on either (or both) columns prunes most files by their
  * min/max footer stats — the data-layout optimization a 100 TB store
  * applies at write time to make selective scans cheap, without
  * maintaining any index. Pure integer bit arithmetic (no UDF, no
  * lambda), identical in Spark and the SQL oracle.
  */
object ZOrder {

  /** Interleave the low 16 bits of `x` (even positions) and `y` (odd
    * positions) into a 32-bit Morton code.
    */
  def interleave16(x: Column, y: Column): Column =
    (0 until 16)
      .map { j =>
        shiftleft(shiftright(x, j).bitwiseAND(lit(1L)), 2 * j)
          .bitwiseOR(shiftleft(shiftright(y, j).bitwiseAND(lit(1L)), 2 * j + 1))
      }
      .reduce(_ bitwiseOR _)

  /** DuckDB expression mirroring [[interleave16]] bit-for-bit. */
  def sqlInterleave16Duck(x: String, y: String): String =
    (0 until 16)
      .map(j => s"((($x >> $j) & 1) << ${2 * j}) | ((($y >> $j) & 1) << ${2 * j + 1})")
      .mkString("(", " | ", ")")

  /** Reference implementation for tests. */
  def interleave16Ref(x: Long, y: Long): Long = {
    var z = 0L
    var j = 0
    while (j < 16) {
      z |= ((x >> j) & 1L) << (2 * j)
      z |= ((y >> j) & 1L) << (2 * j + 1)
      j += 1
    }
    z
  }
}
