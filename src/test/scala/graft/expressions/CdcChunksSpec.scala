package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private val (w, d) = (8, 64L)

  private def chunksOf(s: String): Seq[(Long, Long, Long)] =
    Seq(s).toDF("text")
      .select(graft.functions.Compat
        .column(CdcChunks(graft.functions.Compat.expression(col("text")), w, d))
        .as("cs"))
      .as[Seq[(Long, Long, Long)]].collect().head

  private def foldHash(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((a, c) =>
      (a * RollingHashMin.B + c) % RollingHashMin.P)

  test("empty and short strings") {
    assert(chunksOf("") === Seq.empty)
    assert(chunksOf("tiny") === Seq((0L, 4L, foldHash("tiny"))))
  }

  test("chunks partition the string and hash their exact content") {
    val rnd = new scala.util.Random(77)
    val s = (1 to 500).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val cs = chunksOf(s)
    assert(cs.head._1 === 0L)
    assert(cs.map(_._2).sum === s.length.toLong)
    cs.sliding(2).foreach {
      case Seq((p1, l1, _), (p2, _, _)) => assert(p1 + l1 === p2)
      case _ => ()
    }
    cs.foreach { case (p, l, h) =>
      assert(h === foldHash(s.substring(p.toInt, (p + l).toInt)))
    }
  }

  test("boundaries follow content: a prefix edit leaves tail chunks intact") {
    val rnd = new scala.util.Random(4242)
    val base = (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val shifted = "INSERTED-PREFIX-" + base
    val a = chunksOf(base).map(_._3)
    val b = chunksOf(shifted).map(_._3)
    // after the first cut point inside the shared content the chunking
    // resynchronizes, so the tails agree chunk-for-chunk
    val shared = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }
    assert(shared.size >= 2, s"expected resynchronized tail, got ${shared.size} shared chunks")
  }
}
