package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 closures: the mm_sniff magic-byte offsets exercised against
  * REAL payload bytes (r11 ADVICE — the oracle derives sniffed/ok from
  * the planting residue, so only a spec can catch a prefix-compare that
  * matches the wrong offset), and the shipped Anf rounds pinned against
  * an independent plain-Scala replay — the regression anchor the r12
  * identity-edge-fold A/B was judged against (fold built, measured
  * slower, reverted; PLANS.md round-12 log).
  */
class Round12BatchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("mm_sniff offsets replay from real payload bytes for every row") {
    val docs = Tables.t(spark, dir, "documents")
    // The same mixed construction mmSniff builds internally (even → BMP,
    // odd → WAV, first byte of every 97th payload zeroed), re-derived
    // here so each payload's REAL bytes are in hand.
    val imgs = graft.operators.Multimodal
      .synthesizeImages(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      .toDF()
      .select(col("doc_id"), col("payload"))
    val wavs = graft.operators.Multimodal
      .synthesizeAudio(docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")
      .toDF()
      .select(col("doc_id"), col("payload"))
    val payloads = imgs
      .union(wavs)
      .withColumn(
        "payload",
        when(
          col("doc_id") % 97 === 0,
          concat(lit(Array[Byte](0)), expr("substring(payload, 2)")))
          .otherwise(col("payload")))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload"))
      .toMap
    // Independent Scala replay of the sniff at the documented offsets:
    // 'B''M' at 0–1; 'RIFF' at 0–3 AND 'WAVE' at 8–11.
    def sniffOf(p: Array[Byte]): String =
      if (p.length >= 2 && p(0) == 'B'.toByte && p(1) == 'M'.toByte) "bmp"
      else if (p.length >= 12 &&
        new String(p.slice(0, 4), "US-ASCII") == "RIFF" &&
        new String(p.slice(8, 12), "US-ASCII") == "WAVE") "wav"
      else "unknown"
    val out = SourceQueries
      .mmSniff(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(4)))
    assert(out.length == payloads.size, "sniff output must cover every payload")
    out.foreach { case (id, declared, sniffed, ok) =>
      val fromBytes = sniffOf(payloads(id))
      assert(sniffed == fromBytes,
        s"doc $id: query sniffed '$sniffed' but the real bytes say '$fromBytes'")
      assert(ok == (declared == fromBytes), s"doc $id ok flag")
    }
    // The planting must exercise all three arms: an uncorrupted payload
    // of EACH format sniffing correctly from its real bytes, and a
    // corrupted one routing to unknown.
    assert(out.exists(r => r._2 == "bmp" && r._3 == "bmp"), "no clean BMP sniffed")
    assert(out.exists(r => r._2 == "wav" && r._3 == "wav"), "no clean WAV sniffed")
    assert(out.exists(_._3 == "unknown"), "no corrupted payload routed to unknown")
  }

  test("Anf rounds are bit-identical to a plain two-arm self∪messages replay") {
    // A small asymmetric-degree graph with an isolated pair (5,6), a
    // hub (0), and ONE DIRECTED edge (7→0, no reverse) so the replay is
    // message-direction-sensitive: on a fully symmetric edge set a
    // swapped m_dst/m_src orientation would be invisible (every (u,v)
    // has its mirror), and this lock exists to pin the direction too.
    // 3 rounds of the shipped operator vs an inline replay of the
    // textbook self ∪ messages form.
    val spark2 = spark
    import spark2.implicits._
    val edgePairs =
      Seq((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L), (2L, 4L), (4L, 2L), (5L, 6L), (6L, 5L),
        (7L, 0L))
    val edges = edgePairs.toDF("u", "v")
    val nodes = (0L to 7L).toDF("u")
    val got = graft.operators.Anf
      .run(edges, nodes, "u", 3)
      .orderBy("node")
      .collect()
      .map(r => (0 until 17).map(i => r.getLong(i)))
    // Two-arm replay in plain Scala, seeded from the operator's own
    // public initRegisters expression so the replay diverges only if the
    // ROUND semantics diverge.
    val init = nodes
      .select(Seq(col("u").as("node")) ++ graft.operators.Anf.initRegisters(col("u")): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toVector)
      .toMap
    val adj = edgePairs.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    var regs = init
    (1 to 3).foreach { _ =>
      regs = regs.map { case (n, own) =>
        val in = adj.getOrElse(n, Seq.empty).flatMap(m => regs.get(m))
        n -> (own +: in.toVector).transpose.map(_.max)
      }
    }
    got.foreach { row =>
      val n = row.head
      assert(row.drop(1) == regs(n), s"node $n registers diverge from the two-arm replay")
    }
  }
}
