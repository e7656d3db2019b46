package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.collection.mutable.ListBuffer

/** One banded-signature row arriving for a document: `bandKey` is the
  * serialized LSH bucket (band index + that band's signature rows),
  * `batch` the ingest batch the document arrived in.
  */
case class BandArrival(bandKey: String, docId: Long, batch: Long)

/** The band ledger for one LSH bucket: every (doc, batch) that has landed
  * in it.
  */
case class BandLedgerEntry(docId: Long, batch: Long)
case class BandLedger(entries: List[BandLedgerEntry])

/** Per-(bucket, doc) decision: whether an EARLIER-batch document already
  * occupied this bucket, and the smallest such partner id.
  */
case class BandHit(docId: Long, batch: Long, hit: Boolean, partner: Long)

/** Streaming NEAR-duplicate flagging with `flatMapGroupsWithState`: the
  * LSH band ledger lives in keyed state (key = bucket), and each arriving
  * document's band rows are checked against the bucket's STRICTLY-EARLIER
  * batches — the standard crawl-ingest question "have we already got
  * something like this?", answered incrementally without ever re-pairing
  * the ledger with itself (the streaming twin of
  * [[graft.operators.Dedup.minhashLshAgainstLedger]]).
  *
  * Determinism: a document is compared only against earlier BATCHES
  * (never its own), and same-trigger rows are folded batch-ascending with
  * earlier same-trigger batches visible — so the output is a pure
  * function of (corpus, batch assignment), invariant to how the file
  * source happens to split triggers. State per bucket is the (docId,
  * batch) ledger — the honest cost model of streaming dedup: on a
  * cluster this is the RocksDB state store sized like the dedup ledger
  * itself (|corpus| × bands slim entries), compacted by the state store,
  * with retention/TTL the production knob ([[GroupStateTimeout]] stays
  * NoTimeout here because a dedup ledger, unlike a session, never
  * expires).
  */
object NearDup {

  private def update(
      key: String,
      rows: Iterator[BandArrival],
      state: GroupState[BandLedger]): Iterator[BandHit] = {
    val out = ListBuffer.empty[BandHit]
    val cur = rows.toSeq.sortBy(r => (r.batch, r.docId))
    var seen = state.getOption.map(_.entries).getOrElse(Nil)
    // Fold batch-ascending so earlier batches that landed in the SAME
    // trigger are visible exactly as if they had arrived separately.
    cur.groupBy(_.batch).toSeq.sortBy(_._1).foreach { case (_, batchRows) =>
      batchRows.foreach { r =>
        val earlier = seen.filter(_.batch < r.batch)
        val hit = earlier.nonEmpty
        out += BandHit(r.docId, r.batch, hit, if (hit) earlier.map(_.docId).min else -1L)
      }
      seen = seen ++ batchRows.map(r => BandLedgerEntry(r.docId, r.batch))
    }
    state.update(BandLedger(seen.distinct))
    out.iterator
  }

  /** Per-(bucket, doc) hit rows over a band-arrival stream. */
  def flag(rows: Dataset[BandArrival]): Dataset[BandHit] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(_.bandKey)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
