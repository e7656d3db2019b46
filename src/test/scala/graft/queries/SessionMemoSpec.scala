package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins the SessionMemo eviction contract: past MaxEntries the single
  * least-recently-used entry is evicted per insert — NOT a wholesale
  * clear. The r8 behavior (clear-all at capacity) dumped every shared
  * frame once mid-way through a two-dir verify sweep (17 tags x 2 dirs
  * = 34 keys), re-paying the shingle-corpus and ANN-shortlist builds.
  */
class SessionMemoSpec extends SparkSpec {

  private def frame(i: Int): DataFrame = {
    import spark.implicits._
    Seq(i).toDF("x")
  }

  test("overflowing insert evicts exactly the one LRU entry") {
    val dir = s"/memo-spec-${System.nanoTime()}"
    var builds = 0
    def get(i: Int): DataFrame =
      SessionMemo.getOrElseUpdate(s"t$i", spark, dir) { builds += 1; frame(i) }

    val cap = SessionMemo.MaxEntries
    (1 to cap).foreach(get)
    assert(builds == cap)

    // Touch t1 so it is the MOST recently used; t2 becomes the LRU.
    get(1)
    assert(builds == cap, "touching a resident entry must not rebuild it")

    // The (cap+1)-th insert evicts exactly one entry: t2, the LRU.
    get(cap + 1)
    assert(builds == cap + 1)
    val resident = SessionMemo.residentKeys.filter(_._3 == dir).map(_._1).toSet
    assert(resident.size == cap, s"expected $cap resident, got ${resident.size}")
    assert(!resident.contains("t2"), "the LRU entry (t2) must be the victim")
    assert(resident.contains("t1"), "the freshly-touched entry must survive")
    assert(resident.contains(s"t${cap + 1}"))

    // Every survivor is still memoized — no other entry was dropped.
    (3 to cap).foreach(get)
    get(1)
    get(cap + 1)
    assert(builds == cap + 1, "survivors must all still be cached")

    // Only the evicted key rebuilds (and evicts one more LRU in turn).
    get(2)
    assert(builds == cap + 2)
  }

  test("the access ledger records builds vs hits and drains clean") {
    val dir = s"/memo-ledger-${System.nanoTime()}"
    SessionMemo.drainAccesses() // discard other suites' traffic
    SessionMemo.getOrElseUpdate("ledger_a", spark, dir)(frame(1))
    SessionMemo.getOrElseUpdate("ledger_a", spark, dir)(frame(1))
    SessionMemo.getOrElseUpdate("ledger_b", spark, dir)(frame(2))
    val evs = SessionMemo.drainAccesses().filter(_.tag.startsWith("ledger_"))
    // Subsequence containment, not exact equality: the accessLog is
    // process-wide, so a concurrently-running suite may interleave its
    // own records (r12 advice) — this test owns the ledger_ prefix, and
    // what it pins is the order and built-flags of ITS OWN accesses.
    assert(evs.map(e => (e.tag, e.built)).containsSlice(
      Seq(("ledger_a", true), ("ledger_a", false), ("ledger_b", true))),
      s"expected the build/hit/build sequence within ${evs.map(e => (e.tag, e.built))}")
    assert(evs.head.sec >= 0.0)
    // an unpersisted memo frame has no top-level cache entry
    assert(evs(1).bufLoaded.isEmpty)
    assert(SessionMemo.drainAccesses().forall(a => !a.tag.startsWith("ledger_")),
      "drain must clear this test's ledger entries")

    // A persisted-but-lazy memo frame reports unloaded buffers on a hit
    // until an action materializes it — the Bench "materialized" signal.
    SessionMemo.getOrElseUpdate("ledger_p", spark, dir)(frame(3).persist())
    SessionMemo.drainAccesses()
    val lazyHit = SessionMemo.getOrElseUpdate("ledger_p", spark, dir)(frame(3))
    assert(SessionMemo.drainAccesses().exists(a =>
      a.tag == "ledger_p" && !a.built && a.bufLoaded.contains(false)))
    lazyHit.count()
    SessionMemo.getOrElseUpdate("ledger_p", spark, dir)(frame(3))
    assert(SessionMemo.drainAccesses().exists(a =>
      a.tag == "ledger_p" && !a.built && a.bufLoaded.contains(true)))
    lazyHit.unpersist(blocking = false)
    ()
  }

  test("buffersLoadedNow re-checks a lazily-persisted frame after an action") {
    // Bench's post-action materializer re-check (r12 advice): a frame
    // that was unloaded at access time flips to loaded only once some
    // row's action actually executes the cached plan.
    val dir = s"/memo-now-${System.nanoTime()}"
    val f = SessionMemo.getOrElseUpdate("now_p", spark, dir)(frame(4).persist())
    assert(SessionMemo.buffersLoadedNow("now_p", spark, dir).contains(false))
    f.count()
    assert(SessionMemo.buffersLoadedNow("now_p", spark, dir).contains(true))
    // non-resident tag and unpersisted frame both report None
    assert(SessionMemo.buffersLoadedNow("now_absent", spark, dir).isEmpty)
    SessionMemo.getOrElseUpdate("now_u", spark, dir)(frame(5))
    assert(SessionMemo.buffersLoadedNow("now_u", spark, dir).isEmpty)
    f.unpersist(blocking = false)
    ()
  }

  test("nested memo builds record exclusive seconds, not double-counted totals") {
    val dir = s"/memo-nest-${System.nanoTime()}"
    SessionMemo.drainAccesses()
    SessionMemo.getOrElseUpdate("nest_parent", spark, dir) {
      // a parent build invoking a child build (the dd_cc → dd_lsh_pairs
      // shape): the child's seconds must not also be stamped into the
      // parent's, or a row's summed built time could exceed the row
      SessionMemo.getOrElseUpdate("nest_child", spark, dir) {
        Thread.sleep(150)
        frame(1)
      }
      frame(2)
    }
    val evs = SessionMemo.drainAccesses().filter(_.tag.startsWith("nest_"))
    val child = evs.find(_.tag == "nest_child").get
    val parent = evs.find(_.tag == "nest_parent").get
    assert(child.built && parent.built)
    assert(child.sec >= 0.14, s"child slept 150 ms, recorded ${child.sec}")
    // The invariant under test is EXCLUSIVITY: a parent that wrongly
    // included the child's 150 ms would record >= child.sec, so a
    // relative margin distinguishes the failure mode; an absolute bound
    // (the pre-r13 0.1 s) flaked whenever a GC/JIT pause landed inside
    // the parent's two cheap frame constructions (r12 advice).
    assert(parent.sec < child.sec * 0.9,
      s"parent exclusive ${parent.sec} must not contain the child's ${child.sec}")
  }
}
