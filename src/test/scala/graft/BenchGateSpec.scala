package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replays recorded driver-artifact I/O probe triples through the
  * pipeline-bench degradation gate (r11 verdict #1). Each triple is
  * (read1_mbps, read2_mbps, write_mbps) exactly as stamped.
  */
class BenchGateSpec extends AnyFunSuite {

  // BENCH_r11.json, verbatim: host_io_start / pipeline_io_before /
  // pipeline_io_after. The write path was already collapsed when the
  // pipeline section began (45.3 MB/s vs 440.2 at process start) and had
  // recovered by the after probe — the episode the read-only
  // after/before gate provably could not fire on (and did not:
  // pipeline_rerun_fired stamped false while match_blocked read 13.8 s
  // vs the builder's healthy 3.4 s).
  private val r11Start = (1835.407, 3677.731, 440.154)
  private val r11Before = (2916.912, 3489.585, 45.280)
  private val r11After = (2840.134, 4753.163, 347.569)

  test("the r11 write-side entry degradation fires the gate") {
    assert(Bench.pipelineDegraded(r11Start, r11Before, r11After),
      "write 45.3 MB/s at entry vs 440.2 at start must fire the rerun")
  }

  // BENCH_r12.json, verbatim: host_io_start / host_io_end. The warm-rerun
  // phase ran at the end of the round-12 driver run, inside a write-path
  // collapse (149.9 MB/s vs 338.5 at process start — the episode that
  // stamped gr_hits warm 34.0 s against a 7.5 s cold row with no
  // in-artifact marker). Warm rows are now bracketed by chained ioProbe
  // pairs fed through this same gate; replaying the recorded episode as a
  // warm row's bracket (both probes at the end-of-run values) must fire a
  // warm rerun via the at-entry write axis (149.9/338.5 = 0.44).
  private val r12Start = (1770.592, 3906.340, 338.530)
  private val r12End = (3340.202, 4000.297, 149.908)

  test("the r12 end-of-run write collapse fires a warm-row rerun") {
    assert(Bench.pipelineDegraded(r12Start, r12End, r12End),
      "a warm row bracketed at 149.9 MB/s write vs 338.5 at start must rerun")
  }

  test("the r10 read-side during-run degradation fires the gate") {
    // r10 mode: healthy at entry, the read path collapses while the
    // pipeline runs — after.read2 under half of before.read2.
    val start = (1800.0, 3600.0, 430.0)
    val before = (1900.0, 3500.0, 420.0)
    val after = (900.0, 1400.0, 400.0)
    assert(Bench.pipelineDegraded(start, before, after))
  }

  test("write-side during-run degradation fires the gate") {
    val start = (1800.0, 3600.0, 430.0)
    val before = (1900.0, 3500.0, 420.0)
    val after = (1850.0, 3550.0, 150.0)
    assert(Bench.pipelineDegraded(start, before, after))
  }

  test("healthy brackets do not fire") {
    val start = (1835.0, 3677.0, 440.0)
    val before = (2916.0, 3489.0, 410.0)
    val after = (2840.0, 4753.0, 347.0)
    assert(!Bench.pipelineDegraded(start, before, after),
      "ordinary probe noise (here down to 0.79x on write) must not rerun")
  }

  test("compounded sub-threshold drops fire via the after/start axis") {
    // 0.70x at entry, then 0.69x during the run: no pairwise axis is
    // under 0.5, but the section-spanning collapse is 0.48x.
    val start = (1800.0, 3600.0, 440.0)
    val before = (1850.0, 3550.0, 308.0)
    val after = (1820.0, 3500.0, 212.0)
    assert(Bench.pipelineDegraded(start, before, after),
      "write 212 vs 440 MB/s across the section must fire even though " +
        "each pairwise step stays above 0.5")
  }

  test("an errored BEFORE probe does not blind the gate to an after/start collapse") {
    val start = (1800.0, 3600.0, 440.0)
    val errored = (-1.0, -1.0, -1.0)
    val after = (1820.0, 3500.0, 45.0)
    assert(Bench.pipelineDegraded(start, errored, after),
      "with before errored, write 45 vs 440 MB/s must still fire")
    assert(!Bench.pipelineDegraded(start, errored, (1820.0, 3500.0, 400.0)))
  }

  // ---- kept-value semantics (r13 #1 / r14 #4, recurred twice) ----------

  test("the r13 gr_anf episode keeps the FIRST attempt when the rerun is worse") {
    // r13 driver BENCH_FULL.json, verbatim: gr_anf warm first 8.066 s,
    // rerun 14.434 s — the as-built code kept the rerun as the headline
    // queries_warm value.
    val (kept, worse) = Bench.keptWarm(8.066, Some(14.434))
    assert(kept == 8.066 && worse, "min(first, rerun) with rerun_worse stamped")
  }

  test("the r14 ta_sparsedot episode keeps the FIRST attempt when the rerun is worse") {
    // BENCH_r14.json, verbatim: warm first 55.623 s, rerun 57.973 s KEPT.
    val (kept, worse) = Bench.keptWarm(55.623, Some(57.973))
    assert(kept == 55.623 && worse)
  }

  test("a rerun that recovers is kept, unmarked") {
    val (kept, worse) = Bench.keptWarm(34.027, Some(8.113))
    assert(kept == 8.113 && !worse)
    assert(Bench.keptWarm(5.0, None) == ((5.0, false)))
  }

  test("a FAILED first attempt never pins the headline via min()") {
    // A 2 s failure-truncated abort must not beat a healthy 9 s rerun —
    // the kept value is the rerun, with no rerun_worse mark.
    assert(Bench.keptWarm(2.0, Some(9.0), firstOk = false) == ((9.0, false)))
    // failed first with NO rerun stays the stamped value (nothing better exists)
    assert(Bench.keptWarm(2.0, None, firstOk = false) == ((2.0, false)))
  }

  // ---- run-level episode verdict (r14 verdict #3) ----------------------

  test("the r14 artifact's warm-row bracket count fires the run-level verdict") {
    // BENCH_FULL.json of the r14 driver run, verbatim: 10 warm-row
    // brackets fired while host_io start/end wrote 257.8 → 369.3 MB/s —
    // the end-of-run axis alone looks RECOVERED, so only the bracket
    // count can mark this run (which is exactly why it's an axis).
    val ioStart = (1823.355, 3536.914, 257.831)
    val ioEnd = (3699.135, 3847.774, 369.264)
    assert(Bench.episodeDegraded(pipeDegraded = false, warmDegradedRows = 10, ioStart, ioEnd))
    assert(Bench.episodeDegraded(pipeDegraded = true, warmDegradedRows = 0, ioStart, ioStart))
  }

  test("a start probe already inside the collapsed mode fires the verdict") {
    // r11's 45 MB/s entry mode, observed at run START.
    assert(Bench.episodeDegraded(false, 0, (1800.0, 3600.0, 45.3), (1800.0, 3600.0, 440.0)))
  }

  test("a healthy run does not fire the verdict") {
    val healthy = (1800.0, 3900.0, 460.0)
    assert(!Bench.episodeDegraded(false, 2, healthy, (1850.0, 3800.0, 430.0)))
    // errored end probe voids only its axes
    assert(!Bench.episodeDegraded(false, 0, healthy, (-1.0, -1.0, -1.0)))
  }

  // ---- warm-phase entry settling (r13 #4 / r14 #7) ---------------------

  test("the r14 warm-phase entry (118 MB/s vs 258.5 at start) demands settling") {
    assert(!Bench.warmEntrySettled((1616.0, 4247.0, 258.5), (3000.0, 4000.0, 118.0)))
    assert(Bench.warmEntrySettled((1616.0, 4247.0, 258.5), (3000.0, 4000.0, 240.0)))
    // unknown (errored) probes never block the phase
    assert(Bench.warmEntrySettled((-1.0, -1.0, -1.0), (3000.0, 4000.0, 118.0)))
    assert(Bench.warmEntrySettled((1616.0, 4247.0, 258.5), (-1.0, -1.0, -1.0)))
  }

  test("errored probes (-1 sentinels) degrade to axis-unknown, not a rerun") {
    val errored = (-1.0, -1.0, -1.0)
    assert(!Bench.pipelineDegraded(errored, errored, errored))
    // A single failed probe leaves the other axes consulted.
    assert(Bench.pipelineDegraded(errored, (2900.0, 3500.0, 420.0), (2800.0, 1400.0, 400.0)),
      "read2 during-run collapse must still fire when the start probe errored")
    assert(!Bench.pipelineDegraded(errored, (2900.0, 3500.0, 420.0), (2800.0, 3400.0, 400.0)))
  }
}
