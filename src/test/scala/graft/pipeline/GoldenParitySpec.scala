package graft.pipeline

import graft.SparkSpec

/** Data-gated end-to-end parity vs report.pdf §6.1 Table 1: runs only when
  * the real AMiner dumps are present (env `GRAFT_AMINER_DIR`), otherwise
  * the test is canceled — visibly skipped, never spuriously green/red.
  * The sandbox has no egress so the gate is expected to cancel here; on a
  * machine with the dumps this is the strongest correctness statement the
  * library can make: the full pipeline reproduces the reference's
  * published duplicate counts and quality numbers at every window size.
  */
class GoldenParitySpec extends SparkSpec {

  test("blocked replay N=1..5 reproduces Table 1 duplicates and P/R/F1") {
    val dumps = sys.env.get("GRAFT_AMINER_DIR").flatMap(GoldenParity.dumpsIn)
    assume(
      dumps.isDefined,
      "AMiner dumps absent (set GRAFT_AMINER_DIR to a dir with dblp.txt " +
        "and citation-acm-v8.txt)")
    val (dblp, acm) = dumps.get
    val errs = GoldenParity.replay(spark, dblp, acm)
    assert(errs.isEmpty, errs.mkString("; "))
  }
}
