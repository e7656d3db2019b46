package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract locks on the SparkEntry registry itself.
  *
  * The registry is a `++` of nine family maps; `Map ++` silently keeps
  * the LAST binding on a key collision, so a duplicated query name would
  * shadow an implementation without any compile- or run-time signal —
  * the shadowed query's oracle would then grade the wrong code. Same for
  * a `queries`/`oracleSql` drift: a query without an oracle silently
  * downgrades to the driver's weaker rows-only check.
  */
class EntryContractSpec extends AnyFunSuite {

  private val families = Seq(
    "ErQueries" -> (graft.queries.ErQueries.queries, graft.queries.ErQueries.oracles),
    "RelationalQueries" -> (graft.queries.RelationalQueries.queries,
      graft.queries.RelationalQueries.oracles),
    "TextQueries" -> (graft.queries.TextQueries.queries, graft.queries.TextQueries.oracles),
    "DedupQueries" -> (graft.queries.DedupQueries.queries, graft.queries.DedupQueries.oracles),
    "AnnQueries" -> (graft.queries.AnnQueries.queries, graft.queries.AnnQueries.oracles),
    "SourceQueries" -> (graft.queries.SourceQueries.queries,
      graft.queries.SourceQueries.oracles),
    "GraphQueries" -> (graft.queries.GraphQueries.queries, graft.queries.GraphQueries.oracles),
    "StreamingQueries" -> (graft.streaming.StreamingQueries.queries,
      graft.streaming.StreamingQueries.oracles),
    "WebQueries" -> (graft.queries.WebQueries.queries, graft.queries.WebQueries.oracles),
    "CodeQueries" -> (graft.queries.CodeQueries.queries, graft.queries.CodeQueries.oracles))

  test("no query name collides across family maps (++ would silently shadow)") {
    val all = families.flatMap { case (fam, (qs, _)) => qs.keys.map(_ -> fam) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      dups.map { case (k, fs) => s"$k in ${fs.map(_._2).mkString("+")}" }.mkString(", "))
    assert(SparkEntry.queries.size == all.size)
  }

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }

  test("within each family, oracle keys are a subset of that family's query keys") {
    families.foreach { case (fam, (qs, os)) =>
      val stray = os.keySet -- qs.keySet
      assert(stray.isEmpty, s"$fam oracles with no local query: ${stray.mkString(", ")}")
    }
  }
}
