package graft.pipeline

import graft.SparkSpec
import graft.metrics.Quality
import graft.output.Writers
import java.nio.file.Files

/** The parquet-bounded staged orchestration (`pipeline.sh` shape): each
  * stage writes parquet and the next stage reads it back — verifying the
  * stage contracts survive serialization, exactly what the CLI mains in
  * [[Main]] chain together.
  */
class StagedFlowSpec extends SparkSpec {

  private def rec(title: String, authors: String, year: Int, venue: String, index: String) =
    Seq(s"#*$title", s"#@$authors", s"#t$year", s"#c$venue", s"#index$index").mkString("\n")

  test("staged prepare -> match -> graph -> measure over parquet boundaries") {
    val dir = Files.createTempDirectory("graft-staged").toString
    val dblpRaw = s"$dir/dblp.txt"
    val acmRaw = s"$dir/acm.txt"
    Files.writeString(
      java.nio.file.Paths.get(dblpRaw),
      Seq(
        rec("Implementing Deletion in B+-Trees.", "Jan Jannink", 1995, "SIGMOD Record", "d1"),
        rec("Query Optimization Techniques", "Pat Selinger", 1996, "VLDB Journal", "d3"))
        .mkString("\n\n"))
    Files.writeString(
      java.nio.file.Paths.get(acmRaw),
      Seq(
        rec("Implementing deletion in B+-trees", "Jan Jannink", 1995, "SIGMOD Record", "a1"),
        rec("Query Optimization Techniques", "Pat Selinger", 1996, "VLDB Journal", "a3"))
        .mkString("\n\n"))

    // stage 1: prepare both dumps -> parquet
    Writers.writeParquet(EntityResolution.prepareDataset(spark, dblpRaw), s"$dir/dblp_clean")
    Writers.writeParquet(EntityResolution.prepareDataset(spark, acmRaw), s"$dir/acm_clean")
    val dblp = spark.read.parquet(s"$dir/dblp_clean")
    val acm = spark.read.parquet(s"$dir/acm_clean")

    // stage 2: match (full + blocked) -> parquet
    Writers.writeParquet(EntityResolution.matchPairs(dblp, acm), s"$dir/full")
    Writers.writeParquet(
      EntityResolution.matchPairs(dblp, acm, EntityResolution.Config(yearBlockSize = Some(2))),
      s"$dir/blocked")
    val full = spark.read.parquet(s"$dir/full")
    val blocked = spark.read.parquet(s"$dir/blocked")
    assert(full.count() == 2) // both cross-dataset dups found

    // stage 3: cluster + pivot + TSV
    val wide = EntityResolution.emitEntities(EntityResolution.resolveEntities(full), dblp, acm)
    Writers.writeCsvRenamed(wide, s"$dir/entities")
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/entities/Matched_Entities.csv")))
    assert(wide.columns.toSeq == Seq("acm_first(value)", "dblp_first(value)"))

    // stage 4: quality of blocking vs exhaustive
    val m = Quality.measure(full, blocked)
    assert(m.precision == 1.0 && m.recall == 1.0 && m.truePositives == 2)
  }
}
