package graft.pipeline

import graft.GraftSession
import graft.metrics.Quality
import graft.output.Writers
import org.apache.spark.sql.SparkSession

/** CLI entry points mirroring BOTH reference orchestrations (SURVEY §3):
  * the monolith (`src/pipeline.py` — everything in one session, no
  * intermediate spills) and the staged flow (`src/pipeline.sh` — each stage
  * parquet-bounded so stages can run as separate submissions).
  *
  * Flags follow the reference's argparse surface: `--year_range N` enables
  * blocked matching with a rolling year window of N (clamped to 9,
  * rejected if <= 0, as at `pipeline.py:466-474`); omitting it runs the
  * exhaustive cross join.
  */
object Main {

  private def arg(args: Array[String], name: String): Option[String] = {
    val i = args.indexOf(s"--$name")
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }

  private def cfg(args: Array[String]): EntityResolution.Config = {
    val yr = arg(args, "year_range").map(_.toInt)
    yr.foreach(n => require(n > 0, s"--year_range must be positive, got $n"))
    EntityResolution.Config(yearBlockSize = yr)
  }

  private def session(): SparkSession = GraftSession.get()

  /** Monolith: parse+clean both dumps, match, cluster, pivot, write the
    * Matched_Entities.csv TSV (`pipeline.py.__main__`).
    *
    * Usage: run graft.pipeline.Main --dblp <path> --acm <path> --dest <dir>
    *        [--year_range N]
    */
  def main(args: Array[String]): Unit = {
    val spark = session()
    val c = cfg(args)
    val dblp = EntityResolution.prepareDataset(spark, arg(args, "dblp").get, c).cache()
    val acm = EntityResolution.prepareDataset(spark, arg(args, "acm").get, c).cache()
    val pairs = EntityResolution.matchPairs(dblp, acm, c).cache()
    val clustered = EntityResolution.resolveEntities(pairs)
    val wide = EntityResolution.emitEntities(clustered, dblp, acm)
    val dest = arg(args, "dest").get
    Writers.writeCsvRenamed(wide, dest)
    Writers.writeParquet(pairs, s"$dest/duplicates", coalesce1 = true)
    println(s"[graft] matched pairs: ${pairs.count()}; output: $dest")
    spark.stop()
  }
}

/** Staged stage 1 (`prepare_data.py`): parse + clean one dump to parquet.
  * Usage: --raw <aminer text> --dest <parquet dir> [--year_range N]
  */
object PrepareData {
  def main(args: Array[String]): Unit = {
    def arg(name: String) = { val i = args.indexOf(s"--$name"); if (i >= 0) Some(args(i + 1)) else None }
    val spark = GraftSession.get()
    val df = EntityResolution.prepareDataset(spark, arg("raw").get)
    Writers.writeParquet(df, arg("dest").get, coalesce1 = true)
    spark.stop()
  }
}

/** Staged stage 2 (`match.py`): read two cleaned parquets, emit candidate
  * duplicates. Usage: --dblp_path <dir> --acm_path <dir> --dest <dir>
  * [--year_range N]
  */
object MatchStage {
  def main(args: Array[String]): Unit = {
    def arg(name: String) = { val i = args.indexOf(s"--$name"); if (i >= 0) Some(args(i + 1)) else None }
    val spark = GraftSession.get()
    val c = EntityResolution.Config(yearBlockSize = arg("year_range").map(_.toInt))
    val dblp = spark.read.parquet(arg("dblp_path").get)
    val acm = spark.read.parquet(arg("acm_path").get)
    Writers.writeParquet(EntityResolution.matchPairs(dblp, acm, c), arg("dest").get, coalesce1 = true)
    spark.stop()
  }
}

/** Staged stage 3 (`create_graph.py`): cluster matched pairs, attach raw
  * text, pivot wide, write the TSV. Usage: --duplicates_path <dir>
  * --raw_dblp <dir> --raw_acm <dir> --dest <dir>
  */
object CreateGraph {
  def main(args: Array[String]): Unit = {
    def arg(name: String) = { val i = args.indexOf(s"--$name"); if (i >= 0) Some(args(i + 1)) else None }
    val spark = GraftSession.get()
    val pairs = spark.read.parquet(arg("duplicates_path").get)
    val dblp = spark.read.parquet(arg("raw_dblp").get)
    val acm = spark.read.parquet(arg("raw_acm").get)
    val wide = EntityResolution.emitEntities(EntityResolution.resolveEntities(pairs), dblp, acm)
    Writers.writeCsvRenamed(wide, arg("dest").get)
    spark.stop()
  }
}

/** Staged stage 4 (`measure_performance.py`): precision/recall/F1 of a
  * blocked run against the exhaustive run. Usage: --block_path <dir>
  * --full_path <dir>. Missing paths exit with a message, mirroring the
  * reference's AnalysisException handling (`measure_performance.py:35-44`).
  */
object MeasurePerformance {

  /** Testable core: Left(message) when either input path is missing
    * (the reference prints and exits 1 at `measure_performance.py:35-44`);
    * Right(summary line) on success. `main` maps Left to exit code 1.
    */
  def run(spark: SparkSession, fullPath: String, blockPath: String): Either[String, String] =
    try {
      val full = spark.read.parquet(fullPath)
      val blocked = spark.read.parquet(blockPath)
      val m = Quality.measure(full, blocked)
      Right(
        s"duplicates=${m.trueDuplicates} blocked=${m.blockedDuplicates} " +
          s"tp=${m.truePositives} fn=${m.falseNegatives} fp=${m.falsePositives} " +
          s"precision=${m.precision} recall=${m.recall} f1=${m.f1}")
    } catch {
      case e: org.apache.spark.sql.AnalysisException =>
        Left(s"[graft] input path missing: ${e.getMessage}")
    }

  def main(args: Array[String]): Unit = {
    def arg(name: String) = { val i = args.indexOf(s"--$name"); if (i >= 0) Some(args(i + 1)) else None }
    val spark = GraftSession.get()
    val res =
      try run(spark, arg("full_path").get, arg("block_path").get)
      finally spark.stop()
    res match {
      case Right(line) => println(line)
      case Left(msg)   => System.err.println(msg); sys.exit(1)
    }
  }
}
