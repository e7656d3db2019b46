package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of selected queries
  * so scan pruning (ReadSchema/PushedFilters), join strategies, and
  * whole-stage-codegen coverage can be reviewed. Not part of the driver
  * contract — builder tooling.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else
      Seq("q2_filter", "q3_join_agg", "q12_topk", "er_match_blocked", "dd_minhash", "ann_ivf")
    val spark = GraftSession.get()
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
