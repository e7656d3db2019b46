package graft

/** Per-stage profiler (builder tooling, not part of the driver contract):
  * runs named queries like [[Profile]] but attributes each run's time to
  * the Spark STAGES it executed — stage wall, executor-cpu sum, shuffle
  * read/write bytes, task count — via a SparkListener, since the session
  * runs with the UI disabled. The r15 optimization rounds need per-stage
  * facts (which exchange, which aggregate) rather than per-query totals.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.Stages <query> [query ...]
  */
object Stages {

  private case class Row(
      id: Int,
      name: String,
      wallMs: Long,
      execMs: Long,
      cpuMs: Long,
      gcMs: Long,
      shufReadMB: Double,
      shufWriteMB: Double,
      spillMB: Double,
      tasks: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val unknown = args.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val spark = GraftSession.get()
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        buf.add(Row(
          si.stageId,
          si.name.linesIterator.next().take(100),
          (for (c <- si.completionTime; s <- si.submissionTime) yield c - s).getOrElse(-1L),
          m.executorRunTime,
          m.executorCpuTime / 1000000,
          m.jvmGCTime,
          m.shuffleReadMetrics.totalBytesRead / 1048576.0,
          m.shuffleWriteMetrics.bytesWritten / 1048576.0,
          m.diskBytesSpilled / 1048576.0,
          si.numTasks))
      }
    })
    def drain(): Seq[Row] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      var r = buf.poll()
      while (r != null) { out += r; r = buf.poll() }
      out.toSeq
    }
    // Untimed warmup, as Profile does.
    SparkEntry.queries("q1_agg")(spark, sfDir).count()
    Thread.sleep(500)
    drain()
    args.foreach { q =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Caches.releaseAll()
      Thread.sleep(500) // let stage-completed events land
      val rows = drain().sortBy(-_.execMs)
      println(f"\nSTAGES $q  total=$dt%.3f s  rows=$n  stages=${rows.size}")
      val wall = rows.map(_.wallMs).filter(_ > 0).sum
      val exec = rows.map(_.execMs).sum
      println(f"  stage-wall-sum=${wall / 1000.0}%.2f s  executor-ms-sum=${exec / 1000.0}%.2f s")
      rows.take(25).foreach { r =>
        println(
          f"  [${r.id}%4d] wall=${r.wallMs}%6d ms exec=${r.execMs}%7d ms cpu=${r.cpuMs}%7d ms gc=${r.gcMs}%6d ms " +
            f"sr=${r.shufReadMB}%8.1f MB sw=${r.shufWriteMB}%8.1f MB spill=${r.spillMB}%6.1f MB " +
            f"tasks=${r.tasks}%4d  ${r.name}")
      }
    }
    spark.stop()
  }
}
