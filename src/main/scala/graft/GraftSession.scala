package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-aware defaults.
  *
  * Local testing runs `local[N]`, but every setting here is chosen so the same
  * code is correct on a large multi-executor cluster: AQE on (runtime shuffle
  * coalescing + skew-join splitting), shuffle partitions sized to the local
  * core count rather than the 200 default, UTC session time zone for
  * cross-engine (DuckDB oracle) parity.
  */
object GraftSession {

  /** Number of local cores: the env override, else EVERY available core.
    * The old default of 4 silently ran any session launched without
    * SPARK_GRAFT_CPUS at local[4] — compute-bound stages (the ER match
    * kernels) measured 4-5x slow while stage-latency-bound queries barely
    * moved, which masqueraded as "host degradation" in the round-4/5
    * bench archaeology until a thread-dump showed exactly 4 executor
    * threads inside levenshteinDistance.
    */
  def cpus: Int =
    sys.env
      .get("SPARK_GRAFT_CPUS")
      .map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  /** Stable within one JVM, unique across JVMs. */
  private val processTag: String =
    s"${java.lang.ProcessHandle.current().pid()}"

  def builder(master: String = s"local[$cpus]", shufflePartitions: Int = cpus): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      // Engine extensions: optimizer rules + SQL-callable registrations of
      // graft's native expressions (spark.sql("... graft_dot(a, b) ...")).
      .withExtensions { e =>
        e.injectOptimizerRule(_ => graft.expressions.RewriteDotFold)
        e.injectOptimizerRule(_ => graft.plans.RewriteBandJoin)
        e.injectPlannerStrategy(_ => graft.plans.AsOfMergeStrategy)
        graft.expressions.GraftFunctions.registrations.foreach(e.injectFunction)
      }
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Process-unique warehouse: two concurrent drivers on one machine
      // must not race each other's managed-table locations. Results never
      // depend on the path; a stable per-JVM suffix keeps re-created
      // sessions within one process pointed at the same place.
      .config(
        "spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft-warehouse-$processTag")
      .config("spark.ui.enabled", "false")
      // Lineage.cut localCheckpoint blocks are freed by the ContextCleaner
      // at driver GC (deterministic per-query release is unsafe — see
      // Caches.scala). The default periodic-GC nudge is 30 min; a long
      // many-query session accumulates dead cut blocks that long between
      // organic GCs, so reap on a minutes cadence instead.
      .config("spark.cleaner.periodicGC.interval", "2min")
      // events.parquet stores TIMESTAMP(NANOS); pre-4.x Spark rejected it.
      .config("spark.sql.legacy.parquet.nanosAsLong", "false")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
