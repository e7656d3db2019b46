package graft.streaming

import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

/** Structured Streaming twins of the batch event queries.
  *
  * [[stHourly]] is a REAL streaming query — file source -> event-time
  * window aggregation with a watermark -> memory sink — driven to
  * completion with Trigger.AvailableNow, so it is deterministic and
  * oracle-checkable: the final complete-mode result must equal the batch
  * hourly rollup (q13's oracle modulo column naming). On a cluster the same
  * plan runs unbounded: the watermark bounds state, the window aggregate
  * shuffles by (window, event_type), and the sink would be Kafka/Delta
  * instead of memory.
  */
object StreamingQueries {

  /** Run an entire bounded streaming query (schema probe, stream build,
    * start, awaitTermination) under the confs it needs, restoring both
    * afterwards:
    *
    *   - `spark.sql.legacy.parquet.nanosAsLong=true` — events.parquet
    *     stores TIMESTAMP(NANOS); the parquet reader consults the flag per
    *     microbatch, so it must stay set through execution. Restoring after
    *     awaitTermination is equivalent for an AvailableNow run, and keeps
    *     the flag from leaking into later batch reads of other
    *     nanos-timestamp parquet.
    *   - `spark.sql.shuffle.partitions=4` — stateful operators create one
    *     state store per shuffle partition per batch, and these bounded
    *     runs hold tiny state; 32 near-empty stores cost more in setup than
    *     the data. Unbounded production streams would size this to their
    *     key cardinality instead.
    *
    * Conf set/restore is session-global, so these helpers assume
    * single-threaded use of the session for the duration of the run (the
    * Verify/Bench drivers are sequential).
    */
  private def withStreamConfs[T](spark: SparkSession)(body: => T): T = {
    val prevNanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try body
    finally {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prevNanos)
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
  }

  /** Run independent staging-write thunks concurrently (guide §2.6,
    * overlap independent jobs): the per-micro-batch one-file writes are
    * independent Spark jobs into disjoint temp dirs, and each file's
    * contents are its own coalesce(1) scan order — byte-identical under
    * any submission order — so overlapping only removes the serial wall
    * (sum of job latencies → max). stReplay is deliberately NOT routed
    * through this: its stage/run interleave is replay semantics.
    */
  private def parStage(jobs: (() => Unit)*): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(jobs.size)
    try
      jobs
        .map(j =>
          pool.submit(new java.util.concurrent.Callable[Unit] { def call(): Unit = j() }))
        .foreach(_.get())
    finally pool.shutdown()
  }

  /** Events file stream with ts normalized to micros; assumes the
    * nanosAsLong flag is already set (use inside [[withStreamConfs]]).
    * Globbed, not the bare file: the file-stream source requires its base
    * path (the glob's parent) to be a directory.
    */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val rawSchema = graft.queries.Tables.schemaOf(spark, dir, "events")
    val raw = spark.readStream.schema(rawSchema).parquet(s"$dir/events*.parquet")
    // Same nanos-long / NTZ normalization as the batch reader; event-time
    // watermarks require plain TIMESTAMP.
    graft.queries.Tables.normalizeTs(raw)
  }

  /** Hourly (window-start, event_type) counts + value sums over a parquet
    * file STREAM of events, watermarked 1 hour on event time.
    */
  def stHourly(spark: SparkSession, dir: String): DataFrame = {
    // One query name per run; AvailableNow processes the full backlog then
    // stops, leaving the complete-mode result in the in-memory table.
    spark.streams.active.filter(_.name == "st_hourly").foreach(_.stop())
    withStreamConfs(spark) {
      val agg = eventsStream(spark, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      val q = agg.writeStream
        .format("memory")
        .queryName("st_hourly")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    spark
      .table("st_hourly")
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"),
        col("n"),
        col("total_value"))
      .orderBy("hour", "event_type")
  }

  /** Oracle: the batch hourly rollup — the streaming run must converge to
    * exactly this.
    */
  val stHourlySql: String =
    """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type, count(*) AS n,
      sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS total_value
      FROM events GROUP BY hour, event_type ORDER BY hour, event_type"""

  /** Batch reference for tests (same frame the memory sink must produce). */
  def batchHourly(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"),
        col("n"),
        col("total_value"))
      .orderBy("hour", "event_type")

  /** Stream-stream interval join: every purchase joined to the same user's
    * views in the preceding 30 minutes. Both sides are watermarked (state
    * cleanup); inner-join results emit as soon as both sides arrive, so the
    * AvailableNow run's final table is exactly the batch join — the DuckDB
    * range-join oracle.
    */
  def stJoin(spark: SparkSession, dir: String): DataFrame = {
    spark.streams.active.filter(_.name == "st_join").foreach(_.stop())
    withStreamConfs(spark) {
      val evs = eventsStream(spark, dir)
      val joined = purchaseStream(evs)
        .join(
          viewStream(evs),
          expr("user_id = v_user AND v_ts <= p_ts AND v_ts >= p_ts - interval 30 minutes"))
        .select(
          col("p_event"),
          col("v_event"),
          (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
      runAppendToMemory(joined, "st_join")
    }
    spark.table("st_join").orderBy("p_event", "v_event")
  }

  /** Watermarked purchase/view legs and the bounded memory-sink runner
    * shared by the stream-stream joins — one definition so the two join
    * variants cannot drift in watermark delay or column naming.
    */
  private def purchaseStream(evs: DataFrame): DataFrame = evs
    .filter(col("event_type") === "purchase")
    .select(col("event_id").as("p_event"), col("user_id"), col("ts").as("p_ts"))
    .withWatermark("p_ts", "1 hour")

  private def viewStream(evs: DataFrame): DataFrame = evs
    .filter(col("event_type") === "view")
    .select(col("event_id").as("v_event"), col("user_id").as("v_user"), col("ts").as("v_ts"))
    .withWatermark("v_ts", "1 hour")

  private def runAppendToMemory(df: DataFrame, name: String): Unit =
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()

  val stJoinSql: String =
    """SELECT p.event_id AS p_event, v.event_id AS v_event,
      epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
      FROM events p JOIN events v
        ON p.user_id = v.user_id
       AND p.event_type = 'purchase' AND v.event_type = 'view'
       AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 30 MINUTE
      ORDER BY p_event, v_event"""

  /** Stream-stream LEFT OUTER interval join: every purchase with its
    * preceding-30-minute views, or a null view row if none arrived — the
    * attribution query where absence is the signal. Outer-null results
    * only emit once the VIEW-side watermark passes the purchase (no
    * earlier point can prove no match is coming); AvailableNow's final
    * no-data batch advances the watermark to max(ts) - 1 h and flushes
    * them. The terminal GLOBAL watermark is min(per-side max event time)
    * - 1 h — one side going quiet early drags it back — so the
    * deterministic window is anchored to the LAGGING side: both engines
    * restrict to purchases at least 2 h before min(max purchase ts, max
    * view ts) (integer-microsecond cutoff — exact parity), guaranteeing
    * every kept purchase finalizes (cutoff sits 1 h behind the terminal
    * watermark) and the bounded run equals the batch LEFT JOIN oracle.
    * An unbounded production run has no such cutoff: late purchases
    * simply finalize when the watermark reaches them.
    */
  def stOuter(spark: SparkSession, dir: String): DataFrame = {
    spark.streams.active.filter(_.name == "st_outer").foreach(_.stop())
    val watermarkBase = Tables
      .events(spark, dir)
      .filter(col("event_type").isin("purchase", "view"))
      .groupBy("event_type")
      .agg(max(unix_micros(col("ts"))).as("m"))
      .collect()
      .map(_.getLong(1))
      .min
    val cutoff = watermarkBase - 7200000000L // 2 h in microseconds
    withStreamConfs(spark) {
      val evs = eventsStream(spark, dir)
      // The cutoff is applied AFTER the join, not on the purchase leg:
      // filtering the stream first would cap its max event time at the
      // cutoff and drag the GLOBAL watermark (min across inputs) 2 h
      // back, un-finalizing exactly the boundary purchases the cutoff is
      // meant to keep deterministic.
      val joined = purchaseStream(evs)
        .join(
          viewStream(evs),
          expr("user_id = v_user AND v_ts <= p_ts AND v_ts >= p_ts - interval 30 minutes"),
          "left_outer")
        .filter(unix_micros(col("p_ts")) <= cutoff)
        .select(
          col("p_event"),
          col("v_event"),
          (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
      runAppendToMemory(joined, "st_outer")
    }
    spark.table("st_outer").orderBy("p_event", "v_event")
  }

  val stOuterSql: String =
    """SELECT p.event_id AS p_event, v.event_id AS v_event,
      epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
      FROM (SELECT * FROM events
            WHERE event_type = 'purchase'
              AND epoch_us(ts) <= least(
                (SELECT max(epoch_us(ts)) FROM events WHERE event_type = 'purchase'),
                (SELECT max(epoch_us(ts)) FROM events WHERE event_type = 'view')) - 7200000000) p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON p.user_id = v.user_id
       AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 30 MINUTE
      ORDER BY p_event, v_event"""

  /** Streaming dedup: distinct (user, event_type, minute) triples under a
    * watermark via `dropDuplicatesWithinWatermark` — the streaming twin of
    * exact batch dedup. Only the dedup keys are projected, so which
    * physical row survives is irrelevant and the final output equals the
    * batch DISTINCT (the oracle).
    */
  def stDedup(spark: SparkSession, dir: String): DataFrame = {
    spark.streams.active.filter(_.name == "st_dedup").foreach(_.stop())
    withStreamConfs(spark) {
      val deduped = eventsStream(spark, dir)
        .withColumn("minute", date_format(col("ts"), "yyyy-MM-dd HH:mm"))
        .select(col("user_id"), col("event_type"), col("minute"), col("ts"))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("user_id", "event_type", "minute")
        .select("user_id", "event_type", "minute")
      val q = deduped.writeStream
        .format("memory")
        .queryName("st_dedup")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table("st_dedup").orderBy("user_id", "event_type", "minute")
  }

  val stDedupSql: String =
    """SELECT DISTINCT user_id, event_type, strftime(ts, '%Y-%m-%d %H:%M') AS minute
      FROM events ORDER BY user_id, event_type, minute"""

  /** Streaming sessionization via the built-in `session_window`: per-user
    * sessions that extend while each event lands strictly inside the
    * previous event's 30-minute window (split at gap >= 30 min — note the
    * boundary differs from q14's `> 30 min` islands predicate, and the
    * oracle mirrors session_window's semantics). COMPLETE mode needs no
    * watermark and its final table is the full deterministic session set —
    * unlike append-mode sessionize (streaming/Sessionize.scala), whose
    * emission timing is watermark-dependent and therefore test-gated.
    * Session bounds are emitted as microsecond longs: exact, no string
    * truncation.
    */
  def stSession(spark: SparkSession, dir: String): DataFrame = {
    spark.streams.active.filter(_.name == "st_session").foreach(_.stop())
    withStreamConfs(spark) {
      val agg = eventsStream(spark, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
      val q = agg.writeStream
        .format("memory")
        .queryName("st_session")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark
      .table("st_session")
      .select(
        col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"))
      .orderBy("user_id", "session_start_us")
  }

  val stSessionSql: String =
    """SELECT user_id, min_us AS session_start_us,
      max_us + 1800 * 1000000 AS session_end_us, n_events
      FROM (SELECT user_id, sid,
              min(epoch_us(ts)) AS min_us, max(epoch_us(ts)) AS max_us,
              count(*) AS n_events
            FROM (SELECT user_id, ts,
                    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS sid
                  FROM (SELECT user_id, ts, event_id,
                          CASE WHEN prev_us IS NULL
                                 OR epoch_us(ts) - prev_us >= 1800 * 1000000 THEN 1
                               ELSE 0 END AS new_session
                        FROM (SELECT user_id, ts, event_id,
                                lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
                              FROM events)))
            GROUP BY user_id, sid)
      ORDER BY user_id, session_start_us"""

  /** Stream-static enrichment: the event stream joined to the static
    * customer dimension (broadcast per micro-batch — the static side never
    * shuffles), then an event-time-free aggregate in complete mode. The
    * canonical "enrich the firehose with a dim table" pipeline stage.
    */
  def stEnrich(spark: SparkSession, dir: String): DataFrame = {
    spark.streams.active.filter(_.name == "st_enrich").foreach(_.stop())
    val dim = Tables
      .t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    withStreamConfs(spark) {
      val agg = eventsStream(spark, dir)
        .join(broadcast(dim), col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment", "event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      val q = agg.writeStream
        .format("memory")
        .queryName("st_enrich")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table("st_enrich").orderBy("c_mktsegment", "event_type")
  }

  val stEnrichSql: String =
    """SELECT c_mktsegment, event_type, count(*) AS n,
      sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS total_value
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY c_mktsegment, event_type
      ORDER BY c_mktsegment, event_type"""

  /** foreachBatch file sink: the production pattern for streaming into a
    * batch-queryable store — each micro-batch lands as parquet via
    * [[IdempotentSink]] (batch-id-keyed overwrite, so a redelivered batch
    * replaces rather than duplicates; retry idempotence is spec-proven in
    * ForeachBatchSpec). Driven with AvailableNow into a fresh directory,
    * the read-back aggregate must equal the plain batch answer (the
    * oracle); partial/duplicated batches would break the hash.
    */
  def stSink(spark: SparkSession, dir: String): DataFrame = {
    val dest = graft.queries.SessionMemo.tmpDir(spark, "st_sink")
    // Stop any leftover prior query BEFORE clearing its sink directory —
    // the other order would let an in-flight micro-batch append into the
    // freshly-cleared dest and duplicate rows.
    spark.streams.active.filter(_.name == "st_sink").foreach(_.stop())
    val p = new org.apache.hadoop.fs.Path(dest)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    withStreamConfs(spark) {
      val evs = eventsStream(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val q = evs.writeStream
        .queryName("st_sink")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          IdempotentSink.write(batch, batchId, dest)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read
      .parquet(dest)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("event_type")
  }

  val stSinkSql: String =
    """SELECT event_type, count(*) AS n,
      sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS total_value
      FROM events GROUP BY event_type ORDER BY event_type"""

  /** Streaming top-k: a stateful complete-mode aggregation maintains
    * per-(event_type, user) running totals across micro-batches (the
    * leaderboard state a live pipeline keeps); the top-3 presentation
    * ranks the final snapshot batch-side. Totals go through
    * DECIMAL(18,2) like [[stSink]], so the ranking key is exact on both
    * engines — no float-order tie risk at the k boundary. Unbounded, the
    * same plan emits a fresh leaderboard per trigger; here AvailableNow
    * pins the deterministic final table.
    */
  def stTopk(spark: SparkSession, dir: String): DataFrame = {
    spark.streams.active.filter(_.name == "st_topk").foreach(_.stop())
    withStreamConfs(spark) {
      val agg = eventsStream(spark, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"),
          count(lit(1)).as("n_events"))
      val q = agg.writeStream
        .format("memory")
        .queryName("st_topk")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
      .orderBy(col("total").desc, col("user_id"))
    spark
      .table("st_topk")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy("event_type", "rnk")
  }

  val stTopkSql: String =
    """SELECT event_type, user_id, total, n_events, rnk FROM (
        SELECT event_type, user_id, total, n_events,
          row_number() OVER (PARTITION BY event_type ORDER BY total DESC, user_id) AS rnk
        FROM (SELECT event_type, user_id,
                sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS total,
                count(*) AS n_events
              FROM events GROUP BY event_type, user_id))
      WHERE rnk <= 3 ORDER BY event_type, rnk"""

  /** Streaming CDC apply: the event stream is a keyed changeset on
    * user_id ('error' events are tombstones, everything else upserts the
    * user's profile row), applied to a parquet state store inside
    * foreachBatch with the version-aware merge
    * ([[graft.operators.Merge.applyVersionedRetained]] on
    * (ts, event_id)) — the streaming upsert-sink pattern (Delta MERGE in
    * foreachBatch) with batch-partitioning-independent semantics: the
    * state RETAINS winning tombstones (op column stored), so an upsert
    * whose version is older than an already-applied delete loses in any
    * later batch too — the result is identical for one AvailableNow
    * batch, maxFilesPerTrigger=1, or any other batch split. Deletes are
    * filtered only in the final presentation read. Each batch writes the
    * next state beside the current one and atomically renames, so the
    * state read and write never race on one path.
    */
  def stCdc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val stateDir = graft.queries.SessionMemo.tmpDir(spark, "st_cdc_state")
    spark.streams.active.filter(_.name == "st_cdc").foreach(_.stop())
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(statePath)) fs.delete(statePath, true)
    val stateSchema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("ts", TimestampType),
      StructField("event_id", LongType),
      StructField("op", StringType)))
    withStreamConfs(spark) {
      val evs = eventsStream(spark, dir)
        .select(col("user_id"), col("event_type"), col("value"), col("ts"), col("event_id"))
        .withColumn("op", when(col("event_type") === "error", "delete").otherwise("upsert"))
      val q = evs.writeStream
        .queryName("st_cdc")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val s = batch.sparkSession
          val cur =
            if (fs.exists(statePath)) s.read.schema(stateSchema).parquet(stateDir)
            else s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          val next = graft.operators.Merge
            .applyVersionedRetained(cur, batch, Seq("user_id"), Seq("ts", "event_id"))
          val tmp = new org.apache.hadoop.fs.Path(s"${stateDir}_b$batchId")
          next.write.mode("overwrite").parquet(tmp.toString)
          if (fs.exists(statePath)) fs.delete(statePath, true)
          fs.rename(tmp, statePath)
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read
      .parquet(stateDir)
      .filter(col("op") =!= "delete")
      .select(
        col("user_id"),
        col("event_type").as("last_event_type"),
        col("value").as("last_value"),
        unix_micros(col("ts")).as("last_ts_us"),
        col("event_id").as("last_event_id"))
      .orderBy("user_id")
  }

  val stCdcSql: String =
    """SELECT user_id, event_type AS last_event_type, value AS last_value,
        epoch_us(ts) AS last_ts_us, event_id AS last_event_id
      FROM (SELECT user_id, event_type, value, ts, event_id,
              row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id"""

  /** Streaming anomaly detection: the stream maintains watermarked hourly
    * (window, event_type) totals — the standard bounded-state windowed
    * aggregate; flagging happens in a batch finisher over the (tiny)
    * complete-mode result: each hourly total z-scored against its own
    * event type's distribution across hours, |z| > 2 flagged. The
    * per-type mean/std use hour-ORDERED folds of exact DECIMAL-derived
    * totals, and sqrt/division are correctly-rounded IEEE ops, so z — and
    * therefore the flag comparison — is bit-identical on both engines
    * (nothing ranks or branches on a transcendental). On a cluster the
    * finisher re-runs per trigger over the aggregate state, never the
    * event stream.
    */
  def stAnomaly(spark: SparkSession, dir: String): DataFrame = {
    spark.streams.active.filter(_.name == "st_anomaly").foreach(_.stop())
    withStreamConfs(spark) {
      val agg = eventsStream(spark, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      val q = agg.writeStream
        .format("memory")
        .queryName("st_anomaly")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val hourly = spark
      .table("st_anomaly")
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"),
        col("total"))
    // Both sides read the same memory-sink view; rename the stats side's
    // key so the self-join resolves (same reason Bfs aliases its rounds).
    val stats = hourly
      .groupBy(col("event_type").as("et"))
      .agg(
        sort_array(collect_list(struct(col("hour"), col("total")))).as("lst"),
        count(lit(1)).as("n"))
      .select(
        col("et"),
        col("n"),
        aggregate(col("lst"), lit(0.0), (a, e) => a + e.getField("total")).as("s"),
        aggregate(
          col("lst"),
          lit(0.0),
          (a, e) => a + e.getField("total") * e.getField("total")).as("ss"))
      .select(
        col("et"),
        (col("s") / col("n")).as("mean"),
        sqrt(greatest(lit(0.0), (col("ss") - col("s") * col("s") / col("n")) / col("n")))
          .as("std"))
    hourly
      .join(broadcast(stats), col("event_type") === col("et"))
      .withColumn(
        "z",
        when(col("std") > 0, (col("total") - col("mean")) / col("std")).otherwise(lit(0.0)))
      .withColumn("is_anomaly", abs(col("z")) > 2.0)
      .select("hour", "event_type", "total", "z", "is_anomaly")
      .orderBy("hour", "event_type")
  }

  val stAnomalySql: String =
    """WITH hourly AS (
        SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
          sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS total
        FROM events GROUP BY hour, event_type),
      st AS (SELECT event_type, count(*) AS n,
          list_reduce(list_prepend(0.0, list(total ORDER BY hour)), (a, b) -> a + b) AS s,
          list_reduce(list_prepend(0.0, list(total * total ORDER BY hour)), (a, b) -> a + b) AS ss
        FROM hourly GROUP BY event_type),
      m AS (SELECT event_type, s / n AS mean,
          sqrt(greatest(0.0, (ss - s * s / n) / n)) AS std FROM st)
      SELECT h.hour, h.event_type, h.total,
        CASE WHEN m.std > 0 THEN (h.total - m.mean) / m.std ELSE 0.0 END AS z,
        abs(CASE WHEN m.std > 0 THEN (h.total - m.mean) / m.std ELSE 0.0 END) > 2.0 AS is_anomaly
      FROM hourly h JOIN m USING (event_type) ORDER BY h.hour, h.event_type"""

  /** Streaming per-tenant rate limiting ([[Quota]]): each (event_type,
    * hour) tenant-key admits its first [[Quota.DefaultN]] events (1,879 of
    * the 3,385 sf0.01 keys are clipped — the quota genuinely bites);
    * state is one counter per live key, expired by event-time timeout.
    * The AvailableNow replay processes the backlog as one sorted batch,
    * so admission is exactly "first N per key by (ts, event_id)" — the
    * oracle's row_number filter.
    */
  def stQuota(spark: SparkSession, dir: String): DataFrame = {
    spark.streams.active.filter(_.name == "st_quota").foreach(_.stop())
    withStreamConfs(spark) {
      import spark.implicits._
      val evs = eventsStream(spark, dir)
        .select(
          col("event_type").as("tenant"),
          date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
          unix_micros(col("ts")).as("tsUs"),
          col("ts"),
          col("event_id"))
        .as[QuotaEvent]
      val q = Quota
        .admit(evs, Quota.DefaultN)
        .writeStream
        .format("memory")
        .queryName("st_quota")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table("st_quota").orderBy("tenant", "hour", "quota_rank")
  }

  val stQuotaSql: String =
    s"""SELECT tenant, hour, event_id, ts_us, quota_rank FROM (
        SELECT event_type AS tenant, strftime(ts, '%Y-%m-%d %H') AS hour, event_id,
          epoch_us(ts) AS ts_us,
          row_number() OVER (PARTITION BY event_type, strftime(ts, '%Y-%m-%d %H')
                             ORDER BY ts, event_id) AS quota_rank
        FROM events)
      WHERE quota_rank <= ${Quota.DefaultN} ORDER BY tenant, hour, quota_rank"""

  /** Streaming first-touch funnel ([[Funnel]]): one output row per funnel
    * ADVANCEMENT per user. Bounded AvailableNow replay = exactly the batch
    * `q78_funnel` first-touch semantics; the oracle replays the three step
    * CTEs and unpivots them to advancement rows.
    */
  def stFunnel(spark: SparkSession, dir: String): DataFrame = {
    spark.streams.active.filter(_.name == "st_funnel").foreach(_.stop())
    withStreamConfs(spark) {
      import spark.implicits._
      val evs = eventsStream(spark, dir)
        .select(
          col("user_id"),
          col("event_type"),
          unix_micros(col("ts")).as("us"),
          col("ts"))
        .as[FunnelEvent]
      val q = Funnel
        .track(evs)
        .writeStream
        .format("memory")
        .queryName("st_funnel")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table("st_funnel").orderBy("user_id", "depth")
  }

  val stFunnelSql: String =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      s1 AS (SELECT user_id, min(us) AS t1_us FROM ev WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (SELECT ev.user_id, min(us) AS t2_us FROM ev JOIN s1 USING (user_id)
             WHERE event_type = 'click' AND us > t1_us GROUP BY ev.user_id),
      s3 AS (SELECT ev.user_id, min(us) AS t3_us FROM ev JOIN s2 USING (user_id)
             WHERE event_type = 'purchase' AND us > t2_us GROUP BY ev.user_id)
      SELECT user_id, 1::BIGINT AS depth, t1_us AS at_us, false AS completed FROM s1
      UNION ALL
      SELECT user_id, 2::BIGINT, t2_us, false FROM s2
      UNION ALL
      SELECT s3.user_id, 3::BIGINT, t3_us, t3_us - t1_us <= ${Funnel.WindowUs} FROM s3
        JOIN s1 ON s1.user_id = s3.user_id
      ORDER BY user_id, depth"""

  /** Watermark LATE-DATA accounting — the one streaming behavior no other
    * query here exercises: how many rows the watermark actually DROPS.
    *
    * The event table is staged as three files with pinned modification
    * times, streamed with `maxFilesPerTrigger=1` so AvailableNow replays
    * them as three ordered micro-batches:
    *
    *   1. on-time bulk (every event except the below),
    *   2. the single max-ts row — a pure watermark-advancing tick,
    *   3. the stragglers (every 20th event).
    *
    * Spark's eviction lags the watermark by one batch (state removal runs
    * at batch END with that batch's operating watermark — measured, not
    * assumed: a two-file version of this query absorbed every straggler,
    * in update AND append mode). The middle tick batch runs at watermark
    * W1 = ms-floored max(on-time) - 1h and finalizes every window with
    * end <= W1; the straggler batch then runs at W2 = max(all) - 1h, so
    * stragglers into those finalized windows are genuinely DROPPED, while
    * stragglers into (W1, W2] windows are absorbed and flushed with their
    * window's final count. Emitted per finalized hour (window end <= W2):
    * total rows, surviving rows, rows dropped. The oracle replays W1/W2
    * and both boundary rules exactly.
    */
  def stLate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    spark.streams.active.filter(_.name == "st_late").foreach(_.stop())
    val stage = graft.queries.SessionMemo.tmpDir(spark, "st_late_src")
    val fs = FileSystem.get(
      new java.net.URI(stage),
      spark.sparkContext.hadoopConfiguration)
    val stagePath = new Path(stage)
    if (fs.exists(stagePath)) fs.delete(stagePath, true)
    fs.mkdirs(stagePath)
    val ev = Tables.events(spark, dir).select(col("event_id"), col("ts"))
    // Driver-side SCALAR pull (max ts) — bounded, like the k-centroid
    // and bloom-bytes collects the plan audit allows.
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val isTick = col("ts") === lit(maxTs)
    val isLate = (col("event_id") % 20 === 0) && !isTick
    def stageOne(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = s"$stage/_build_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.globStatus(new Path(tmp, "part-*.parquet")).head.getPath
      val dest = new Path(stagePath, s"$name.parquet")
      fs.rename(part, dest)
      fs.delete(new Path(tmp), true)
      fs.setTimes(dest, mtime, -1)
    }
    // Fixed mtimes: only their ORDER matters (the file source processes
    // oldest-first), and fixed values keep re-runs deterministic.
    parStage(
      () => stageOne(ev.filter(!isTick && !isLate), "0_ontime", 1700000000000L),
      () => stageOne(ev.filter(isTick), "1_tick", 1700000060000L),
      () => stageOne(ev.filter(isLate), "2_late", 1700000120000L))
    val schema = spark.read.parquet(s"$stage/0_ontime.parquet").schema
    withStreamConfs(spark) {
      val raw = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$stage/*.parquet")
      val agg = raw
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
      val q = agg.writeStream
        .format("memory")
        .queryName("st_late")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val fin = spark.table("st_late").select(col("w"), col("n").as("n_final"))
    val w2 = date_trunc("millisecond", lit(maxTs)) - expr("INTERVAL 1 HOUR")
    Tables
      .events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_all"))
      .filter(col("w.end") <= w2)
      .join(fin, Seq("w"), "left")
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH").as("hour"),
        col("n_all"),
        coalesce(col("n_final"), lit(0L)).as("n_final"),
        (col("n_all") - coalesce(col("n_final"), lit(0L))).as("n_dropped"))
      .orderBy("hour")
  }

  val stLateSql: String =
    """WITH mx AS (SELECT max(ts) AS m FROM events),
      late AS (SELECT e.ts FROM events e, mx WHERE e.event_id % 20 = 0 AND e.ts <> mx.m),
      ontime AS (SELECT e.ts FROM events e, mx
        WHERE e.ts <> mx.m AND NOT (e.event_id % 20 = 0)),
      w1 AS (SELECT date_trunc('millisecond', max(ts)) - INTERVAL 1 HOUR AS w FROM ontime),
      w2 AS (SELECT date_trunc('millisecond', max(ts)) - INTERVAL 1 HOUR AS w FROM events),
      acc AS (SELECT l.ts FROM late l, w1
        WHERE date_trunc('hour', l.ts) + INTERVAL 1 HOUR > w1.w),
      fin AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n_final
        FROM (SELECT ts FROM ontime UNION ALL SELECT ts FROM acc) GROUP BY h),
      al AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n_all FROM events GROUP BY h)
      SELECT strftime(al.h, '%Y-%m-%d %H') AS hour, al.n_all,
        coalesce(fin.n_final, 0) AS n_final,
        al.n_all - coalesce(fin.n_final, 0) AS n_dropped
      FROM al LEFT JOIN fin ON al.h = fin.h, w2
      WHERE al.h + INTERVAL 1 HOUR <= w2.w
      ORDER BY hour"""

  /** Exactly-once across a RESTART: the even-id half of events is staged,
    * an AvailableNow run with a persistent checkpoint processes it
    * (batch 0, via [[IdempotentSink]]); then the odd-id half lands and a
    * SECOND run from the SAME checkpoint processes only the new file
    * (batch 1) — the file source's seen-files log carries across runs.
    * The output is the per-batch breakdown, so the oracle's
    * `batch_id = event_id % 2` replay is a PROOF: a restart that
    * re-read the first file would put even ids in batch 1, a checkpoint
    * that failed to carry would restart batch numbering at 0 and
    * overwrite — either way the hash breaks. This is the
    * stop-the-job/resume-the-job production mechanic (deploys, spot
    * loss) the other streaming queries don't exercise: their state lives
    * and dies within one run.
    */
  def stReplay(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    spark.streams.active.filter(_.name == "st_replay").foreach(_.stop())
    val stage = graft.queries.SessionMemo.tmpDir(spark, "st_replay_src")
    val dest = graft.queries.SessionMemo.tmpDir(spark, "st_replay_sink")
    val ckpt = graft.queries.SessionMemo.tmpDir(spark, "st_replay_ckpt")
    val fs = FileSystem.get(new java.net.URI(stage), spark.sparkContext.hadoopConfiguration)
    Seq(stage, dest, ckpt).foreach { d =>
      val p = new Path(d)
      if (fs.exists(p)) fs.delete(p, true)
    }
    fs.mkdirs(new Path(stage))
    val ev = Tables
      .events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    def stageOne(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = s"$stage/_build_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.globStatus(new Path(tmp, "part-*.parquet")).head.getPath
      val out = new Path(stage, s"$name.parquet")
      fs.rename(part, out)
      fs.delete(new Path(tmp), true)
      fs.setTimes(out, mtime, -1)
    }
    val schema = ev.schema
    def runOnce(): Unit = withStreamConfs(spark) {
      val q = spark.readStream
        .schema(schema)
        .parquet(s"$stage/*.parquet")
        .writeStream
        .queryName("st_replay")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          IdempotentSink.write(batch, batchId, dest)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    stageOne(ev.filter(col("event_id") % 2 === 0), "0_first", 1700000000000L)
    runOnce()
    stageOne(ev.filter(col("event_id") % 2 === 1), "1_second", 1700000060000L)
    runOnce()
    spark.read
      .parquet(dest)
      .groupBy(col("batch_id").cast("long").as("batch_id"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("batch_id", "event_type")
  }

  val stReplaySql: String =
    """SELECT (event_id % 2)::BIGINT AS batch_id, event_type,
      count(*) AS n, sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS total_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Streaming IVF-index maintenance — the 100 TB ingest path of the ANN
    * family: the embedding corpus arrives in three micro-batches (staged
    * chronological files, one per trigger) and each batch's vectors are
    * assigned to the TRAINED index's cells entirely map-side
    * ([[graft.queries.AnnQueries.servingCentroidsLit]] — the same final
    * Lloyd centroids every batch km query assigns against, embedded as a
    * literal; no join, no per-vector state). The per-cell registry is a
    * complete-mode streaming aggregation keyed by cell id — state is
    * O(k), not O(vectors) — and the final registry must equal the batch
    * fit's own cell census bit-for-bit (count + id checksum), which the
    * oracle replays from the identical Lloyd chain. On a cluster the
    * same plan ingests an unbounded vector stream into Kafka/Delta with
    * the centroids refreshed by periodic re-fits.
    */
  def stAnnindex(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    spark.streams.active.filter(_.name == "st_annindex").foreach(_.stop())
    val stage = graft.queries.SessionMemo.tmpDir(spark, "st_annindex_src")
    val fs = FileSystem.get(
      new java.net.URI(stage),
      spark.sparkContext.hadoopConfiguration)
    val stagePath = new Path(stage)
    if (fs.exists(stagePath)) fs.delete(stagePath, true)
    fs.mkdirs(stagePath)
    val vecs = Tables.t(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    def stageOne(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = s"$stage/_build_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.globStatus(new Path(tmp, "part-*.parquet")).head.getPath
      val dest = new Path(stagePath, s"$name.parquet")
      fs.rename(part, dest)
      fs.delete(new Path(tmp), true)
      fs.setTimes(dest, mtime, -1)
    }
    parStage(
      () => stageOne(vecs.filter(col("vec_id") % 3 === 0), "0_batch", 1700000000000L),
      () => stageOne(vecs.filter(col("vec_id") % 3 === 1), "1_batch", 1700000060000L),
      () => stageOne(vecs.filter(col("vec_id") % 3 === 2), "2_batch", 1700000120000L))
    // Trained index, built batch-side BEFORE the stream starts (k-bounded
    // driver collect — the one pull the k-means family allows).
    val centroids = graft.queries.AnnQueries.servingCentroidsLit(spark, dir)
    val schema = spark.read.parquet(s"$stage/0_batch.parquet").schema
    withStreamConfs(spark) {
      val raw = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$stage/*.parquet")
      val assigned = raw.select(
        col("vec_id"),
        graft.operators.KMeans
          .nearest(col("embedding").cast("array<double>"), centroids)
          .as("cid"))
      val registry = assigned
        .groupBy("cid")
        .agg(count(lit(1)).as("n_vectors"), sum(col("vec_id")).as("id_sum"))
      val q = registry.writeStream
        .format("memory")
        .queryName("st_annindex")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table("st_annindex").orderBy("cid")
  }

  val stAnnindexSql: String = {
    val ctes = graft.queries.AnnQueries.kmeansOracleCtes
    val fin = graft.queries.AnnQueries.kmeansFinalRelation
    s"""WITH $ctes
      SELECT cluster AS cid, count(*)::BIGINT AS n_vectors, sum(id)::BIGINT AS id_sum
      FROM $fin GROUP BY cluster ORDER BY cid"""
  }

  /** Streaming data-drift monitor — the ingest-time gate a training
    * pipeline runs before a new crawl batch is allowed into the corpus:
    * each arriving micro-batch's quality-score decile histogram
    * ([[graft.queries.TextQueries.qualityCol]], binned exactly as
    * ta_calibration) is compared against the FIRST batch (the pinned
    * reference distribution) by integer L1 distance —
    * `drift_ppm = 1e6 * Σ_bins |n_b,i/N_b − n_0,i/N_0|`, computed
    * cross-multiplied as `(1e6 * Σ|n_b,i*N_0 − n_0,i*N_b|) div (N_b*N_0)`
    * so there is no float accumulation anywhere. Per-batch histograms are
    * 10-row aggregates written through the batch-id-keyed
    * [[IdempotentSink]] (exactly-once under redelivery); the comparison
    * is a bin-keyed join of the tiny histogram frames. On a cluster the
    * same plan tails an unbounded feed and alerts when drift_ppm jumps.
    */
  def stDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    spark.streams.active.filter(_.name == "st_drift").foreach(_.stop())
    val stage = graft.queries.SessionMemo.tmpDir(spark, "st_drift_src")
    val dest = graft.queries.SessionMemo.tmpDir(spark, "st_drift_sink")
    val fs = FileSystem.get(new java.net.URI(stage), spark.sparkContext.hadoopConfiguration)
    Seq(stage, dest).foreach { d =>
      val p = new Path(d)
      if (fs.exists(p)) fs.delete(p, true)
    }
    fs.mkdirs(new Path(stage))
    val docs = Tables
      .t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    def stageOne(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = s"$stage/_build_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.globStatus(new Path(tmp, "part-*.parquet")).head.getPath
      val out = new Path(stage, s"$name.parquet")
      fs.rename(part, out)
      fs.delete(new Path(tmp), true)
      fs.setTimes(out, mtime, -1)
    }
    parStage(
      () => stageOne(docs.filter(col("doc_id") % 3 === 0), "0_batch", 1700000000000L),
      () => stageOne(docs.filter(col("doc_id") % 3 === 1), "1_batch", 1700000060000L),
      () => stageOne(docs.filter(col("doc_id") % 3 === 2), "2_batch", 1700000120000L))
    val schema = spark.read.parquet(s"$stage/0_batch.parquet").schema
    val bin = least(
      greatest(floor(graft.queries.TextQueries.qualityCol * 10).cast("long"), lit(0L)),
      lit(9L))
    withStreamConfs(spark) {
      val q = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$stage/*.parquet")
        .writeStream
        .queryName("st_drift")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          IdempotentSink.write(
            batch.select(bin.as("bin")).groupBy("bin").agg(count(lit(1)).as("n")),
            batchId,
            dest)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val hist = spark.read.parquet(dest).select(
      col("batch_id").cast("long").as("batch_id"), col("bin"), col("n"))
    val ref = hist.filter(col("batch_id") === 0L).select(col("bin"), col("n").as("ref_n"))
    val totals = hist.groupBy("batch_id").agg(sum(col("n")).as("n_docs"))
    val refTotal = totals.filter(col("batch_id") === 0L).select(col("n_docs").as("ref_docs"))
    // Explicit (batch × seen-bin) grid: a bin present in the reference
    // but EMPTY in batch b still contributes |0 − ref_n·N_b| to b's
    // distance (and vice versa) — a plain join would drop exactly the
    // rows that signal the strongest drift. ref bins ⊆ hist bins by
    // construction, so hist's bin set is the full support.
    val grid = totals.crossJoin(hist.select("bin").distinct())
    grid
      .join(hist, Seq("batch_id", "bin"), "left")
      .join(ref, Seq("bin"), "left")
      .crossJoin(broadcast(refTotal))
      .select(
        col("batch_id"),
        col("n_docs"),
        col("ref_docs"),
        abs(
          coalesce(col("n"), lit(0L)) * col("ref_docs") -
            coalesce(col("ref_n"), lit(0L)) * col("n_docs")).as("term"))
      .groupBy("batch_id", "n_docs", "ref_docs")
      .agg(sum(col("term")).as("l1_num"))
      .select(
        col("batch_id"),
        col("n_docs"),
        expr("(l1_num * 1000000) div (n_docs * ref_docs)").as("drift_ppm"))
      .orderBy("batch_id")
  }

  val stDriftSql: String = {
    val q = graft.queries.TextQueries.qualitySqlExpr
    s"""WITH b AS (SELECT doc_id % 3 AS batch_id,
          least(greatest(floor(($q) * 10)::BIGINT, 0), 9) AS bin
        FROM documents),
      hist AS (SELECT batch_id, bin, count(*)::BIGINT AS n FROM b GROUP BY batch_id, bin),
      tot AS (SELECT batch_id, sum(n)::BIGINT AS n_docs FROM hist GROUP BY batch_id),
      ref AS (SELECT bin, n AS ref_n FROM hist WHERE batch_id = 0),
      rt AS (SELECT n_docs AS ref_docs FROM tot WHERE batch_id = 0),
      grid AS (SELECT t.batch_id, t.n_docs, s.bin
        FROM tot t CROSS JOIN (SELECT DISTINCT bin FROM hist) s),
      terms AS (SELECT g.batch_id, g.n_docs, rt.ref_docs,
          abs(coalesce(h.n, 0) * rt.ref_docs - coalesce(r.ref_n, 0) * g.n_docs) AS term
        FROM grid g
        LEFT JOIN hist h ON g.batch_id = h.batch_id AND g.bin = h.bin
        LEFT JOIN ref r ON g.bin = r.bin
        CROSS JOIN rt)
      SELECT batch_id, n_docs,
        ((sum(term) * 1000000) // (n_docs * ref_docs))::BIGINT AS drift_ppm
      FROM terms GROUP BY batch_id, n_docs, ref_docs ORDER BY batch_id"""
  }

  /** STATELESS streaming quality filter — classifier inference on a
    * document stream. The hashed-bigram score folds inside ONE scalar
    * expression per row ([[graft.queries.TextQueries.hashClfScoreCol]]:
    * the weight is derived from the bucket hash inline, so there is no
    * broadcast table, no join, no aggregation state — every micro-batch
    * row scores and filters independently, which is why this shape runs
    * unbounded with ZERO state stores and exactly-once semantics come
    * free with any idempotent sink). Scoring is over the DOCUMENT PREFIX
    * (first [[StHashclfMaxFeats]] bigrams) — the standard
    * quality-classifier budget, and the scale property that matters:
    * per-row cost is a CONSTANT, independent of document length (HOF
    * lambdas run interpreted, so an uncapped fold on long docs was 5.8 s
    * at sf0.1 vs 0.4 s capped — and a single pathological 100 MB doc
    * would stall its whole partition). The batch oracle replays the same
    * capped fold; kept rows (score > 0) must match exactly. Complements
    * [[graft.queries.TextQueries.taHashclf]], which exercises the
    * broadcast-lookup JOIN form over full documents.
    */
  private val StHashclfMaxFeats = 256

  def stHashclf(spark: SparkSession, dir: String): DataFrame = {
    spark.streams.active.filter(_.name == "st_hashclf").foreach(_.stop())
    withStreamConfs(spark) {
      val rawSchema = graft.queries.Tables.schemaOf(spark, dir, "documents")
      val scored = spark.readStream
        .schema(rawSchema)
        .parquet(s"$dir/documents*.parquet")
        // Parallelize the CPU-bound scoring: the local corpus is ONE
        // small parquet file = one input split, which serialized the
        // md5 folds onto a single core (measured 6.7 s at sf0.1; the
        // shuffle of the raw text is megabytes). Sized from the
        // cluster's parallelism, NOT a constant — a literal here would
        // CAP a 1000-core cluster's scoring at that constant. A
        // production stream has many files per micro-batch and mostly
        // wouldn't need this.
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
          col("doc_id"),
          graft.functions.TextAnalysis.tokens(col("text")).as("tk"))
        .select(
          col("doc_id"),
          slice(expr(graft.queries.TextQueries.hashClfBigramsSql), 1, StHashclfMaxFeats)
            .as("bgs"))
        .select(
          col("doc_id"),
          size(col("bgs")).cast("long").as("n_feat"),
          graft.queries.TextQueries.hashClfScoreCol(col("bgs")).as("score"))
        .filter(col("score") > 0L)
      runAppendToMemory(scored, "st_hashclf")
    }
    spark.table("st_hashclf").orderBy("doc_id")
  }

  val stHashclfSql: String = {
    val bHash = graft.functions.Hashing.sqlMd5Long60Duck("'clfb|' || bg")
    val bucket = s"($bHash) % ${graft.queries.TextQueries.HashClfBuckets}"
    val wExpr = s"(($bucket) * ${graft.queries.TextQueries.HashClfWeightMul}) % 2001 - 1000"
    raw"""WITH tk AS (SELECT doc_id,
          list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS tk
        FROM documents),
      bg AS (SELECT doc_id,
          unnest(list_transform(range(1, least(greatest(len(tk), 1), ${StHashclfMaxFeats + 1})),
            i -> tk[i] || ' ' || tk[i + 1])) AS bg
        FROM tk),
      f AS (SELECT doc_id, $wExpr AS w FROM bg)
      SELECT doc_id, count(*)::BIGINT AS n_feat, sum(w)::BIGINT AS score
      FROM f GROUP BY doc_id HAVING sum(w) > 0 ORDER BY doc_id"""
  }

  /** Streaming NEAR-duplicate flagging against a stateful LSH ledger —
    * the crawl-ingest "have we already got something like this?" check,
    * run incrementally: three deterministic ingest batches (docs bucketed
    * by `doc_id % 3`, staged as ordered files) stream through the
    * MAP-ONLY shingle→minhash→band transform
    * ([[graft.operators.Dedup.bandRowsMapOnly]] — no persist, no
    * pre-shuffle), and [[NearDup.flag]] keeps the band ledger in keyed
    * state, flagging each document that shares a bucket with a
    * STRICTLY-EARLIER batch. Per doc: how many of its bands hit, whether
    * it is a near-dup, and the smallest earlier partner id. Uses the SAME
    * (k, numHashes, bands) declaration as dd_minhash, so the oracle
    * replays the identical bucketing plus the batch-order predicate.
    *
    * Scale shape: per trigger the work is batch-sized (each new doc
    * shuffles `bands` slim rows to its buckets); the ledger never
    * re-pairs with itself; state is the dedup ledger itself (|corpus| ×
    * bands entries in the state store — the honest streaming-dedup cost,
    * with TTL/retention the production knob).
    */
  def stNeardup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    spark.streams.active.filter(_.name == "st_neardup").foreach(_.stop())
    val stage = graft.queries.SessionMemo.tmpDir(spark, "st_neardup_src")
    val fs = FileSystem.get(new java.net.URI(stage), spark.sparkContext.hadoopConfiguration)
    val stagePath = new Path(stage)
    if (fs.exists(stagePath)) fs.delete(stagePath, true)
    fs.mkdirs(stagePath)
    val docs = graft.queries.Tables
      .t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    def stageOne(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = s"$stage/_build_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.globStatus(new Path(tmp, "part-*.parquet")).head.getPath
      val dest = new Path(stagePath, s"$name.parquet")
      fs.rename(part, dest)
      fs.delete(new Path(tmp), true)
      fs.setTimes(dest, mtime, -1)
    }
    parStage(
      () => stageOne(docs.filter(col("doc_id") % 3 === 0), "0_batch", 1700000000000L),
      () => stageOne(docs.filter(col("doc_id") % 3 === 1), "1_batch", 1700000060000L),
      () => stageOne(docs.filter(col("doc_id") % 3 === 2), "2_batch", 1700000120000L))
    val schema = spark.read.parquet(s"$stage/0_batch.parquet").schema
    val (k, numHashes, bands) = graft.queries.DedupQueries.LshParams
    withStreamConfs(spark) {
      import spark.implicits._
      val raw = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$stage/*.parquet")
        // One small file per trigger = one input split; spread the
        // md5-heavy shingle pass (same rationale as st_hashclf).
        .repartition(spark.sparkContext.defaultParallelism)
      val arrivals = graft.operators.Dedup
        .bandRowsMapOnly(raw, "doc_id", "text", k, numHashes, bands)
        .select(
          // The bucket serialized as the state key; '|' cannot occur in
          // the numeric fields.
          concat_ws("|", col("bv.band") +:
            (0 until numHashes / bands).map(r => col(s"bv.s$r")): _*).as("bandKey"),
          col("id").as("docId"),
          (col("id") % 3).as("batch"))
        .as[BandArrival]
      val hits = NearDup.flag(arrivals)
      runAppendToMemory(hits.toDF(), "st_neardup")
    }
    spark
      .table("st_neardup")
      .groupBy(col("docId").as("doc_id"), col("batch"))
      .agg(
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_band_hits"),
        coalesce(min(when(col("hit"), col("partner"))), lit(-1L)).as("partner"))
      .withColumn("is_neardup", col("n_band_hits") > 0L)
      .select("doc_id", "batch", "n_band_hits", "is_neardup", "partner")
      .orderBy("doc_id")
  }

  val stNeardupSql: String =
    s"""WITH ${graft.queries.DedupQueries.sqlBandedCtes},
      bb0 AS (SELECT doc_id, doc_id % 3 AS batch, b, ${(0 until graft.queries.DedupQueries.LshParams._2 / graft.queries.DedupQueries.LshParams._3)
        .map(r => s"s$r")
        .mkString(", ")} FROM banded),
      hit AS (SELECT a.doc_id, a.batch, a.b, min(bb.doc_id) AS partner
        FROM bb0 a LEFT JOIN bb0 bb
          ON a.b = bb.b AND ${graft.queries.DedupQueries.sqlBandEq} AND bb.batch < a.batch
        GROUP BY a.doc_id, a.batch, a.b)
      SELECT doc_id, batch::BIGINT AS batch,
        count(partner)::BIGINT AS n_band_hits,
        count(partner) > 0 AS is_neardup,
        coalesce(min(partner), -1)::BIGINT AS partner
      FROM hit GROUP BY doc_id, batch ORDER BY doc_id"""

  /** STATELESS streaming blocklist gate — the crawl-policy filter applied
    * at ingest time instead of in the batch sweep
    * ([[graft.queries.WebQueries.taBlockfilter]] is the batch twin; both
    * read the SAME planting column and blocklist constant, so the two
    * paths cannot drift). Per micro-batch row: extract outlinks, derive
    * the host's label-suffix chain, and test every suffix against the
    * (tiny, fixed) blocklist INLINE with `isInCollection` — no join, no
    * aggregation, no state store, so the stream runs unbounded and
    * exactly-once comes free with an idempotent sink. Emits the BLOCK LOG
    * (one row per blocked outlink with its most-specific matching rule) —
    * the stream a crawl pipeline tees to its audit store; the keep
    * decision downstream is an anti-join against this log or the same
    * expression inverted.
    */
  def stBlockfilter(spark: SparkSession, dir: String): DataFrame = {
    spark.streams.active.filter(_.name == "st_blockfilter").foreach(_.stop())
    withStreamConfs(spark) {
      val rawSchema = graft.queries.Tables.schemaOf(spark, dir, "documents")
      val urls = spark.readStream
        .schema(rawSchema)
        .parquet(s"$dir/documents*.parquet")
        .select(
          col("doc_id"),
          explode(
            regexp_extract_all(
              graft.queries.WebQueries.urlText,
              lit(graft.functions.WebText.UrlRe),
              lit(0))).as("url"))
        .select(col("doc_id"), col("url"),
          graft.functions.WebText.urlDomain(col("url")).as("host"))
      val blocked = urls
        .withColumn("labels", split(col("host"), "\\."))
        .withColumn(
          "matched",
          // try_element_at: ANSI mode makes element_at THROW on the empty
          // match list (unblocked hosts — most rows); null is the signal.
          try_element_at(
            filter(
              transform(
                sequence(lit(1), size(col("labels"))),
                j => concat_ws(".", slice(col("labels"), j, size(col("labels")) - j + 1))),
              s => s.isInCollection(graft.queries.WebQueries.Blocklist)),
            lit(1)))
        .filter(col("matched").isNotNull)
        .select(col("doc_id"), col("url"), col("matched"))
      runAppendToMemory(blocked, "st_blockfilter")
    }
    spark.table("st_blockfilter").orderBy("doc_id", "url")
  }

  val stBlockfilterSql: String = {
    import graft.functions.WebText.{HostRe, UrlRe}
    val blList = graft.queries.WebQueries.Blocklist.map(s => s"'$s'").mkString(", ")
    raw"""WITH t AS (SELECT doc_id, ${graft.queries.WebQueries.urlTextSql} AS t FROM documents),
      u AS (SELECT doc_id, unnest(regexp_extract_all(t, '$UrlRe')) AS url FROM t),
      d AS (SELECT doc_id, url,
          regexp_replace(lower(regexp_extract(url, '$HostRe', 1)), '^www\.', '') AS host
        FROM u),
      m AS (SELECT doc_id, url,
          list_filter(list_transform(range(1, len(string_split(host, '.')) + 1),
            j -> array_to_string(string_split(host, '.')[j:], '.')),
            x -> x IN ($blList)) AS ms
        FROM d)
      SELECT doc_id, url, ms[1] AS matched FROM m WHERE len(ms) > 0
      ORDER BY doc_id, url"""
  }

  /** STATELESS streaming CLIP-score gate — the alignment filter applied at
    * embedding-ingest time instead of in the batch sweep
    * ([[graft.queries.SourceQueries.mmClipfilter]] is the batch twin; both
    * call the SAME [[graft.queries.SourceQueries.clipScore]] expression
    * and threshold constant, so the scoring cannot drift; the INPUT
    * contract is that embeddings is the pair table — every vec_id has a
    * caption row, which the harness tables satisfy by construction and
    * the Round11BatchSpec stream==batch equality would catch if broken;
    * a production feed with orphan embeddings would filter them upstream
    * rather than pay a join inside the stateless gate). Per micro-batch
    * row: one scalar cosine fold, no join, no state store —
    * the stream runs unbounded, exactly-once comes free with an
    * idempotent sink. Emits the REJECT LOG (pairs under the threshold) —
    * what a multimodal ingest tees to its audit store; keeps are the
    * complement.
    */
  def stClipfilter(spark: SparkSession, dir: String): DataFrame = {
    spark.streams.active.filter(_.name == "st_clipfilter").foreach(_.stop())
    withStreamConfs(spark) {
      val schema = graft.queries.Tables.schemaOf(spark, dir, "embeddings")
      val rejects = spark.readStream
        .schema(schema)
        .parquet(s"$dir/embeddings*.parquet")
        .select(col("vec_id").as("doc_id"), col("embedding").cast("array<double>").as("v"))
        .select(
          col("doc_id"),
          graft.queries.SourceQueries.clipScore(col("doc_id"), col("v")).as("clip_score"))
        .filter(col("clip_score") < graft.queries.SourceQueries.ClipThreshold)
      runAppendToMemory(rejects, "st_clipfilter")
    }
    spark.table("st_clipfilter").orderBy("doc_id")
  }

  val stClipfilterSql: String =
    s"""WITH e AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v FROM embeddings),
      ${graft.queries.SourceQueries.clipScoreCtes("e", "doc_id")}
      SELECT doc_id, clip_score FROM c
      WHERE clip_score < ${graft.queries.SourceQueries.ClipThreshold}
      ORDER BY doc_id"""

  /** STATELESS streaming synthetic-text screen
    * ([[graft.queries.WebQueries.taSynthetic]]'s ingest-time twin — same
    * planting column and marker bank, the paths cannot drift): per
    * micro-batch row, the fixed `contains` probe bank inline — no join,
    * no state store; emits the FLAG LOG (one row per flagged document
    * with its marker count) a crawl ingest tees to quarantine.
    */
  def stSynthetic(spark: SparkSession, dir: String): DataFrame = {
    spark.streams.active.filter(_.name == "st_synthetic").foreach(_.stop())
    withStreamConfs(spark) {
      val rawSchema = graft.queries.Tables.schemaOf(spark, dir, "documents")
      val markers = graft.queries.WebQueries.SyntheticMarkers
      val flagged = spark.readStream
        .schema(rawSchema)
        .parquet(s"$dir/documents*.parquet")
        .select(
          col("doc_id"),
          col("source"),
          graft.queries.WebQueries.syntheticText.as("t"))
        .select(
          col("doc_id"),
          col("source"),
          markers.map(m => col("t").contains(m).cast("long")).reduce(_ + _).as("n_markers"))
        .filter(col("n_markers") > 0)
      runAppendToMemory(flagged, "st_synthetic")
    }
    spark.table("st_synthetic").orderBy("doc_id")
  }

  val stSyntheticSql: String = {
    val markerSum = graft.queries.WebQueries.SyntheticMarkers
      .map(m => s"CASE WHEN contains(t, '$m') THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH t AS (SELECT doc_id, source,
        ${graft.queries.WebQueries.syntheticTextSql} AS t FROM documents),
      m AS (SELECT doc_id, source, ($markerSum)::BIGINT AS n_markers FROM t)
      SELECT doc_id, source, n_markers FROM m WHERE n_markers > 0
      ORDER BY doc_id"""
  }

  /** STATELESS streaming Fellegi–Sunter scoring — incremental record
    * linkage at ingest time: each arriving document probes the STATIC
    * reference corpus for blocked candidates (same lang, n_chars bucket
    * within ±1 — the er blocking gate, expressed as an exploded band-key
    * EQUI-join so the static side is a plain hash join, never a range
    * scan), computes the 3-field agreement pattern, and attaches the
    * pattern's likelihood-ratio weight from the 8-row FS weight table
    * ([[graft.queries.ErQueries.erFellegi]] — trained in batch, shipped
    * as a broadcast; exactly how a production linkage service serves
    * weights). The keep gate is INTEGER (≥ 2 agreeing fields); the
    * weight rides along as payload. Per micro-batch: one broadcast hash
    * join + one 8-row lookup, no state store — runs unbounded.
    */
  def stFellegi(spark: SparkSession, dir: String): DataFrame = {
    spark.streams.active.filter(_.name == "st_fellegi").foreach(_.stop())
    val weights = graft.queries.ErQueries
      .erFellegi(spark, dir)
      .select(col("pattern"), col("weight"))
    withStreamConfs(spark) {
      val rawSchema = graft.queries.Tables.schemaOf(spark, dir, "documents")
      def fields(df: DataFrame, p: String): DataFrame =
        df.select(
          col("doc_id").as(s"${p}_id"),
          col("lang"),
          col("source").as(s"${p}_source"),
          floor(col("n_chars") / graft.queries.ErQueries.BucketWidth).as(s"${p}_bucket"),
          element_at(split(col("text"), "\\s+"), 1).as(s"${p}_fw"))
      val stat = fields(Tables.t(spark, dir, "documents"), "a")
        .withColumnRenamed("a_bucket", "band")
        .withColumn("a_bucket", col("band"))
      val stream = fields(
        spark.readStream.schema(rawSchema).parquet(s"$dir/documents*.parquet"),
        "b")
        .withColumn("band", explode(array(col("b_bucket") - 1, col("b_bucket"), col("b_bucket") + 1)))
      val scoredPairs = stream
        .join(stat, Seq("lang", "band"))
        .filter(col("a_id") < col("b_id"))
        .select(
          col("a_id"),
          col("b_id"),
          when(col("a_source") === col("b_source"), 1L).otherwise(0L).as("ag_source"),
          when(col("a_bucket") === col("b_bucket"), 1L).otherwise(0L).as("ag_bucket"),
          when(col("a_fw") === col("b_fw"), 1L).otherwise(0L).as("ag_firstword"))
        .filter(col("ag_source") + col("ag_bucket") + col("ag_firstword") >= 2)
        .withColumn(
          "pattern",
          col("ag_source") * 4 + col("ag_bucket") * 2 + col("ag_firstword"))
        .join(broadcast(weights), Seq("pattern"))
        .select("a_id", "b_id", "ag_source", "ag_bucket", "ag_firstword", "pattern", "weight")
      runAppendToMemory(scoredPairs, "st_fellegi")
    }
    spark.table("st_fellegi").orderBy("a_id", "b_id")
  }

  val stFellegiSql: String =
    s"""WITH f AS MATERIALIZED (${graft.queries.ErQueries.fellegiSql}),
      dd2 AS MATERIALIZED (SELECT doc_id, lang, source, n_chars // ${graft.queries.ErQueries.BucketWidth} AS bucket,
          string_split_regex(text, '\\s+')[1] AS fw
        FROM documents),
      pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          CASE WHEN a.source = b.source THEN 1 ELSE 0 END::BIGINT AS ag_source,
          CASE WHEN a.bucket = b.bucket THEN 1 ELSE 0 END::BIGINT AS ag_bucket,
          CASE WHEN a.fw = b.fw THEN 1 ELSE 0 END::BIGINT AS ag_firstword
        FROM dd2 a JOIN dd2 b
          ON a.lang = b.lang AND abs(a.bucket - b.bucket) <= 1 AND a.doc_id < b.doc_id)
      SELECT pr.a_id, pr.b_id, pr.ag_source, pr.ag_bucket, pr.ag_firstword,
        (pr.ag_source * 4 + pr.ag_bucket * 2 + pr.ag_firstword)::BIGINT AS pattern,
        f.weight
      FROM pr JOIN f ON f.pattern = pr.ag_source * 4 + pr.ag_bucket * 2 + pr.ag_firstword
      WHERE pr.ag_source + pr.ag_bucket + pr.ag_firstword >= 2
      ORDER BY pr.a_id, pr.b_id"""

  /** Streaming per-dimension embedding moment monitor — the ingest-time
    * twin of `emb_dimstats` (the two share
    * [[graft.queries.AnnQueries.dimMomentsRaw]], so the quantization and
    * moment arithmetic cannot drift): a COMPLETE-mode 64-group stateful
    * aggregate whose state is three BIGINTs per dimension — O(dims),
    * never O(rows) — exactly the dead-dimension / scale-drift gauge an
    * embedding feed exposes next to `st_drift`'s doc-quality histogram.
    * Final table equals the batch result by construction (exact integer
    * moments commute with micro-batching).
    */
  def stDimstats(spark: SparkSession, dir: String): DataFrame = {
    spark.streams.active.filter(_.name == "st_dimstats").foreach(_.stop())
    withStreamConfs(spark) {
      val schema = graft.queries.Tables.schemaOf(spark, dir, "embeddings")
      val agg = graft.queries.AnnQueries.dimMomentsRaw(
        spark.readStream.schema(schema).parquet(s"$dir/embeddings*.parquet"))
      val q = agg.writeStream
        .format("memory")
        .queryName("st_dimstats")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    graft.queries.AnnQueries.dimMomentsFinish(spark.table("st_dimstats"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_dimstats" -> stDimstats _,
    "st_fellegi" -> stFellegi _,
    "st_synthetic" -> stSynthetic _,
    "st_clipfilter" -> stClipfilter _,
    "st_blockfilter" -> stBlockfilter _,
    "st_neardup" -> stNeardup _,
    "st_hashclf" -> stHashclf _,
    "st_annindex" -> stAnnindex _,
    "st_drift" -> stDrift _,
    "st_late" -> stLate _,
    "st_replay" -> stReplay _,
    "st_quota" -> stQuota _,
    "st_funnel" -> stFunnel _,
    "st_anomaly" -> stAnomaly _,
    "st_cdc" -> stCdc _,
    "st_topk" -> stTopk _,
    "st_sink" -> stSink _,
    "st_hourly" -> stHourly _,
    "st_join" -> stJoin _,
    "st_outer" -> stOuter _,
    "st_dedup" -> stDedup _,
    "st_session" -> stSession _,
    "st_enrich" -> stEnrich _)

  val oracles: Map[String, String] = Map(
    // stream == batch by construction: the batch twin's oracle IS the
    // stream's oracle
    "st_dimstats" -> graft.queries.AnnQueries.embDimstatsSql,
    "st_fellegi" -> stFellegiSql,
    "st_synthetic" -> stSyntheticSql,
    "st_clipfilter" -> stClipfilterSql,
    "st_blockfilter" -> stBlockfilterSql,
    "st_neardup" -> stNeardupSql,
    "st_hashclf" -> stHashclfSql,
    "st_annindex" -> stAnnindexSql,
    "st_drift" -> stDriftSql,
    "st_late" -> stLateSql,
    "st_replay" -> stReplaySql,
    "st_quota" -> stQuotaSql,
    "st_funnel" -> stFunnelSql,
    "st_anomaly" -> stAnomalySql,
    "st_cdc" -> stCdcSql,
    "st_topk" -> stTopkSql,
    "st_hourly" -> stHourlySql,
    "st_join" -> stJoinSql,
    "st_outer" -> stOuterSql,
    "st_dedup" -> stDedupSql,
    "st_session" -> stSessionSql,
    "st_enrich" -> stEnrichSql,
    "st_sink" -> stSinkSql)
}
