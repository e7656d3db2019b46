package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage over the TPC-H-ish harness tables — one
  * query per SURVEY.md §2 operator class, each with a DuckDB oracle.
  *
  * Cross-engine discipline:
  *  - money sums aggregate through DECIMAL(18,2) (exact, order-independent)
  *    and convert to double once at the end — bitwise identical both engines;
  *  - timestamps are emitted as formatted strings (Spark reads the
  *    nanosecond-precision events table at microsecond precision; DuckDB
  *    keeps nanos — formatting at second/hour granularity erases the gap);
  *  - DuckDB `count(*)`/`len()` are BIGINT, so Spark int results cast to long;
  *  - every query ends in a deterministic ORDER BY.
  *
  * Scale notes are per query; `broadcast()` marks the dimension side of
  * star joins so 100 TB fact tables never shuffle for them.
  */
object RelationalQueries {
  import Tables.{t, events}

  // ---- A1/A3: multi-key aggregate ----------------------------------------

  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
      sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sum_price,
      count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""

  // ---- F1/F2/P1/P5: range + substring filter, projection, cast -----------
  // Filters and the 4-column projection both push into the parquet scan
  // (PushedFilters + pruned ReadSchema).

  def q2Filter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_returnflag") === "R" && col("l_discount") > lit(0.05))
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("line_no"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"),
        col("l_extendedprice").as("price"))
      .orderBy("l_orderkey", "line_no")

  val q2FilterSql: String =
    """SELECT l_orderkey, l_linenumber::BIGINT AS line_no,
      strftime(l_shipdate, '%Y-%m-%d') AS ship_day, l_extendedprice AS price
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_returnflag = 'R' AND l_discount > 0.05
      ORDER BY l_orderkey, line_no"""

  // ---- J3 + A1: broadcast equi-join + aggregate ---------------------------
  // customer is the small dimension: broadcast it so the orders fact side
  // never shuffles. At 100 TB the fact table streams map-side.

  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("c_mktsegment")
  }

  val q3JoinAggSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // ---- J4: left-semi (EXISTS) ---------------------------------------------

  def q4Semi(spark: SparkSession, dir: String): DataFrame = {
    val customer = t(spark, dir, "customer")
    val bigOrders = t(spark, dir, "orders").filter(col("o_totalprice") > 400000)
    customer
      .join(bigOrders, customer("c_custkey") === bigOrders("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  val q4SemiSql: String =
    """SELECT c_mktsegment, count(*) AS n_customers FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // ---- J4: left-anti (NOT EXISTS) -----------------------------------------

  def q5Anti(spark: SparkSession, dir: String): DataFrame = {
    val customer = t(spark, dir, "customer")
    val early = t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1995-03-01").cast("timestamp"))
    customer
      .join(early, customer("c_custkey") === early("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  val q5AntiSql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderdate < TIMESTAMP '1995-03-01')
      ORDER BY c_custkey"""

  // ---- J1: cross join (tiny dims — BroadcastNestedLoop) -------------------

  def q6Cross(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "region")
      .crossJoin(t(spark, dir, "nation"))
      .select(col("r_name"), col("n_name"))
      .orderBy("r_name", "n_name")

  val q6CrossSql: String =
    "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name"

  // ---- O1/A4: union + distinct --------------------------------------------

  def q7Union(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      .union(t(spark, dir, "customer").select(col("c_nationkey")))
      .distinct()
      .orderBy("nationkey")

  val q7UnionSql: String =
    """SELECT s_nationkey AS nationkey FROM supplier
      UNION SELECT c_nationkey FROM customer ORDER BY nationkey"""

  // ---- O2: intersect ------------------------------------------------------

  def q8Intersect(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").filter(col("o_totalprice") > 450000).select(col("o_custkey"))
      .intersect(
        t(spark, dir, "orders").filter(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy("o_custkey")

  val q8IntersectSql: String =
    """SELECT o_custkey FROM orders WHERE o_totalprice > 450000
      INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY o_custkey"""

  // ---- O3: except ---------------------------------------------------------

  def q9Except(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part").select(col("p_partkey"))
      .except(t(spark, dir, "lineitem").filter(col("l_quantity") >= 45).select(col("l_partkey")))
      .orderBy("p_partkey")

  val q9ExceptSql: String =
    """SELECT p_partkey FROM part
      EXCEPT SELECT l_partkey FROM lineitem WHERE l_quantity >= 45
      ORDER BY p_partkey"""

  // ---- A2: pivot (explicit values — no distinct-values pre-job) -----------

  def q10Pivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("order_year", year(col("o_orderdate")).cast("long"))
      .groupBy("order_year")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy("order_year")

  val q10PivotSql: String =
    """SELECT year(o_orderdate)::BIGINT AS order_year,
      count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
      count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
      count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      FROM orders GROUP BY order_year ORDER BY order_year"""

  // ---- §2.7 window functions (free from Spark; covered for completeness) --

  def q11Window(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("top_order"), col("o_totalprice").as("top_price"))
      .orderBy("o_custkey")
  }

  val q11WindowSql: String =
    """SELECT o_custkey, o_orderkey AS top_order, o_totalprice AS top_price
      FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) rn
            FROM orders) WHERE rn = 1 ORDER BY o_custkey"""

  // ---- sort + limit (top-k via TakeOrderedAndProject) ---------------------

  def q12TopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("line_no"), col("l_extendedprice"))
      .limit(100)

  val q12TopKSql: String =
    """SELECT l_orderkey, l_linenumber::BIGINT AS line_no, l_extendedprice
      FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100"""

  // ---- events: hourly rollup (batch twin of the streaming windowed agg) ---

  def q13Hourly(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("hour", "event_type")

  val q13HourlySql: String =
    """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type, count(*) AS n,
      sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS total_value
      FROM events GROUP BY hour, event_type ORDER BY hour, event_type"""

  // ---- events: sessionization (gaps-and-islands over window functions) ----
  // 30-minute inactivity gap; microsecond epochs on both engines (Spark
  // truncates the nanos column to micros on read; sub-us ties are absent).

  def q14Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn(
        "new_session",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(
        sum(col("new_session")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  // NOTE: DuckDB sum(INTEGER) yields HUGEINT (int128) — the driver's
  // materialization coerces that to float, so hashes diverge from Spark's
  // int64 even when values agree (r1 q14 hash_match=false). Cast to BIGINT.
  val q14SessionizeSql: String =
    """SELECT user_id, sum(new_session)::BIGINT AS n_sessions, count(*) AS n_events
      FROM (SELECT user_id,
              CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
            FROM (SELECT user_id, ts,
                    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
                  FROM events))
      GROUP BY user_id ORDER BY user_id"""

  // ---- as-of join (events x events; the time-series join Spark lacks) -----
  // For each purchase, the most recent view by the same user at or before
  // the purchase time. Implemented the scalable way: tag both sides, union,
  // one shuffle+sort per user, and a running `last(ignoreNulls)` window —
  // no per-pair product, no range join. Views are pre-deduped to one per
  // (user, instant) (keep max event_id) so ties are deterministic; DuckDB's
  // native ASOF JOIN is the oracle.

  def q15Asof(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event"), col("user_id"), col("ts"))
    // Pre-aggregating the build side to unique (user_id, ts) makes the
    // at-equal-time winner deterministic (see AsOfJoin's tie-break note).
    val views = ev
      .filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("v_event"))
    graft.operators.AsOfJoin
      .asOf(purchases, views, "user_id", "ts", Seq("v_event"))
      .filter(col("v_event").isNotNull)
      .select(
        col("p_event"),
        col("user_id"),
        col("v_event"),
        (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
      .orderBy("p_event")
  }

  val q15AsofSql: String =
    """WITH v AS (SELECT user_id, ts, max(event_id) AS v_event
                  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
         p AS (SELECT event_id AS p_event, user_id, ts
               FROM events WHERE event_type = 'purchase')
      SELECT p.p_event, p.user_id, v.v_event,
             epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
      FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      ORDER BY p_event"""

  // ---- rollup (hierarchical subtotals; NULL marks the rolled-up level) ----

  def q16Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("order_year", year(col("o_orderdate")).cast("long"))
      .rollup("order_year", "o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy(col("order_year").asc_nulls_first, col("o_orderstatus").asc_nulls_first)

  val q16RollupSql: String =
    """SELECT year(o_orderdate)::BIGINT AS order_year, o_orderstatus,
      count(*) AS n_orders,
      sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS revenue
      FROM orders
      GROUP BY ROLLUP(year(o_orderdate)::BIGINT, o_orderstatus)
      ORDER BY order_year NULLS FIRST, o_orderstatus NULLS FIRST"""

  // ---- explode/unnest + re-aggregate (token frequency over documents) -----

  def q17Explode(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(graft.functions.TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy("token")

  val q17ExplodeSql: String =
    raw"""SELECT t AS token, count(*) AS n
      FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS t
            FROM documents)
      GROUP BY t ORDER BY token"""

  // ---- CSV sink + scan round-trip (K2 writer + S3 reader coverage) --------
  // Writes a single-file TSV via the Hadoop-rename writer, reads it back
  // with an explicit schema, and aggregates — doubles survive the text
  // round-trip exactly (Java shortest-roundtrip formatting), so the oracle
  // over the original parquet must hash-match.

  def q18CsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))
    val dest = SessionMemo.tmpDir(spark, "q18_csv")
    graft.output.Writers.writeCsvRenamed(src, dest, "customers.csv")
    spark.read
      .option("header", "true")
      .option("delimiter", "\t")
      .schema(src.schema)
      .csv(s"$dest/customers.csv")
      .filter(col("c_acctbal") > 0)
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"))
      .orderBy("c_mktsegment")
  }

  val q18CsvRoundtripSql: String =
    """SELECT c_mktsegment, count(*) AS n_customers,
      sum(CAST(c_acctbal AS DECIMAL(18,2)))::DOUBLE AS total_bal
      FROM customer WHERE c_acctbal > 0
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // ---- JSON column extraction (semi-structured props on events) -----------

  def q19Json(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"))
      .orderBy("k")

  val q19JsonSql: String =
    """SELECT json_extract(props, '$.k')::BIGINT AS k, count(*) AS n
      FROM events GROUP BY k ORDER BY k"""

  // ---- distinct aggregates (Expand-based multi-distinct planning) ---------

  def q20Ndv(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("ndv_part"),
        countDistinct(col("l_suppkey")).as("ndv_supp"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  val q20NdvSql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS ndv_part,
      count(DISTINCT l_suppkey) AS ndv_supp, count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---- SQL frontend: correlated subquery through spark.sql ----------------
  // The engine's full ANSI surface comes free with Catalyst; this pins the
  // temp-view + correlated-EXISTS + scalar-subquery path explicitly.

  def q21Sql(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_v")
    t(spark, dir, "customer").createOrReplaceTempView("customer_v")
    spark.sql("""
      SELECT c_mktsegment, count(*) AS n_above
      FROM customer_v c
      WHERE EXISTS (
        SELECT 1 FROM orders_v o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_totalprice > (SELECT avg(o_totalprice) FROM orders_v))
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }

  val q21SqlSql: String =
    """SELECT c_mktsegment, count(*) AS n_above
      FROM customer c
      WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_totalprice > (SELECT avg(o_totalprice) FROM orders))
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // ---- running window frame (rows unbounded-preceding running sum) --------

  def q22Running(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("running_spend"),
        row_number().over(w).cast("long").as("order_seq"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q22RunningSql: String =
    """SELECT o_custkey, o_orderkey,
      sum(CAST(o_totalprice AS DECIMAL(18,2)))
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS UNBOUNDED PRECEDING)::DOUBLE AS running_spend,
      row_number()
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
      FROM orders WHERE o_custkey < 100
      ORDER BY o_custkey, o_orderkey"""

  // ---- JSON file source round-trip (json sink + schema-inferring scan) ----

  def q23JsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val dest = SessionMemo.tmpDir(spark, "q23_json")
    t(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .coalesce(1)
      .write.mode("overwrite").json(dest)
    spark.read
      .json(dest)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy("n_nationkey")
  }

  // JSON numbers infer as BIGINT on read-back; cast the oracle to match.
  val q23JsonRoundtripSql: String =
    """SELECT n_nationkey::BIGINT AS n_nationkey, n_name,
      n_regionkey::BIGINT AS n_regionkey FROM nation ORDER BY n_nationkey"""

  // ---- partitioned parquet sink + partition-pruned scan -------------------
  // Hive-style partition layout; the read-back filter on the partition
  // column prunes to one directory (visible as PartitionFilters in the
  // scan). The partitioning strategy a 100 TB event store would use.

  def q24Partitioned(spark: SparkSession, dir: String): DataFrame = {
    val dest = SessionMemo.tmpDir(spark, "q24_part")
    events(spark, dir).write.mode("overwrite").partitionBy("event_type").parquet(dest)
    spark.read
      .parquet(dest)
      .filter(col("event_type") === "click")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_clicks"))
      .orderBy("user_id")
  }

  val q24PartitionedSql: String =
    """SELECT user_id, count(*) AS n_clicks FROM events
      WHERE event_type = 'click' GROUP BY user_id ORDER BY user_id"""

  // ---- bucketed tables: co-located (shuffle-free) fact-dim join -----------
  // Both sides bucketed+sorted on the join key into the same bucket count:
  // the join needs no Exchange (asserted in BucketedJoinSpec). At 100 TB
  // this is how repeated joins amortize their shuffle to write time.

  def q25Bucketed(spark: SparkSession, dir: String): DataFrame = {
    Tables.dropTable(spark, "graft_orders_b")
    Tables.dropTable(spark, "graft_customer_b")
    t(spark, dir, "orders")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("graft_orders_b")
    t(spark, dir, "customer")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("graft_customer_b")
    spark
      .table("graft_orders_b")
      .join(spark.table("graft_customer_b"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("c_mktsegment")
  }

  // Same relational answer as the broadcast-join variant (q3) — the
  // bucketed path must agree with it.
  val q25BucketedSql: String = q3JoinAggSql

  // ---- ORC sink + scan round-trip -----------------------------------------

  def q27OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val dest = SessionMemo.tmpDir(spark, "q27_orc")
    t(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
      .write.mode("overwrite").orc(dest)
    spark.read
      .orc(dest)
      .groupBy("s_nationkey")
      .agg(
        count(lit(1)).as("n_suppliers"),
        sum(col("s_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"))
      .orderBy("s_nationkey")
  }

  val q27OrcRoundtripSql: String =
    """SELECT s_nationkey, count(*) AS n_suppliers,
      sum(CAST(s_acctbal AS DECIMAL(18,2)))::DOUBLE AS total_bal
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"""

  // ---- custom typed Aggregator (UDAF surface) -----------------------------
  // Exact-decimal sum of squares: order-independent partials, so the
  // distributed aggregation is bit-deterministic and oracle-replayable.

  def q26Udaf(spark: SparkSession, dir: String): DataFrame = {
    val sumSq = udaf(graft.functions.SumSquares)
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(sumSq(col("l_quantity")).as("sum_sq"), count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  val q26UdafSql: String =
    """SELECT l_returnflag,
      sum(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)))::DOUBLE AS sum_sq,
      count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---- sketches / approximate aggregates ----------------------------------
  // HLL++ NDV, a DataSketches HLL estimate, and an approximate median —
  // FULLY oracle-gated despite being approximations: approximate answers
  // differ across engines, but their ERROR BOUNDS don't. The query emits
  // the exact anchors (count-distincts, row count) plus boolean verdicts
  // asserting each sketch lands within its bound of the exact value
  // computed in the same job; the DuckDB oracle recomputes the exact
  // anchors independently and expects every verdict TRUE — so the exact
  // columns hash-verify against DuckDB and a broken/degraded sketch flips
  // a verdict and fails the hash. ε = 5 % for the NDV sketches (both are
  // configured well inside that), and the approximate median must land
  // between the exact 40th and 60th percentiles (percentile_approx's rank
  // error at accuracy 1000 is 0.1 %).

  def q28Sketch(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_suppkey")).as("exact_supps"),
        approx_count_distinct(col("l_partkey")).as("acd"),
        hll_sketch_estimate(hll_sketch_agg(col("l_suppkey"))).as("hll"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50a"),
        percentile(col("l_extendedprice"), lit(0.4)).as("p40"),
        percentile(col("l_extendedprice"), lit(0.6)).as("p60"))
      .select(
        col("l_returnflag"),
        col("n_rows"),
        col("exact_parts"),
        col("exact_supps"),
        (abs(col("acd") - col("exact_parts")) <= lit(0.05) * col("exact_parts")).as("ndv_ok"),
        (abs(col("hll") - col("exact_supps")) <= lit(0.05) * col("exact_supps")).as("hll_ok"),
        (col("p50a") >= col("p40") && col("p50a") <= col("p60")).as("p50_ok"))
      .orderBy("l_returnflag")

  val q28SketchSql: String =
    """SELECT l_returnflag, count(*) AS n_rows,
      count(DISTINCT l_partkey) AS exact_parts,
      count(DISTINCT l_suppkey) AS exact_supps,
      TRUE AS ndv_ok, TRUE AS hll_ok, TRUE AS p50_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Mergeable-sketch pre-aggregation — the pattern that makes NDV
    * dashboards feasible at 100 TB: build ONE Datasketches HLL sketch per
    * (flag, month) partition (the "silver" sketch table a pipeline
    * materializes incrementally, one month at a time), then answer the
    * all-time question by `hll_union_agg` over the tiny sketch frame —
    * the raw fact table is scanned once per month ever, never per query.
    * Correctness is gated like [[q28Sketch]]: the merged estimate must
    * land within 5% of the exact global distinct count, emitted as a
    * boolean the DuckDB oracle pins to TRUE (plus the exact counts, which
    * both engines compute exactly).
    */
  def q102SketchMerge(spark: SparkSession, dir: String): DataFrame = {
    val monthly = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), date_trunc("month", col("l_shipdate")).as("m"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
    val merged = monthly
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_months"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    merged
      .join(exact, "l_returnflag")
      .select(
        col("l_returnflag"),
        col("n_months"),
        col("exact_parts"),
        (abs(col("est") - col("exact_parts")) <= lit(0.05) * col("exact_parts"))
          .as("merge_ok"))
      .orderBy("l_returnflag")
  }

  val q102SketchMergeSql: String =
    """SELECT l_returnflag,
      count(DISTINCT date_trunc('month', l_shipdate))::BIGINT AS n_months,
      count(DISTINCT l_partkey) AS exact_parts, TRUE AS merge_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---- scalar-function breadth: strings -----------------------------------

  def q29Strings(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .filter(col("c_custkey") < 200)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("u"),
        lower(col("c_mktsegment")).as("l"),
        substring(col("c_name"), 1, 8).as("sub"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("digits_folded"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        levenshtein(col("c_name"), col("c_mktsegment")).cast("long").as("lev"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
        length(trim(col("c_name"))).cast("long").as("trimmed_len"),
        reverse(col("c_mktsegment")).as("rev"))
      .orderBy("c_custkey")

  val q29StringsSql: String =
    """SELECT c_custkey, upper(c_name) AS u, lower(c_mktsegment) AS l,
      substr(c_name, 1, 8) AS sub,
      regexp_replace(c_name, '[0-9]+', '#', 'g') AS digits_folded,
      lpad(c_custkey::VARCHAR, 8, '0') AS padded,
      levenshtein(c_name, c_mktsegment) AS lev,
      concat_ws('|', c_mktsegment, c_name) AS joined,
      length(trim(c_name)) AS trimmed_len,
      reverse(c_mktsegment) AS rev
      FROM customer WHERE c_custkey < 200 ORDER BY c_custkey"""

  // ---- scalar-function breadth: date/time ---------------------------------

  def q30Datetime(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("d_plus30"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        datediff(lit("2000-01-01").cast("timestamp"), col("o_orderdate")).cast("long").as("days_to_y2k"))
      .orderBy("o_orderkey")

  val q30DatetimeSql: String =
    """SELECT o_orderkey,
      strftime(o_orderdate, '%Y-%m-%d') AS d,
      strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS d_plus30,
      strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
      year(o_orderdate) AS y, quarter(o_orderdate) AS q,
      dayofweek(o_orderdate) + 1 AS dow,
      datediff('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k
      FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey"""

  // ---- ranking-window breadth (rank/dense_rank/ntile/percent_rank) --------

  def q31Ranks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(spark, dir, "customer")
      .filter(col("c_custkey") < 300)
      .select(
        col("c_custkey"),
        col("c_mktsegment"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"))
      .orderBy("c_custkey")
  }

  val q31RanksSql: String =
    """SELECT c_custkey, c_mktsegment,
      rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
      ntile(4) OVER w AS quartile, percent_rank() OVER w AS prank,
      cume_dist() OVER w AS cdist
      FROM customer WHERE c_custkey < 300
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_custkey"""

  // ---- conditional aggregates (filtered counts, boolean aggs) -------------

  def q32Conditional(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
        sum(when(col("o_totalprice") > 300000, 1L).otherwise(0L)).as("n_large"),
        max(col("o_orderstatus") === "P").as("any_pending"),
        min(col("o_totalprice") > 0).as("all_positive"))
      .orderBy("o_orderpriority")

  val q32ConditionalSql: String =
    """SELECT o_orderpriority,
      count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
      count(*) FILTER (WHERE o_totalprice > 300000) AS n_large,
      bool_or(o_orderstatus = 'P') AS any_pending,
      bool_and(o_totalprice > 0) AS all_positive
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- null-handling functions --------------------------------------------
  // nullif/coalesce/nvl2 chains over a column that is null-free in the
  // data, made nullable via nullif — exercises null propagation end to end.

  def q33Nulls(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_partkey") < 300)
      .select(
        col("p_partkey"),
        nullif(col("p_size"), lit(10)).as("size_or_null"),
        coalesce(nullif(col("p_size"), lit(10)), lit(-1)).as("size_coalesced"),
        when(nullif(col("p_size"), lit(10)).isNull, "was-ten")
          .otherwise("kept").as("tag"),
        nvl2(nullif(col("p_size"), lit(10)), lit("has"), lit("null")).as("nvl2_tag"))
      .orderBy("p_partkey")

  val q33NullsSql: String =
    """SELECT p_partkey,
      nullif(p_size, 10) AS size_or_null,
      coalesce(nullif(p_size, 10), -1) AS size_coalesced,
      CASE WHEN nullif(p_size, 10) IS NULL THEN 'was-ten' ELSE 'kept' END AS tag,
      CASE WHEN nullif(p_size, 10) IS NOT NULL THEN 'has' ELSE 'null' END AS nvl2_tag
      FROM part WHERE p_partkey < 300 ORDER BY p_partkey"""

  // ---- array-function breadth ---------------------------------------------
  // Over the documents token arrays. Parity notes: Spark's array_position
  // returns 0 when absent vs DuckDB list_position's NULL (coalesced);
  // both engines' slice/join/sort/min/max line up directly.

  def q34Arrays(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.functions.TextAnalysis.tokens(col("text"))
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        array_position(toks, "the").as("pos_the"),
        array_contains(toks, "and").as("has_and"),
        concat_ws("_", slice(toks, 1, 3)).as("first3"),
        array_join(sort_array(array_distinct(toks)), " ").as("sorted_vocab"),
        array_min(toks).as("tok_min"),
        array_max(toks).as("tok_max"),
        size(flatten(array(toks, toks))).cast("long").as("doubled_len"))
      .orderBy("doc_id")
  }

  val q34ArraysSql: String = {
    val tk = raw"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"
    s"""SELECT doc_id,
      coalesce(list_position($tk, 'the'), 0)::BIGINT AS pos_the,
      list_contains($tk, 'and') AS has_and,
      array_to_string(list_slice($tk, 1, 3), '_') AS first3,
      array_to_string(list_sort(list_distinct($tk)), ' ') AS sorted_vocab,
      list_min($tk) AS tok_min,
      list_max($tk) AS tok_max,
      len(list_concat($tk, $tk))::BIGINT AS doubled_len
      FROM documents ORDER BY doc_id"""
  }

  // ---- MapType + from_json ------------------------------------------------
  // Parse the events props JSON into a typed map, explode its entries —
  // covers schema'd JSON parsing, MapType columns, and map_entries.

  /** events props parsed ONCE into a typed map and persisted — the shared
    * input of q35 (map explode) and q60 (map higher-order functions).
    * from_json over every event row is the expensive part of both queries;
    * parsing is not a per-query cost at any scale, it is a materialize-once
    * projection (on a cluster: the silver table you'd write). Memoized per
    * (session, dir) so both queries hit one cache entry.
    */
  private[queries] def parsedProps(spark: SparkSession, dir: String): DataFrame =
    SessionMemo.getOrElseUpdate("props_map", spark, dir) {
      events(spark, dir)
        .select(
          col("event_id"),
          from_json(
            col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")).as("m"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Materialize [[parsedProps]] (see SparkEntry.warm). */
  def warm(spark: SparkSession, dir: String): Unit = {
    parsedProps(spark, dir).count()
    ()
  }

  def q35Map(spark: SparkSession, dir: String): DataFrame =
    parsedProps(spark, dir)
      .select(col("event_id"), explode(col("m")).as(Seq("key", "value")))
      .orderBy("event_id", "key")

  // Generic over ANY key set (json_keys unnest), not the single-key 'k'
  // shape the corpus happens to have — a multi-key props row would still
  // hash-match (the Spark-side chain is additionally pinned on a multi-key
  // fixture in MapHofSpec). Keys are QUOTED into the JSON path so '.'/'['
  // in a key name index the key itself, not a nested path (keys containing
  // a double-quote or backslash are out of scope for the replay).
  val q35MapSql: String =
    """SELECT event_id, k AS key, json_extract(props, '$."' || k || '"')::BIGINT AS value
      FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)
      ORDER BY event_id, key"""

  // ---- deterministic distributed statistics -------------------------------
  // Mean/stddev from EXACT decimal moment sums (Σx, Σx²) with one cast to
  // double at the end: order-independent partials make the distributed
  // result bit-deterministic and oracle-replayable — the built-in
  // float-accumulating stddev is not (merge order varies with
  // partitioning). l_quantity values carry ≤ 2 decimal digits, so the
  // decimal sums are exact.

  def q36Stats(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(18,4)")
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"),
        sum(x * x).as("sxx"))
      .select(
        col("l_returnflag"),
        col("n"),
        (col("sx").cast("double") / col("n")).as("mean"),
        sqrt(
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
            (col("n").cast("double") * (col("n") - 1).cast("double"))).as("stddev"))
      .orderBy("l_returnflag")
  }

  val q36StatsSql: String =
    """SELECT l_returnflag, n, sx::DOUBLE / n AS mean,
      sqrt((n * sxx - sx * sx)::DOUBLE / (n::DOUBLE * (n - 1)::DOUBLE)) AS stddev
      FROM (SELECT l_returnflag, count(*) AS n,
              sum(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
              sum(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS sxx
            FROM lineitem GROUP BY l_returnflag)
      ORDER BY l_returnflag"""

  // ---- RANGE window frames (peer rows aggregate together) -----------------
  // Unlike the ROWS frame of q22, a RANGE frame includes all peers with
  // the same order key — ties aggregate identically for every peer.

  def q37Range(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(col("o_orderdate"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("spend_incl_peers"),
        count(lit(1)).over(w).cast("long").as("n_incl_peers"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q37RangeSql: String =
    """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
      sum(CAST(o_totalprice AS DECIMAL(18,2)))
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE AS spend_incl_peers,
      count(*)
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_incl_peers
      FROM orders WHERE o_custkey < 100
      ORDER BY o_custkey, o_orderkey"""

  // ---- lateral join (correlated subquery in FROM) -------------------------
  // One aggregate subquery evaluated per outer row — the relational shape of
  // "top-of/summary-of per row". Catalyst decorrelates to an outer join +
  // aggregate; DuckDB runs the same LATERAL text.

  def q38Lateral(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("customer_v")
    t(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql("""
      SELECT c.c_custkey, c.c_mktsegment, o.n_orders,
             CAST(o.spend AS DOUBLE) AS spend
      FROM customer_v c,
      LATERAL (
        SELECT count(*) AS n_orders,
               coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), CAST(0 AS DECIMAL(18,2))) AS spend
        FROM orders_v o WHERE o.o_custkey = c.c_custkey) o
      WHERE c.c_custkey < 100
      ORDER BY c.c_custkey""")
  }

  val q38LateralSql: String =
    """SELECT c.c_custkey, c.c_mktsegment, o.n_orders, o.spend::DOUBLE AS spend
      FROM customer c,
      LATERAL (
        SELECT count(*) AS n_orders,
               coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), CAST(0 AS DECIMAL(18,2))) AS spend
        FROM orders o WHERE o.o_custkey = c.c_custkey) o
      WHERE c.c_custkey < 100
      ORDER BY c.c_custkey"""

  // ---- GROUPING SETS + grouping() markers ---------------------------------
  // Distinct from q16's ROLLUP: an explicit, non-hierarchical set list, with
  // grouping() flags distinguishing "NULL because subtotal" from data NULLs.

  def q39GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql("""
      SELECT o_orderstatus, o_orderpriority,
             CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
             CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
             count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders_v
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority""")
  }

  val q39GroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      grouping(o_orderstatus)::BIGINT AS g_status,
      grouping(o_orderpriority)::BIGINT AS g_priority,
      count(*) AS n,
      sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS revenue
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority"""

  // ---- deterministic exact median (middle-rank selection) -----------------
  // The built-in percentile interpolation differs textually across engines;
  // selecting the middle-ranked VALUES via row_number and averaging min/max
  // of the (1- or 2-element) middle set is exact, order-stable under ties
  // (tied rows carry the same value), and replayable anywhere.

  def q40Median(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag").orderBy(col("l_quantity"))
    val wp = Window.partitionBy("l_returnflag")
    t(spark, dir, "lineitem")
      .select(
        col("l_returnflag"),
        col("l_quantity"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(wp).as("n"))
      // `div`, not `/`: Column `/` is double division, the oracle uses `//`.
      .filter(col("rn") === expr("(n + 1) div 2") || col("rn") === expr("(n + 2) div 2"))
      .groupBy("l_returnflag")
      .agg(
        ((min("l_quantity") + max("l_quantity")) / 2.0).as("median_qty"),
        max("n").as("n_rows"))
      .orderBy("l_returnflag")
  }

  val q40MedianSql: String =
    """SELECT l_returnflag,
      (min(l_quantity) + max(l_quantity)) / 2.0 AS median_qty,
      max(n) AS n_rows
      FROM (SELECT l_returnflag, l_quantity,
              row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
              count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem)
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---- correlation from exact decimal co-moments --------------------------
  // Pearson r assembled from order-independent EXACT sums (Σx, Σy, Σxy,
  // Σx², Σy² in decimal), each cast to double once, then one fixed IEEE
  // formula — deterministic under any partitioning, unlike the built-in
  // corr()'s float co-moment merging.

  def q41Corr(spark: SparkSession, dir: String): DataFrame = {
    // Integer-scaled (cents) values: both columns carry <= 2 decimal digits,
    // so round(v*100) is an exact integer in both engines, products fit
    // int64 per element, and the co-moment sums accumulate exactly in
    // decimal. Pearson r is scale-invariant, so the cents scaling cancels.
    val xi = round(col("l_quantity") * 100).cast("long")
    val yi = round(col("l_extendedprice") * 100).cast("long")
    t(spark, dir, "lineitem")
      .select(col("l_returnflag"), xi.as("xi"), yi.as("yi"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("xi").cast("decimal(38,0)")).as("sx"),
        sum(col("yi").cast("decimal(38,0)")).as("sy"),
        sum((col("xi") * col("yi")).cast("decimal(38,0)")).as("sxy"),
        sum((col("xi") * col("xi")).cast("decimal(38,0)")).as("sxx"),
        sum((col("yi") * col("yi")).cast("decimal(38,0)")).as("syy"))
      .select(
        col("l_returnflag"),
        col("n"),
        ((col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (sqrt(
            col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
            sqrt(
              col("n").cast("double") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double")))).as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  val q41CorrSql: String =
    """SELECT l_returnflag, n,
      (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
        (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) *
         sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)) AS corr_qty_price
      FROM (SELECT l_returnflag, count(*) AS n,
              sum(xi) AS sx, sum(yi) AS sy,
              sum(xi * yi) AS sxy, sum(xi * xi) AS sxx, sum(yi * yi) AS syy
            FROM (SELECT l_returnflag,
                    CAST(round(l_quantity * 100) AS BIGINT) AS xi,
                    CAST(round(l_extendedprice * 100) AS BIGINT) AS yi
                  FROM lineitem)
            GROUP BY l_returnflag)
      ORDER BY l_returnflag"""

  // ---- bitwise aggregates -------------------------------------------------

  def q42Bitagg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .groupBy("p_brand")
      .agg(
        bit_and(col("p_size").cast("long")).as("band"),
        bit_or(col("p_size").cast("long")).as("bor"),
        bit_xor(col("p_size").cast("long")).as("bxor"),
        count(lit(1)).as("n"))
      .orderBy("p_brand")

  val q42BitaggSql: String =
    """SELECT p_brand,
      bit_and(p_size::BIGINT) AS band,
      bit_or(p_size::BIGINT) AS bor,
      bit_xor(p_size::BIGINT) AS bxor,
      count(*) AS n
      FROM part GROUP BY p_brand ORDER BY p_brand"""

  // ---- ordered string aggregation -----------------------------------------
  // listagg/string_agg made deterministic by sorting the collected values —
  // collect_list order is partition-dependent, array_sort pins it.

  def q43StringAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .filter(col("c_custkey") < 60)
      .groupBy("c_mktsegment")
      .agg(
        array_join(array_sort(collect_list(col("c_name"))), ",").as("names"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

  val q43StringAggSql: String =
    """SELECT c_mktsegment,
      string_agg(c_name, ',' ORDER BY c_name) AS names,
      count(*) AS n
      FROM customer WHERE c_custkey < 60
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // ---- unpivot (wide -> long melt) ----------------------------------------

  def q44Unpivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_partkey") < 200)
      .unpivot(
        Array(col("p_partkey")),
        Array(col("p_size").cast("double").as("p_size"), col("p_retailprice").as("p_retailprice")),
        "metric",
        "val")
      .orderBy("p_partkey", "metric")

  val q44UnpivotSql: String =
    """SELECT p_partkey, 'p_size' AS metric, p_size::DOUBLE AS val
      FROM part WHERE p_partkey < 200
      UNION ALL
      SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val
      FROM part WHERE p_partkey < 200
      ORDER BY p_partkey, metric"""

  // ---- range join (equi key + date interval) ------------------------------
  // "other orders by the same customer within ±30 days" — the batch twin of
  // the streaming interval join; planned as an equi-join on o_custkey with
  // the range condition as a post-join filter (the join-space reducer).

  def q45RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val a = t(spark, dir, "orders")
      .select(col("o_orderkey").as("a_key"), col("o_custkey").as("a_ck"), col("o_orderdate").as("a_date"))
      .filter(col("a_key") < 300)
    val b = t(spark, dir, "orders")
      .select(col("o_orderkey").as("b_key"), col("o_custkey").as("b_ck"), col("o_orderdate").as("b_date"))
    // All conditions in the ON clause: zero-match orders must keep their
    // row (count 0), which a post-join filter would drop.
    a.join(
      b,
      col("a_ck") === col("b_ck") &&
        col("b_key") =!= col("a_key") &&
        col("b_date") >= col("a_date") - expr("interval 30 days") &&
        col("b_date") <= col("a_date") + expr("interval 30 days"),
      "left")
      .groupBy(col("a_key"))
      .agg(count(col("b_key")).as("n_nearby"))
      .select(col("a_key").as("o_orderkey"), col("n_nearby"))
      .orderBy("o_orderkey")
  }

  val q45RangeJoinSql: String =
    """SELECT a.o_orderkey, count(b.o_orderkey) AS n_nearby
      FROM orders a LEFT JOIN orders b
        ON a.o_custkey = b.o_custkey
       AND b.o_orderkey <> a.o_orderkey
       AND b.o_orderdate >= a.o_orderdate - INTERVAL 30 DAY
       AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY
      WHERE a.o_orderkey < 300
      GROUP BY a.o_orderkey ORDER BY a.o_orderkey"""

  // ---- salted skew join (result equality with the plain join) -------------
  // The explicit hot-key mitigation operator as a first-class query: the
  // salted join must return exactly the plain join's answer (the oracle IS
  // the plain join) — salt in, scatter, join on (key, salt), drop salt.

  def q46SkewSalted(spark: SparkSession, dir: String): DataFrame = {
    val left = t(spark, dir, "lineitem")
      .select(
        col("l_suppkey").as("suppkey"),
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity"))
    val right = t(spark, dir, "supplier")
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    graft.operators.SkewJoin
      .saltedInnerJoin(
        left,
        right,
        "suppkey",
        concat_ws("|", col("l_orderkey"), col("l_linenumber")),
        salt = 8)
      .groupBy("s_nationkey")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
      .orderBy("s_nationkey")
  }

  val q46SkewSaltedSql: String =
    """SELECT s_nationkey, count(*) AS n_items,
      sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE AS total_qty
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s_nationkey ORDER BY s_nationkey"""

  // ---- XML sink + scan round-trip (Spark 4 native XML source) -------------

  def q47XmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val dest = SessionMemo.tmpDir(spark, "q47_xml")
    t(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .coalesce(1)
      .write.mode("overwrite").option("rowTag", "row").format("xml").save(dest)
    spark.read
      .option("rowTag", "row")
      .format("xml")
      .load(dest)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy("n_nationkey")
  }

  // XML numbers infer as BIGINT on read-back; cast the oracle to match.
  val q47XmlRoundtripSql: String =
    """SELECT n_nationkey::BIGINT AS n_nationkey, n_name,
      n_regionkey::BIGINT AS n_regionkey FROM nation ORDER BY n_nationkey"""

  // ---- full outer join ----------------------------------------------------
  // Both null sides exercised: customers capped at custkey < 1000 (so some
  // orders dangle) against ALL orders (so zero-order customers dangle too).

  def q48Outer(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
      .filter(col("c_custkey") < 1000)
      .select(col("c_custkey"), col("c_mktsegment"))
    val o = t(spark, dir, "orders").select(col("o_custkey"), col("o_totalprice"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        when(col("c_custkey").isNull, "order_only")
          .when(col("o_custkey").isNull, "customer_only")
          .otherwise("both")
          .as("side"),
        col("o_totalprice"))
      .groupBy("side")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("order_value"))
      .orderBy("side")
  }

  val q48OuterSql: String =
    """SELECT side, count(*) AS n_rows,
      sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS order_value
      FROM (SELECT CASE WHEN c.c_custkey IS NULL THEN 'order_only'
                        WHEN o.o_custkey IS NULL THEN 'customer_only'
                        ELSE 'both' END AS side,
                   o.o_totalprice
            FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey < 1000) c
            FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey)
      GROUP BY side ORDER BY side"""

  // ---- bag (multiset) set operations --------------------------------------
  // INTERSECT ALL / EXCEPT ALL keep duplicate multiplicities — a different
  // physical plan (counted aggregate + generate) than the set versions in
  // q8/q9.

  def q49Bagops(spark: SparkSession, dir: String): DataFrame = {
    val a = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 150000)
      .select(col("o_custkey"))
    val b = t(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    a.intersectAll(b)
      .withColumn("op", lit("intersect_all"))
      .union(a.exceptAll(b).withColumn("op", lit("except_all")))
      .select(col("op"), col("o_custkey"))
      .orderBy("op", "o_custkey")
  }

  val q49BagopsSql: String =
    """SELECT 'intersect_all' AS op, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      UNION ALL
      SELECT 'except_all' AS op, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      ORDER BY op, o_custkey"""

  // ---- higher-order-function breadth --------------------------------------
  // exists/forall/filter/transform+aggregate lambdas over the token arrays;
  // every lambda has an exact DuckDB list-function twin.

  def q50Hof(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.functions.TextAnalysis.tokens(col("text"))
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        exists(toks, t => t === "the").as("has_the"),
        forall(toks, t => length(t) < 20).as("all_short"),
        size(filter(toks, t => length(t) >= 5)).cast("long").as("n_long_toks"),
        aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (acc, x) => acc + x)
          .as("total_len"))
      .orderBy("doc_id")
  }

  val q50HofSql: String = {
    val tk = raw"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"
    s"""SELECT doc_id,
      len(list_filter($tk, t -> t = 'the')) > 0 AS has_the,
      len(list_filter($tk, t -> NOT (length(t) < 20))) = 0 AS all_short,
      len(list_filter($tk, t -> length(t) >= 5))::BIGINT AS n_long_toks,
      list_reduce(list_prepend(0::BIGINT, list_transform($tk, t -> length(t)::BIGINT)), (a, b) -> a + b) AS total_len
      FROM documents ORDER BY doc_id"""
  }

  // ---- small-file compaction round-trip -----------------------------------
  // Scatter events into many small files, compact to ~2 MB targets, read
  // the compacted store back — the answer must be byte-identical to
  // querying the original table (the oracle). File-count reduction itself
  // is asserted in WritersSpec.

  def q51Compact(spark: SparkSession, dir: String): DataFrame = {
    val small = SessionMemo.tmpDir(spark, "q51_small")
    val compacted = SessionMemo.tmpDir(spark, "q51_compacted")
    events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .repartition(32)
      .write.mode("overwrite").parquet(small)
    graft.output.Writers.compactParquet(spark, small, compacted, targetFileBytes = 2L << 20)
    spark.read
      .parquet(compacted)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("event_type")
  }

  val q51CompactSql: String =
    """SELECT event_type, count(*) AS n,
      sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS total_value
      FROM events GROUP BY event_type ORDER BY event_type"""

  // ---- schema evolution (mergeSchema read over heterogeneous batches) -----
  // Batch 1 lands without the `value` column, batch 2 adds it; a
  // mergeSchema scan unifies them with nulls for the missing column — the
  // additive-evolution contract a long-lived 100 TB dataset depends on.

  def q52Evolution(spark: SparkSession, dir: String): DataFrame = {
    val dest = SessionMemo.tmpDir(spark, "q52_evo")
    val ev = events(spark, dir)
    ev.filter(col("event_id") < 5000)
      .select(col("event_id"), col("user_id"))
      .write.mode("overwrite").parquet(dest)
    ev.filter(col("event_id") >= 5000)
      .select(col("event_id"), col("user_id"), col("value"))
      .write.mode("append").parquet(dest)
    spark.read
      .option("mergeSchema", "true")
      .parquet(dest)
      .groupBy((col("user_id") % 10).as("user_bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("value")).as("n_with_value"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("user_bucket")
  }

  val q52EvolutionSql: String =
    """SELECT user_id % 10 AS user_bucket, count(*) AS n_rows,
      count(CASE WHEN event_id >= 5000 THEN value END) AS n_with_value,
      sum(CASE WHEN event_id >= 5000 THEN CAST(value AS DECIMAL(18,2)) END)::DOUBLE AS total_value
      FROM events GROUP BY user_bucket ORDER BY user_bucket"""

  // ---- native expressions through the SQL frontend ------------------------
  // The SparkSessionExtensions registrations (graft_dot, graft_md5long60,
  // graft_shingle_hashes, graft_simhash32) must be first-class in
  // spark.sql, and the DuckDB oracle replays each one — the SQL surface
  // and the Column surface share one implementation.

  def q53SqlNative(spark: SparkSession, dir: String): DataFrame = {
    Tables.t(spark, dir, "embeddings").createOrReplaceTempView("embeddings_v")
    Tables.t(spark, dir, "documents").createOrReplaceTempView("documents_v")
    spark.sql("""
      SELECT d.doc_id,
             graft_md5long60(d.text) AS text_h,
             graft_simhash32(graft_shingle_hashes(
               transform(filter(split(d.text, '\\s+'), t -> t <> ''),
                         t -> graft_md5long60(t)), 3)) AS sim,
             graft_dot(CAST(e.embedding AS ARRAY<DOUBLE>), CAST(e.embedding AS ARRAY<DOUBLE>)) AS self_dot
      FROM documents_v d JOIN embeddings_v e ON d.doc_id = e.vec_id
      WHERE d.doc_id < 100
      ORDER BY d.doc_id""")
  }

  val q53SqlNativeSql: String = {
    val toks = raw"list_filter(string_split_regex(text, '\s+'), t -> t <> '')"
    val th = s"list_transform($toks, t -> ${graft.functions.Hashing.sqlMd5Long60Duck("t")})"
    val shingles =
      s"CASE WHEN len(th) >= 3 THEN list_transform(range(1, len(th) - 1), i -> ${graft.operators.Dedup
          .sqlShingleHashDuck("list_slice(th, i, i + 2)")}) ELSE [${graft.operators.Dedup.sqlShingleHashDuck("th")}] END"
    val simBits = (0 until 32)
      .map(j =>
        s"CASE WHEN 2 * len(list_filter(sh, h -> (h >> $j) & 1 = 1)) > len(sh) THEN ${1L << j}::BIGINT ELSE 0::BIGINT END")
      .mkString(" + ")
    s"""SELECT doc_id, text_h, $simBits AS sim, self_dot
      FROM (SELECT doc_id, text_h, $shingles AS sh, self_dot
            FROM (SELECT d.doc_id,
                    ${graft.functions.Hashing.sqlMd5Long60Duck("d.text")} AS text_h,
                    $th AS th,
                    list_reduce(list_transform(list_transform(e.embedding::DOUBLE[], x -> x),
                      x -> x * x), (p, q) -> p + q) AS self_dot
                  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
                  WHERE d.doc_id < 100))
      ORDER BY doc_id"""
  }

  // ---- sliding event-time windows -----------------------------------------
  // Unlike q13's tumbling hour, a 1h window sliding every 15min assigns
  // each event to exactly 4 overlapping windows (Spark plans an Expand —
  // the explode-then-aggregate shape). The oracle enumerates the same 4
  // window starts per event.

  def q54Sliding(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(
        window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_micros(col("w.start")).as("w_start_us"),
        col("event_type"),
        col("n"))
      .orderBy("w_start_us", "event_type")

  val q54SlidingSql: String =
    """SELECT w_start_us, event_type, count(*) AS n
      FROM (SELECT epoch_us(time_bucket(INTERVAL 15 MINUTE, ts)) - k.k * 900 * 1000000 AS w_start_us,
                   event_type
            FROM events CROSS JOIN range(0, 4) k(k))
      GROUP BY w_start_us, event_type
      ORDER BY w_start_us, event_type"""

  // ---- CUBE (all grouping combinations) -----------------------------------
  // Completes the grouping-analytics family: q16 ROLLUP (hierarchical),
  // q39 explicit GROUPING SETS, q55 the full 2^n cube.

  def q55Cube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(
        grouping("o_orderstatus").cast("long").as("g_status"),
        grouping("o_orderpriority").cast("long").as("g_priority"),
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      // Pin null ordering (like q16's rollup): a genuine data NULL in a
      // grouping column sorts NULLS FIRST in Spark, NULLS LAST in DuckDB.
      .orderBy(
        col("g_status"),
        col("g_priority"),
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val q55CubeSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      grouping(o_orderstatus)::BIGINT AS g_status,
      grouping(o_orderpriority)::BIGINT AS g_priority,
      count(*) AS n,
      sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS revenue
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY g_status, g_priority, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""

  // ---- calendar spine / gap filling ---------------------------------------
  // Dense hourly spine from min to max event time via sequence + explode,
  // left-joined to the sparse hourly counts — missing hours surface as 0
  // instead of absent rows. The densification every time-series dashboard
  // needs; fully declarative (the bounds row cross-joins the spine, no
  // collect).

  def q56Datespine(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val bounds = ev.agg(
      date_trunc("hour", min("ts")).as("lo"),
      date_trunc("hour", max("ts")).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
    val counts = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n0"))
    spine
      .join(counts, Seq("h"), "left")
      .select(
        date_format(col("h"), "yyyy-MM-dd HH").as("hour"),
        coalesce(col("n0"), lit(0L)).as("n"))
      .orderBy("hour")
  }

  val q56DatespineSql: String =
    """WITH spine AS (
        SELECT unnest(generate_series(
          (SELECT date_trunc('hour', min(ts)) FROM events),
          (SELECT date_trunc('hour', max(ts)) FROM events),
          INTERVAL 1 HOUR)) AS h),
      counts AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n0
                 FROM events GROUP BY 1)
      SELECT strftime(spine.h, '%Y-%m-%d %H') AS hour, coalesce(n0, 0) AS n
      FROM spine LEFT JOIN counts ON spine.h = counts.h
      ORDER BY hour"""

  // ---- recursive CTE (Spark 4 WITH RECURSIVE) -----------------------------
  // Iterative-in-SQL: walk the implicit binary-tree hierarchy parent(k) =
  // k div 2 from each low customer key to the root, aggregating depth and
  // path sum — the transitive-closure query shape (org charts, BOM
  // explosions) that needed driver-side loops before Spark 4.

  def q57Recursive(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("customer_v")
    spark.sql("""
      WITH RECURSIVE walk(start_key, cur, depth) AS (
        SELECT c_custkey, c_custkey, 0 FROM customer_v WHERE c_custkey < 50
        UNION ALL
        SELECT start_key, cur DIV 2, depth + 1 FROM walk WHERE cur > 0)
      SELECT start_key,
             CAST(max(depth) AS BIGINT) AS depth_to_root,
             CAST(sum(cur) AS BIGINT) AS path_sum
      FROM walk GROUP BY start_key ORDER BY start_key""")
  }

  val q57RecursiveSql: String =
    """WITH RECURSIVE walk(start_key, cur, depth) AS (
        SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 50
        UNION ALL
        SELECT start_key, cur // 2, depth + 1 FROM walk WHERE cur > 0)
      SELECT start_key,
             max(depth)::BIGINT AS depth_to_root,
             sum(cur)::BIGINT AS path_sum
      FROM walk GROUP BY start_key ORDER BY start_key"""

  // ---- VARIANT (Spark 4 semi-structured type) -----------------------------
  // parse_json into a VARIANT column, typed extraction with variant_get —
  // the open-schema ingestion path (vs q35's fully-schema'd from_json).
  // Output is scalar-typed, so the DuckDB JSON functions replay it.

  def q58Variant(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(
        col("event_id"),
        parse_json(col("props")).as("v"))
      .select(
        col("event_id"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"))
      .filter(col("k").isNotNull && col("k") % 10 === 0)
      // `div`, not `/`: Column `/` is double division; the oracle uses `//`.
      .groupBy(expr("k div 10").as("k_bucket"))
      .agg(count(lit(1)).as("n"), min("event_id").as("first_event"))
      .orderBy("k_bucket")

  val q58VariantSql: String =
    """SELECT (k // 10) AS k_bucket, count(*) AS n, min(event_id) AS first_event
      FROM (SELECT event_id, json_extract(props, '$.k')::BIGINT AS k FROM events)
      WHERE k IS NOT NULL AND k % 10 = 0
      GROUP BY k_bucket ORDER BY k_bucket"""

  // ---- ANSI-safe try_* functions ------------------------------------------
  // With ANSI mode ON (the session default here), bad casts and div-by-zero
  // THROW; the try_* family converts those to NULLs — the error-tolerant
  // ingestion path. DuckDB replays via TRY_CAST and nullif-guarded
  // division.

  def q59Try(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_partkey") < 200)
      .select(
        col("p_partkey"),
        expr("try_cast(regexp_extract(p_name, '([0-9]+)', 1) AS BIGINT)").as("name_num"),
        expr("try_cast(p_brand AS BIGINT)").as("brand_as_num"),
        try_divide(col("p_retailprice"), col("p_size") - col("p_size")).as("div0"),
        try_divide(col("p_retailprice"), col("p_size")).as("per_size"))
      .orderBy("p_partkey")

  val q59TrySql: String =
    """SELECT p_partkey,
      TRY_CAST(regexp_extract(p_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
      TRY_CAST(p_brand AS BIGINT) AS brand_as_num,
      p_retailprice / nullif(p_size - p_size, 0) AS div0,
      p_retailprice / nullif(p_size, 0) AS per_size
      FROM part WHERE p_partkey < 200 ORDER BY p_partkey"""

  // ---- map higher-order functions -----------------------------------------
  // transform_values + map_filter over a parsed MapType column, exploded
  // back to scalars — completes the HOF surface (q50 covers arrays).

  /** The q60 HOF chain over a parsed props map — shared with the multi-key
    * fixture test so the oracle's generalization is pinned by a unit test
    * too, not just the (single-key) corpus.
    */
  private[queries] def mapHofChain(m: Column): Column =
    map_filter(
      transform_values(m, (k, v) => v * 2 + length(k)),
      (_, v) => v % 3 === 0)

  def q60Maphof(spark: SparkSession, dir: String): DataFrame =
    parsedProps(spark, dir)
      .select(
        col("event_id"),
        explode(mapHofChain(col("m"))).as(Seq("key", "value")))
      .orderBy("event_id", "key")

  // Generic over ANY key set (json_keys unnest, value transform keyed by
  // the actual key's length) — no single-key data-shape assumption. Keys
  // quoted into the path, as in q35's oracle.
  val q60MaphofSql: String =
    """SELECT event_id, key, v AS value FROM (
        SELECT event_id, k AS key,
          json_extract(props, '$."' || k || '"')::BIGINT * 2 + length(k) AS v
        FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events))
      WHERE v IS NOT NULL AND v % 3 = 0
      ORDER BY event_id, key"""

  // ---- dynamic partition overwrite (partition-level backfill) -------------
  // The maintenance op a partitioned 100 TB store runs routinely: rewrite
  // ONE partition (here: corrected `click` rows, values doubled) without
  // touching sibling partitions. The per-write `partitionOverwriteMode =
  // dynamic` option (no session-conf mutation) makes overwrite replace
  // only the partitions present in the written frame; if that semantics
  // broke, the non-click partitions would vanish and the oracle's
  // untouched groups would fail the hash. (Assumes non-null, non-empty
  // event_type — a NULL/'' partition value would round-trip through
  // __HIVE_DEFAULT_PARTITION__ as NULL and diverge from the oracle's
  // plain GROUP BY; the harness fixture guarantees this.)

  def q62Backfill(spark: SparkSession, dir: String): DataFrame = {
    val dest = SessionMemo.tmpDir(spark, "q62_backfill")
    val ev = events(spark, dir).select(
      col("event_id"), col("user_id"), col("event_type"), col("value"))
    ev.write.mode("overwrite").partitionBy("event_type").parquet(dest)
    ev.filter(col("event_type") === "click")
      .withColumn("value", col("value") * 2)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_type")
      .parquet(dest)
    spark.read
      .parquet(dest)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("event_type")
  }

  val q62BackfillSql: String =
    """SELECT event_type, count(*) AS n,
      sum(CAST(CASE WHEN event_type = 'click' THEN value * 2 ELSE value END
               AS DECIMAL(18,2)))::DOUBLE AS total_value
      FROM events GROUP BY event_type ORDER BY event_type"""

  // ---- Z-order data layout (multi-dimensional clustering) -----------------
  // Write events laid out by the Morton interleave of (user_id, value)
  // bits — range-partitioned AND sorted by the z value, so a scan
  // filtered on either dimension prunes most files by footer min/max
  // stats (ZOrderSpec asserts the per-file z ranges are disjoint). The
  // read-back filtered aggregate plus per-bucket min/max z verifies both
  // the layout round-trip and the interleave arithmetic against the
  // oracle's replay.

  def q63Zorder(spark: SparkSession, dir: String): DataFrame = {
    val dest = SessionMemo.tmpDir(spark, "q63_zorder")
    events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
      .withColumn("x", col("user_id").bitwiseAND(lit(0xffffL)))
      .withColumn("y", floor(col("value")).cast("long").bitwiseAND(lit(0xffffL)))
      .withColumn("z", graft.operators.ZOrder.interleave16(col("x"), col("y")))
      .repartitionByRange(8, col("z"))
      .sortWithinPartitions("z")
      .write
      .mode("overwrite")
      .parquet(dest)
    spark.read
      .parquet(dest)
      // Bounds sit inside every fixture scale's (user_id, value) domain —
      // sf0.001's user_id tops out at 14 — so the gate always compares a
      // NON-empty result and the interleave replay is genuinely checked.
      .filter(col("x").between(2, 60) && col("y").between(10, 400))
      .groupBy((col("user_id") % 10).as("user_bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        min(col("z")).as("z_min"),
        max(col("z")).as("z_max"))
      .orderBy("user_bucket")
  }

  val q63ZorderSql: String = {
    val z = graft.operators.ZOrder.sqlInterleave16Duck("x", "y")
    s"""SELECT user_id % 10 AS user_bucket, count(*) AS n,
      sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS total_value,
      min(z) AS z_min, max(z) AS z_max
      FROM (SELECT user_id, value, x, y, $z AS z
            FROM (SELECT user_id, value, user_id & 65535 AS x,
                    floor(value)::BIGINT & 65535 AS y FROM events))
      WHERE x BETWEEN 2 AND 60 AND y BETWEEN 10 AND 400
      GROUP BY user_bucket ORDER BY user_bucket"""
  }

  // ---- Bloom-filter join pruning ------------------------------------------
  // The 100 TB pattern for a selective fact-dim semi join: aggregate a
  // Bloom filter over the (filtered) dimension keys, broadcast the
  // SERIALIZED FILTER (a few KB) instead of shuffling the fact side, prune
  // fact rows with `might_contain`, and settle the Bloom's false positives
  // with the exact semi join on the survivors. Final answer is exact — the
  // oracle is the plain semi join — while the scan-side work is a
  // membership test. Uses Spark's internal runtime-filter expressions
  // (BloomFilterAggregate / BloomFilterMightContain) via the shim — the
  // same machinery Spark's own injected runtime filters run on.

  def q64Bloom(spark: SparkSession, dir: String): DataFrame = {
    val shim = org.apache.spark.sql.graftshim.ColumnBridge
    val dim = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").cast("bigint").as("dim_key"))
    // Materialize the filter first (one scalar row of a few KB — the same
    // build-side-first sequencing Spark's injected runtime filters use)
    // and embed it as a literal: might_contain requires a constant bloom.
    val filterBytes = dim
      .agg(shim.bloomFilterAgg(col("dim_key"), 10000L, 100000L).as("f"))
      .collect()(0)
      .getAs[Array[Byte]](0)
    // An EMPTY dimension aggregates to a null bloom; skip the pre-filter
    // then (the exact semi join below still returns the correct empty
    // answer) instead of building an untyped null literal that
    // might_contain rejects at analysis.
    val pruned =
      if (filterBytes == null) t(spark, dir, "orders")
      else
        t(spark, dir, "orders")
          .filter(shim.mightContain(lit(filterBytes), col("o_custkey").cast("bigint")))
    pruned
      .join(dim, col("o_custkey").cast("bigint") === col("dim_key"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  val q64BloomSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS revenue
      FROM orders WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- keep-latest-per-key (max_by upsert compaction) ----------------------
  // The ingest-side compaction a mutable-entity store runs: collapse an
  // event log to each key's LATEST record in ONE hash aggregate (max_by on
  // a total order), instead of a row_number window + filter (which adds a
  // sort per partition). The order key is (ts, event_id) encoded as a
  // fixed-width string so ties on ts stay deterministic and both engines
  // compare identically.

  def q65Latest(spark: SparkSession, dir: String): DataFrame = {
    val ordKey = concat(
      lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
      lpad(col("event_id").cast("string"), 12, "0"))
    events(spark, dir)
      .groupBy("user_id")
      .agg(
        max_by(col("event_id"), ordKey).as("last_event_id"),
        max_by(col("event_type"), ordKey).as("last_type"),
        max_by(col("value"), ordKey).as("last_value"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  val q65LatestSql: String = {
    val ordKey = "lpad(epoch_us(ts)::VARCHAR, 20, '0') || lpad(event_id::VARCHAR, 12, '0')"
    s"""SELECT user_id,
      arg_max(event_id, $ordKey) AS last_event_id,
      arg_max(event_type, $ordKey) AS last_type,
      arg_max(value, $ordKey) AS last_value,
      count(*) AS n_events
      FROM events GROUP BY user_id ORDER BY user_id"""
  }

  // ---- forward as-of join with tolerance ----------------------------------
  // Time-to-first-error attribution: each signup attaches the FIRST error
  // by the same user at-or-after it, masked to null when the gap exceeds
  // 24 h — the forward direction plus pandas-style tolerance that
  // [[graft.operators.AsOfJoin]] adds over q15's backward join. Times are
  // exchanged as unix micros on BOTH engines so the tolerance boundary
  // compares identical integers (micros-truncated) rather than
  // nanos-vs-micros intervals.

  def q66AsofFwd(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).withColumn("ts_us", unix_micros(col("ts")))
    val signups = ev
      .filter(col("event_type") === "signup")
      .select(col("event_id").as("s_event"), col("user_id"), col("ts_us"))
    val errors = ev
      .filter(col("event_type") === "error")
      .groupBy("user_id", "ts_us")
      .agg(min("event_id").as("e_event"))
    graft.operators.AsOfJoin
      .asOf(
        signups,
        errors,
        "user_id",
        "ts_us",
        Seq("e_event"),
        graft.operators.AsOfJoin.Forward,
        tolerance = Some(lit(86400000000L)))
      .select(
        col("s_event"),
        col("user_id"),
        col("ts_us"),
        col("e_event"),
        (col("asof_ts_us") - col("ts_us")).as("gap_us"))
      .orderBy("s_event")
  }

  val q66AsofFwdSql: String =
    """WITH s AS (SELECT event_id AS s_event, user_id, epoch_us(ts) AS ts_us
                  FROM events WHERE event_type = 'signup'),
         e AS (SELECT user_id, epoch_us(ts) AS ts_us, min(event_id) AS e_event
               FROM events WHERE event_type = 'error' GROUP BY user_id, ts_us),
         j AS (SELECT s.s_event, s.user_id, s.ts_us, e.ts_us AS e_us, e.e_event
               FROM s ASOF LEFT JOIN e
               ON s.user_id = e.user_id AND s.ts_us <= e.ts_us)
      SELECT s_event, user_id, ts_us,
        CASE WHEN ok THEN e_event END AS e_event,
        CASE WHEN ok THEN e_us - ts_us END AS gap_us
      FROM (SELECT *, e_us IS NOT NULL AND e_us - ts_us <= 86400000000 AS ok
            FROM j)
      ORDER BY s_event"""

  // ---- SCD2 dimension build -----------------------------------------------
  // Treat the event stream as a per-user change log of event_type and
  // collapse it into a type-2 slowly-changing dimension: a version opens
  // only when the tracked attribute actually changes (null-safe), with
  // [effective_from, effective_to) ranges, a 1-based version counter, and
  // one open row per user. One key exchange; all three window passes
  // share the same sort (locked by Scd2Spec).

  def q67Scd2(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Scd2
      .build(
        events(spark, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_type")),
        "user_id",
        "ts_us",
        Seq("event_type"))
      .select(
        col("user_id"),
        col("event_type"),
        col("effective_from"),
        col("effective_to"),
        col("is_current"),
        col("version"))
      .orderBy("user_id", "version")

  val q67Scd2Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
      d AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev,
              row_number() OVER (PARTITION BY user_id ORDER BY ts_us) AS rn
            FROM e),
      c AS (SELECT user_id, ts_us, event_type FROM d
            WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
      SELECT user_id, event_type,
        ts_us AS effective_from,
        lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS effective_to,
        lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL AS is_current,
        row_number() OVER (PARTITION BY user_id ORDER BY ts_us) AS version
      FROM c ORDER BY user_id, version"""

  // ---- snapshot reconciliation (diff two table versions) ------------------
  // The "after" snapshot is derived deterministically from orders:
  // keys % 97 == 0 removed, % 31 == 0 repriced (x2 — exact in FP),
  // % 101 == 0 cloned as adds with shifted keys. The diff emits only the
  // change set (added/removed/changed + changed-column list) — output
  // proportional to the drift, not the table.

  private val DiffCols = Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")

  def q68Diff(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(("o_orderkey" +: DiffCols).map(col): _*)
    val after = o
      .filter(col("o_orderkey") % 97 =!= 0)
      .withColumn(
        "o_totalprice",
        when(col("o_orderkey") % 31 === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
      .unionByName(
        o.filter(col("o_orderkey") % 101 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L)))
    graft.operators.SnapshotDiff
      .diff(o, after, Seq("o_orderkey"), DiffCols)
      .orderBy("o_orderkey")
  }

  val q68DiffSql: String = {
    val cl = DiffCols
      .map(c => s"CASE WHEN b.$c IS DISTINCT FROM a.$c THEN '$c,' ELSE '' END")
      .mkString("concat(", ", ", ")")
    s"""WITH b AS (SELECT o_orderkey, ${DiffCols.mkString(", ")} FROM orders),
      a AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
          o_orderpriority
        FROM b WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000, ${DiffCols.mkString(", ")}
        FROM b WHERE o_orderkey % 101 = 0),
      j AS (SELECT coalesce(b.o_orderkey, a.o_orderkey) AS o_orderkey,
              b.o_orderkey IS NOT NULL AS bp, a.o_orderkey IS NOT NULL AS ap,
              $cl AS cl
            FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey)
      SELECT o_orderkey,
        CASE WHEN NOT bp THEN 'added' WHEN NOT ap THEN 'removed'
             WHEN cl <> '' THEN 'changed' ELSE 'unchanged' END AS status,
        CASE WHEN bp AND ap THEN rtrim(cl, ',') ELSE '' END AS changed_cols
      FROM j WHERE NOT (bp AND ap AND cl = '')
      ORDER BY o_orderkey"""
  }

  // ---- CDC apply (batch MERGE INTO) ---------------------------------------
  // The inverse of q68: a deterministic changeset (deletes % 53, repriced
  // upserts % 17 excluding the deletes, shifted-key inserts % 89) applied
  // to orders via Merge.applyChanges — anti-join on slim changeset keys +
  // union of upsert payloads; the base table never shuffles. The gate
  // reads back only the touched key space, so deletes are verified by
  // absence under the same filter on both engines.

  def q69Merge(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(("o_orderkey" +: DiffCols).map(col): _*)
    val deletes = o
      .filter(col("o_orderkey") % 53 === 0)
      .withColumn("op", lit("delete"))
    val reprices = o
      .filter(col("o_orderkey") % 17 === 0 && col("o_orderkey") % 53 =!= 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .withColumn("op", lit("upsert"))
    val inserts = o
      .filter(col("o_orderkey") % 89 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(200000000L))
      .withColumn("op", lit("upsert"))
    graft.operators.Merge
      .applyChanges(o, deletes.unionByName(reprices).unionByName(inserts), Seq("o_orderkey"))
      .filter(
        col("o_orderkey") % 17 === 0 || col("o_orderkey") % 53 === 0 ||
          col("o_orderkey") >= 200000000L)
      .orderBy("o_orderkey")
  }

  val q69MergeSql: String =
    s"""WITH base AS (SELECT o_orderkey, ${DiffCols.mkString(", ")} FROM orders),
      up AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice, o_orderpriority
        FROM base WHERE o_orderkey % 17 = 0 AND o_orderkey % 53 <> 0
        UNION ALL
        SELECT o_orderkey + 200000000, ${DiffCols.mkString(", ")}
        FROM base WHERE o_orderkey % 89 = 0),
      ck AS (SELECT o_orderkey FROM base WHERE o_orderkey % 53 = 0
             UNION SELECT o_orderkey FROM up),
      merged AS (
        SELECT * FROM base b WHERE NOT EXISTS (SELECT 1 FROM ck WHERE ck.o_orderkey = b.o_orderkey)
        UNION ALL SELECT * FROM up)
      SELECT * FROM merged
      WHERE o_orderkey % 17 = 0 OR o_orderkey % 53 = 0 OR o_orderkey >= 200000000
      ORDER BY o_orderkey"""

  // ---- parameterized SQL (named parameter markers) ------------------------
  // spark.sql(query, args) with :named parameters — injection-safe
  // parameterization; the oracle inlines the same constants.

  def q61Params(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders_v
        WHERE o_totalprice > :minPrice AND o_orderstatus = :status
        GROUP BY o_orderpriority ORDER BY o_orderpriority""",
      Map("minPrice" -> 150000, "status" -> "F"))
  }

  val q61ParamsSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS revenue
      FROM orders
      WHERE o_totalprice > 150000 AND o_orderstatus = 'F'
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- A2 variant: dynamic pivot (runtime-discovered values) --------------
  // `pivot(col)` with NO value list runs the distinct-values pre-job (capped
  // by spark.sql.pivotMaxValues) and sorts the discovered values — the shape
  // a user reaches for when the category domain isn't known at authoring
  // time. Costs one extra small aggregate job vs q10's explicit list; the
  // pivot aggregate itself is the same single hash-shuffle. The oracle
  // enumerates the fixture's five market segments explicitly (the driver's
  // compare is column-name keyed, so discovery order is irrelevant).

  def q70DynamicPivot(spark: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .withColumn("order_year", year(col("o_orderdate")).cast("long"))
      .groupBy("order_year")
      .pivot("c_mktsegment") // dynamic: values discovered by a distinct job
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
      .na.fill(0.0, segs)
      .orderBy("order_year")
  }

  val q70DynamicPivotSql: String =
    """SELECT year(o_orderdate)::BIGINT AS order_year,
      coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE c_mktsegment = 'AUTOMOBILE'), 0)::DOUBLE AS "AUTOMOBILE",
      coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE c_mktsegment = 'BUILDING'), 0)::DOUBLE AS "BUILDING",
      coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE c_mktsegment = 'FURNITURE'), 0)::DOUBLE AS "FURNITURE",
      coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE c_mktsegment = 'HOUSEHOLD'), 0)::DOUBLE AS "HOUSEHOLD",
      coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE c_mktsegment = 'MACHINERY'), 0)::DOUBLE AS "MACHINERY"
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY order_year ORDER BY order_year"""

  // ---- permissive parse with corrupt-record accounting ---------------------
  // The dirty-ingest reality of a 100 TB text lake: a CSV batch where some
  // rows are malformed. PERMISSIVE mode + columnNameOfCorruptRecord keeps
  // the load running, captures each bad raw line, and lets quality
  // accounting ride the same scan (vs DROPMALFORMED, which silently loses
  // the denominator). Corruption is injected deterministically (custkey
  // % 7 → non-numeric acctbal) so the oracle can replay the good/bad split
  // from the clean parquet. Grouping keys off `_corrupt_record IS NULL`
  // only — robust to how much of a bad row the parser salvages.

  def q71Badrecords(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val dest = SessionMemo.tmpDir(spark, "q71_badrecords")
    t(spark, dir, "customer")
      .select(concat_ws(",",
        col("c_custkey"),
        col("c_name"),
        when(col("c_custkey") % 7 === 0, lit("NOT_A_NUMBER"))
          .otherwise(col("c_acctbal").cast("string"))).as("value"))
      .write.mode("overwrite").text(dest)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_acctbal", DoubleType),
      StructField("_corrupt_record", StringType)))
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dest)
      .groupBy(when(col("_corrupt_record").isNull, "ok").otherwise("corrupt").as("status"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("_corrupt_record").isNull, col("c_acctbal").cast("decimal(18,2)")))
          .cast("double").as("total_bal"))
      .orderBy("status")
  }

  val q71BadrecordsSql: String =
    """SELECT CASE WHEN c_custkey % 7 = 0 THEN 'corrupt' ELSE 'ok' END AS status,
      count(*) AS n,
      sum(CASE WHEN c_custkey % 7 <> 0 THEN CAST(c_acctbal AS DECIMAL(18,2)) END)::DOUBLE AS total_bal
      FROM customer GROUP BY status ORDER BY status"""

  // ---- Dataset.observe (zero-extra-pass pipeline metrics) ------------------
  // The data-quality accounting a production job wants on EVERY run:
  // row/volume counts observed at a point in the plan, collected by
  // accumulator on the SAME job that computes the real answer — no second
  // scan, no cached frame. Here the observation sits on the scan (pre-
  // filter denominator) while the action computes the post-filter count;
  // at 100 TB the metrics are free because the scan was already paid for.
  // qty_scanned stays exact under any partitioning: quantities are small
  // integers in doubles, so the unordered distributed sum is integer-exact.
  // `Observation()` self-names with a UUID, so repeated runs in one
  // session never collide in the listener registry.

  def q72Observe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val obs = org.apache.spark.sql.Observation()
    val filtered = t(spark, dir, "lineitem")
      .observe(
        obs,
        count(lit(1)).as("n_scanned"),
        sum(col("l_quantity")).as("qty_scanned"))
      .filter(col("l_returnflag") === "R")
    val kept = filtered.count() // one job: metrics piggyback on this action
    val m = obs.get
    Seq((m("n_scanned").asInstanceOf[Long], m("qty_scanned").asInstanceOf[Double], kept))
      .toDF("n_scanned", "qty_scanned", "n_kept")
  }

  val q72ObserveSql: String =
    """SELECT count(*) AS n_scanned, sum(l_quantity) AS qty_scanned,
      count(*) FILTER (WHERE l_returnflag = 'R') AS n_kept
      FROM lineitem"""

  /** Dataset profiling ([[graft.operators.Profiler]]): per-column row/
    * null/exact-distinct counts and type-rendered min/max over lineitem in
    * ONE aggregate pass — the pre-ingest audit a pipeline runs on every
    * new data drop. The oracle recomputes each column's stats with the
    * same type renderings (DECIMAL(18,2) for doubles, fixed timestamp
    * format) and unions them.
    */
  def q73Profile(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profiler.profile(t(spark, dir, "lineitem"))

  val q73ProfileSql: String = {
    val cols = Seq(
      "l_orderkey" -> "plain",
      "l_partkey" -> "plain",
      "l_suppkey" -> "plain",
      "l_linenumber" -> "plain",
      "l_quantity" -> "dbl",
      "l_extendedprice" -> "dbl",
      "l_discount" -> "dbl",
      "l_tax" -> "dbl",
      "l_returnflag" -> "plain",
      "l_linestatus" -> "plain",
      "l_shipdate" -> "ts")
    val parts = cols.map { case (c, kind) =>
      def r(agg: String) = kind match {
        case "dbl" => s"($agg($c)::DECIMAL(18,2))::VARCHAR"
        case "ts" => s"strftime($agg($c), '%Y-%m-%d %H:%M:%S')"
        case _ => s"$agg($c)::VARCHAR"
      }
      s"""SELECT '$c' AS column_name, count(*)::BIGINT AS n_rows,
        (count(*) - count($c))::BIGINT AS n_null,
        count(DISTINCT $c)::BIGINT AS n_distinct,
        ${r("min")} AS min_s, ${r("max")} AS max_s FROM lineitem"""
    }
    parts.mkString("", " UNION ALL ", " ORDER BY column_name")
  }

  /** Declarative data-quality constraint audit (the Deequ-style check
    * suite): referential integrity via left joins against DISTINCT key
    * projections (never a fact-side shuffle fan-out), uniqueness via
    * count-vs-distinct, ranges/accepted-values/not-null via conditional
    * counts — each rule one small aggregate, emitted as a verdict table.
    */
  def q74Constraints(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    def verdict(rule: String, checked: Column, violations: Column)(df: DataFrame): DataFrame =
      df.agg(checked.as("n_checked"), violations.as("n_violations"))
        .select(
          lit(rule).as("rule"),
          col("n_checked"),
          col("n_violations"),
          (col("n_violations") === 0).as("passed"))
    val fkLiOrders = verdict(
      "fk_lineitem_orderkey",
      count(lit(1)),
      count(when(col("ok").isNull, 1)))(
      li.join(
        broadcast(o.select(col("o_orderkey").as("ok")).distinct()),
        col("l_orderkey") === col("ok"),
        "left"))
    val fkOrdersCust = verdict(
      "fk_orders_custkey",
      count(lit(1)),
      count(when(col("ck").isNull, 1)))(
      o.join(
        broadcast(c.select(col("c_custkey").as("ck")).distinct()),
        col("o_custkey") === col("ck"),
        "left"))
    val uniqO = verdict(
      "unique_o_orderkey",
      count(col("o_orderkey")),
      count(col("o_orderkey")) - countDistinct(col("o_orderkey")))(o)
    val uniqC = verdict(
      "unique_c_custkey",
      count(col("c_custkey")),
      count(col("c_custkey")) - countDistinct(col("c_custkey")))(c)
    val rangeQty = verdict(
      "range_l_quantity_1_50",
      count(lit(1)),
      count(when(!col("l_quantity").between(1, 50), 1)))(li)
    val rangeDisc = verdict(
      "range_l_discount_0_0.1",
      count(lit(1)),
      count(when(!col("l_discount").between(0.0, 0.1), 1)))(li)
    val notnullShip = verdict(
      "notnull_l_shipdate",
      count(lit(1)),
      count(when(col("l_shipdate").isNull, 1)))(li)
    val acceptedRf = verdict(
      "accepted_l_returnflag",
      count(lit(1)),
      count(when(!col("l_returnflag").isin("A", "N", "R"), 1)))(li)
    Seq(fkLiOrders, fkOrdersCust, uniqO, uniqC, rangeQty, rangeDisc, notnullShip, acceptedRf)
      .reduce(_ unionByName _)
      .orderBy("rule")
  }

  val q74ConstraintsSql: String =
    """WITH checks AS (
      SELECT 'fk_lineitem_orderkey' AS rule, count(*)::BIGINT AS n_checked,
        count(*) FILTER (WHERE o.o_orderkey IS NULL)::BIGINT AS n_violations
      FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'fk_orders_custkey', count(*)::BIGINT,
        count(*) FILTER (WHERE c.c_custkey IS NULL)::BIGINT
      FROM orders ord LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON ord.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'unique_o_orderkey', count(o_orderkey)::BIGINT,
        (count(o_orderkey) - count(DISTINCT o_orderkey))::BIGINT FROM orders
      UNION ALL
      SELECT 'unique_c_custkey', count(c_custkey)::BIGINT,
        (count(c_custkey) - count(DISTINCT c_custkey))::BIGINT FROM customer
      UNION ALL
      SELECT 'range_l_quantity_1_50', count(*)::BIGINT,
        count(*) FILTER (WHERE NOT (l_quantity BETWEEN 1 AND 50))::BIGINT FROM lineitem
      UNION ALL
      SELECT 'range_l_discount_0_0.1', count(*)::BIGINT,
        count(*) FILTER (WHERE NOT (l_discount BETWEEN 0.0 AND 0.1))::BIGINT FROM lineitem
      UNION ALL
      SELECT 'notnull_l_shipdate', count(*)::BIGINT,
        count(*) FILTER (WHERE l_shipdate IS NULL)::BIGINT FROM lineitem
      UNION ALL
      SELECT 'accepted_l_returnflag', count(*)::BIGINT,
        count(*) FILTER (WHERE l_returnflag NOT IN ('A', 'N', 'R'))::BIGINT FROM lineitem)
      SELECT rule, n_checked, n_violations, n_violations = 0 AS passed
      FROM checks ORDER BY rule"""

  /** Shuffle-partition skew planner: simulate hash-partitioning lineitem
    * on its join key over 32 partitions (md5-derived bucket — engine-
    * independent, unlike Murmur3) and report each partition's row count
    * and load factor. The pre-flight a pipeline runs before sizing
    * `spark.sql.shuffle.partitions` or deciding a key needs salting
    * (q46_skew_salted is the cure; this is the diagnosis). One count
    * aggregate + a broadcast one-row total.
    */
  private val SkewParts = 32L

  def q75Skewstats(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "lineitem")
      .select(
        pmod(
          graft.functions.Hashing
            .md5Long60(concat(lit("skew|"), col("l_partkey").cast("string"))),
          lit(SkewParts)).as("partition_id"))
      .groupBy("partition_id")
      .agg(count(lit(1)).as("n_rows"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n_rows")).as("total"))))
      .select(
        col("partition_id"),
        col("n_rows"),
        (col("n_rows") * lit(SkewParts) / col("total")).as("load_factor"))
      .orderBy("partition_id")
  }

  val q75SkewstatsSql: String = {
    val bucket = graft.functions.Hashing.sqlMd5Long60Duck("'skew|' || l_partkey::VARCHAR")
    s"""WITH c AS (SELECT ($bucket) % $SkewParts AS partition_id, count(*) AS n_rows
        FROM lineitem GROUP BY partition_id),
      t AS (SELECT sum(n_rows)::BIGINT AS total FROM c)
      SELECT partition_id, n_rows::BIGINT AS n_rows,
        (n_rows::BIGINT * $SkewParts)::BIGINT / t.total::BIGINT AS load_factor
      FROM c, t ORDER BY partition_id"""
  }

  // ---- ORC roundtrip (third columnar format; pruning + pushdown) ----------
  // Same sink→source proof shape as q18_csv_roundtrip, for the OTHER
  // columnar on-disk format Spark ships natively: orders lands as
  // status-partitioned ORC, the read back must (a) prune to the one
  // o_orderstatus='F' partition directory and (b) push the totalprice
  // predicate into the ORC scan (searchArguments) — both asserted on the
  // physical plan by PlanAssertionsSpec, both the behaviors that keep a
  // 100 TB ORC lake readable without full scans.

  def q76OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val dest = SessionMemo.tmpDir(spark, "q76_orc")
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        col("o_totalprice"),
        col("o_orderpriority"),
        col("o_orderstatus"))
      .write
      .mode("overwrite")
      .partitionBy("o_orderstatus")
      .orc(dest)
    spark.read
      .orc(dest)
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 50000)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"))
      .orderBy("o_orderpriority")
  }

  val q76OrcRoundtripSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS total_price
      FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 50000
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- 6-table star join (TPC-H Q5 shape: local supplier volume) ----------

  /** Revenue per nation where customer and supplier share the nation,
    * region-filtered — the canonical multiway join. Plan shape at scale:
    * only region→nation carries an explicit broadcast hint (truly
    * constant-size — region is 5 rows at 100 TB too). Customer and
    * supplier are SF-PROPORTIONAL, so they get NO hint: a forced
    * broadcast would OOM the driver at large SF; instead size-based
    * planning + AQE picks broadcast while they fit under the threshold
    * and falls back to a shuffled join beyond it (at test SF both still
    * broadcast, which the plan spec checks). The fact-keyed joins
    * (lineitem⋈orders on orderkey, orders⋈customer on custkey) are the
    * legitimate exchanges at scale. Catalyst pushes the region filter
    * through the whole dim chain before any fact row moves.
    *
    * Revenue terms: `l_extendedprice * (1 - l_discount)` is one IEEE
    * double product per row (bit-identical both engines), each term cast
    * to DECIMAL(18,4) (never an exact half-tie: a binary double cannot
    * land exactly on a 5-ending decimal at the 4th place), summed exactly,
    * one final cast to double.
    */
  def q77Tpch5(spark: SparkSession, dir: String): DataFrame = {
    val nations = t(spark, dir, "nation")
      .join(t(spark, dir, "region").filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = t(spark, dir, "customer")
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val supp = t(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(
        count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy("n_name")
  }

  val q77Tpch5Sql: String =
    """SELECT n_name, count(*) AS n_items,
      sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))::DOUBLE AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name ORDER BY n_name"""

  // ---- TPC-H Q7 volume shipping -------------------------------------------

  private val Q92NationA = "NATION_1"
  private val Q92NationB = "NATION_2"

  /** TPC-H Q7 shape (volume shipping): bilateral trade between two fixed
    * nations by shipment year — lineitem joined to its supplier's nation
    * and its order's customer's nation, keeping only the two (A→B, B→A)
    * pairs, grouped by (supp_nation, cust_nation, year).
    *
    * Plan discipline at 100 TB: `nation` (25 rows) is BROADCAST onto
    * supplier and customer BEFORE those SF-proportional dims join the
    * fact, so the nation filter prunes both dim sides early and only the
    * two surviving nations' customers/suppliers reach the fact joins —
    * which stay shuffle joins on their natural keys (no broadcast of an
    * SF-proportional side; the r5 q77 advice item). Revenue sums exact
    * DECIMAL(18,4) per-row products — order-independent — then presents
    * as double.
    */
  def q92Tpch7(spark: SparkSession, dir: String): DataFrame = {
    val n = t(spark, dir, "nation")
      .filter(col("n_name").isin(Q92NationA, Q92NationB))
      .select(col("n_nationkey"), col("n_name"))
    val supp = t(spark, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t(spark, dir, "customer")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(
        col("supp_nation"),
        col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(
        count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q92Tpch7Sql: String =
    s"""SELECT supp_nation, cust_nation, l_year, count(*) AS n_items,
      sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))::DOUBLE AS revenue
      FROM (
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
          year(l_shipdate)::BIGINT AS l_year, l_extendedprice, l_discount
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        WHERE ns.n_name IN ('$Q92NationA', '$Q92NationB')
          AND nc.n_name IN ('$Q92NationA', '$Q92NationB')
          AND ns.n_name <> nc.n_name)
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year"""

  // ---- TPC-H Q20 shape: dominant suppliers --------------------------------

  private val Q93Brand = "Brand#1"
  private val Q93PctMin = 10L

  /** TPC-H Q20 shape (excess-stock suppliers, reshaped onto this schema's
    * tables): for every part of one brand, find the suppliers who shipped
    * MORE THAN [[Q93PctMin]]% of that part's total shipped quantity, then
    * emit each such supplier with its dominant-part count — the
    * "concentration risk" audit. The classic correlated subquery
    * (`qty > 0.3 * (SELECT total FROM ...)`) is DECORRELATED into two
    * aggregates joined on the part key: per-(part, supplier) quantities
    * and per-part totals — the rewrite that turns an O(pairs × parts)
    * re-aggregation into two hash aggregates and one equi-join, exactly
    * what survives at 100 TB. The threshold compare is exact integer
    * cross-multiplication (`qty·100 > pct·total`) — no ratio doubles.
    */
  def q93Tpch20(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = t(spark, dir, "part")
      .filter(col("p_brand") === Q93Brand)
      .select(col("p_partkey"))
    val shipped = t(spark, dir, "lineitem")
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity").cast("long").as("qty"))
    val perPair = shipped
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum("qty").as("pair_qty"))
    val perPart = shipped
      .groupBy("l_partkey")
      .agg(sum("qty").as("part_qty"))
    val dominant = perPair
      .join(perPart, Seq("l_partkey"))
      .filter(col("pair_qty") * 100 > lit(Q93PctMin) * col("part_qty"))
    dominant
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_dominant"), sum("pair_qty").as("dom_qty"))
      .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_dominant"), col("dom_qty"))
      .orderBy("s_suppkey")
  }

  val q93Tpch20Sql: String =
    s"""WITH shipped AS (SELECT l_partkey, l_suppkey, l_quantity::BIGINT AS qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = '$Q93Brand'),
      pair AS (SELECT l_partkey, l_suppkey, sum(qty)::BIGINT AS pair_qty
        FROM shipped GROUP BY l_partkey, l_suppkey),
      tot AS (SELECT l_partkey, sum(qty)::BIGINT AS part_qty
        FROM shipped GROUP BY l_partkey),
      dom AS (SELECT p.l_suppkey, p.pair_qty
        FROM pair p JOIN tot t ON t.l_partkey = p.l_partkey
        WHERE p.pair_qty * 100 > $Q93PctMin * t.part_qty)
      SELECT s_suppkey, s_name, count(*)::BIGINT AS n_dominant,
        sum(pair_qty)::BIGINT AS dom_qty
      FROM dom JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_suppkey, s_name ORDER BY s_suppkey"""

  // ---- gaps & islands: consecutive shipping-day streaks -------------------

  /** Gaps-and-islands over each supplier's shipping calendar: distinct
    * ship DATES per supplier, islands = maximal runs of consecutive days
    * (the classic `day_number − row_number` constant-per-island trick),
    * emitting islands count, longest/total streak days — the
    * activity-continuity audit shape (sensor uptime, crawl coverage,
    * login streaks). The only window partitions BY SUPPLIER and the
    * frame it sorts is each supplier's distinct-date list — bounded by
    * the calendar, not the fact table, so the pass scales by key, never
    * by corpus. All values integer day counts.
    */
  def q95Islands(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_suppkey")
      .orderBy("dnum")
    t(spark, dir, "lineitem")
      .select(
        col("l_suppkey"),
        datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("dnum"))
      .distinct()
      .withColumn("grp", col("dnum") - row_number().over(w))
      .groupBy("l_suppkey", "grp")
      .agg(count(lit(1)).as("run_days"))
      .groupBy("l_suppkey")
      .agg(
        count(lit(1)).as("n_islands"),
        max("run_days").as("longest_run"),
        sum("run_days").as("active_days"))
      .orderBy("l_suppkey")
  }

  val q95IslandsSql: String =
    """WITH d AS (SELECT DISTINCT l_suppkey,
          (l_shipdate::DATE - DATE '1970-01-01')::BIGINT AS dnum
        FROM lineitem),
      g AS (SELECT l_suppkey,
          dnum - row_number() OVER (PARTITION BY l_suppkey ORDER BY dnum) AS grp
        FROM d),
      runs AS (SELECT l_suppkey, grp, count(*)::BIGINT AS run_days
        FROM g GROUP BY l_suppkey, grp)
      SELECT l_suppkey, count(*)::BIGINT AS n_islands,
        max(run_days)::BIGINT AS longest_run, sum(run_days)::BIGINT AS active_days
      FROM runs GROUP BY l_suppkey ORDER BY l_suppkey"""

  // ---- TPC-H Q13: customer order-count distribution -----------------------

  /** TPC-H Q13 shape (customer distribution): how many customers placed
    * exactly k orders, INCLUDING k = 0 — the double-aggregation histogram
    * whose defining subtlety is the LEFT join from the dimension (a plain
    * group-by on orders silently drops order-less customers, the classic
    * retention-dashboard bug). First aggregate is per-customer on the
    * fact's natural key; the second collapses to a count-of-counts frame
    * bounded by max orders per customer, not by customers.
    */
  def q96Tpch13(spark: SparkSession, dir: String): DataFrame = {
    val perCust = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    t(spark, dir, "customer")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .na.fill(0L, Seq("n_orders"))
      .groupBy("n_orders")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("n_orders")
  }

  val q96Tpch13Sql: String =
    """SELECT n_orders, count(*)::BIGINT AS n_customers FROM (
        SELECT c_custkey, coalesce(o.n, 0)::BIGINT AS n_orders
        FROM customer LEFT JOIN (
          SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) o
        ON c_custkey = o_custkey)
      GROUP BY n_orders ORDER BY n_orders"""

  // ---- TPC-H Q3: shipping priority (top-k by exact revenue) ---------------

  private val Q3Cutoff = "1998-07-01"

  /** TPC-H Q3 shape: top-10 unshipped orders of one market segment by
    * revenue. The plan discipline is (a) both date filters and the
    * segment filter reach the scans (PushedFilters), so the join inputs
    * are the filtered minority of each table; (b) the top-10 is a
    * TakeOrderedAndProject — k rows per partition flow to the driver, not
    * a global sort. Ranking ties: revenue is summed as DECIMAL(18,4)
    * (exact, order-free — the q77 discipline) and the sort key is the
    * exact decimal with `l_orderkey` as tiebreak, so the selected 10 rows
    * are engine-independent; the double cast happens after selection.
    */
  def q97Tpch3(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
      .join(
        t(spark, dir, "orders").filter(col("o_orderdate") < lit(Q3Cutoff).cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(
        t(spark, dir, "lineitem").filter(col("l_shipdate") > lit(Q3Cutoff).cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).as("rev_dec"))
      .orderBy(col("rev_dec").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("rev_dec").cast("double").as("revenue"),
        col("o_orderdate"))

  val q97Tpch3Sql: String =
    s"""SELECT l_orderkey, rev_dec::DOUBLE AS revenue, o_orderdate FROM (
        SELECT l_orderkey, o_orderdate,
          sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS rev_dec
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '$Q3Cutoff'
          AND l_shipdate > TIMESTAMP '$Q3Cutoff'
        GROUP BY l_orderkey, o_orderdate)
      ORDER BY rev_dec DESC, l_orderkey LIMIT 10"""

  // ---- TPC-H Q10: returned-item reporting ---------------------------------

  private val Q10Start = "1998-01-01"
  private val Q10End = "1998-07-01"

  /** TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    * half-year window. Same exact-decimal ranking discipline as
    * [[q97Tpch3]] (ties broken by `c_custkey`); nation is the only
    * broadcast-hinted side (constant-size at any SF — the q77 rule:
    * customer/orders/lineitem carry NO hint so size-based planning + AQE
    * stays free to shuffle them at large SF).
    */
  def q98Tpch10(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .join(
        t(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit(Q10Start).cast("timestamp") &&
            col("o_orderdate") < lit(Q10End).cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).as("rev_dec"))
      .orderBy(col("rev_dec").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("rev_dec").cast("double").as("revenue"),
        col("c_acctbal"), col("n_name"))

  val q98Tpch10Sql: String =
    s"""SELECT c_custkey, c_name, rev_dec::DOUBLE AS revenue, c_acctbal, n_name FROM (
        SELECT c_custkey, c_name, c_acctbal, n_name,
          sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS rev_dec
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '$Q10Start'
          AND o_orderdate < TIMESTAMP '$Q10End'
        GROUP BY c_custkey, c_name, c_acctbal, n_name)
      ORDER BY rev_dec DESC, c_custkey LIMIT 20"""

  // ---- TPC-H Q14: promotion revenue share ---------------------------------

  private val Q14Start = "1997-09-01"
  private val Q14End = "1997-10-01"

  /** TPC-H Q14 shape: the share of one month's revenue from PROMO parts —
    * the conditional-aggregate ratio. Both the promo and total legs sum
    * exact DECIMAL(18,4) terms in ONE pass over the joined frame (a
    * `when` inside the sum, not two scans), then the output is one
    * correctly-rounded IEEE division of the two exact sums cast to
    * double — bit-identical across engines, no float-sum order issues.
    * The month filter reaches the lineitem scan; part joins on its key.
    */
  def q99Tpch14(spark: SparkSession, dir: String): DataFrame = {
    val term = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast("decimal(18,4)")
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(Q14Start).cast("timestamp") &&
        col("l_shipdate") < lit(Q14End).cast("timestamp"))
      .join(t(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", term).otherwise(lit(0).cast("decimal(18,4)")))
          .as("promo_dec"),
        sum(term).as("total_dec"))
      .select(
        (lit(100.0) * col("promo_dec").cast("double") / col("total_dec").cast("double"))
          .as("promo_pct"),
        col("promo_dec").cast("double").as("promo_revenue"),
        col("total_dec").cast("double").as("total_revenue"))
  }

  val q99Tpch14Sql: String =
    s"""SELECT 100.0 * promo_dec::DOUBLE / total_dec::DOUBLE AS promo_pct,
        promo_dec::DOUBLE AS promo_revenue, total_dec::DOUBLE AS total_revenue
      FROM (
        SELECT sum(CASE WHEN p_type = 'PROMO'
            THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
            ELSE CAST(0 AS DECIMAL(18,4)) END) AS promo_dec,
          sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS total_dec
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '$Q14Start'
          AND l_shipdate < TIMESTAMP '$Q14End')"""

  // ---- TPC-H Q19: disjunctive predicate join ------------------------------

  /** TPC-H Q19 shape: revenue from three brand/size/quantity bands OR'd
    * together — the disjunctive-predicate join. The plan point: Catalyst
    * must still run ONE equi-join on `l_partkey = p_partkey` (the
    * conjunct common to every disjunct) with the OR as a post-join
    * filter — never a nested-loop over the disjunction; per-side
    * implied filters (`p_size >= 1`, quantity bounds) are pushed to the
    * scans. One exact-decimal sum, one output row.
    */
  def q100Tpch19(spark: SparkSession, dir: String): DataFrame = {
    val band = (
      col("p_brand") === "Brand#2" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(band)
      .agg(
        count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
  }

  val q100Tpch19Sql: String =
    """SELECT count(*)::BIGINT AS n_items,
        sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))::DOUBLE AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5
          AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
          AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15
          AND l_quantity BETWEEN 20 AND 30)"""

  // ---- TPC-H Q22: idle high-balance customers -----------------------------

  private val Q22Lapse = "2000-01-01"

  /** TPC-H Q22 shape (global-threshold anti-join): customers whose
    * balance exceeds the positive-balance average and who have placed no
    * order since [[Q22Lapse]] (every synthetic customer has SOME order,
    * so the classic never-ordered predicate is vacuous here; lapsed-since
    * keeps the identical plan shape — pushed date filter + left-anti on
    * the order's customer key — with a non-trivial result), grouped by
    * market segment. The average is never materialized as a
    * float: the qualifying test `c_acctbal > avg` is rearranged to the
    * all-integer-exact `cast(c_acctbal as dec) * n > sum_dec` (decimal ×
    * count vs exact decimal sum), so threshold comparison is bit-exact on
    * both engines — no double-avg ordering hazard. The 1-row totals frame
    * is a broadcast cross join (a scalar at any SF); the no-orders test
    * is a left-anti join on the order's customer key.
    */
  def q101Tpch22(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    val totals = cust
      .filter(col("c_acctbal") > 0.0)
      .agg(
        count(lit(1)).as("n_pos"),
        sum(col("c_acctbal").cast("decimal(18,4)")).as("sum_pos"))
    cust
      .crossJoin(broadcast(totals))
      .filter(col("c_acctbal").cast("decimal(18,4)") * col("n_pos") > col("sum_pos"))
      .join(
        t(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit(Q22Lapse).cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_custs"),
        sum(col("c_acctbal").cast("decimal(18,4)")).cast("double").as("total_acctbal"))
      .orderBy("c_mktsegment")
  }

  val q101Tpch22Sql: String =
    s"""WITH tot AS (SELECT count(*) AS n_pos,
          sum(CAST(c_acctbal AS DECIMAL(18,4))) AS sum_pos
        FROM customer WHERE c_acctbal > 0.0)
      SELECT c_mktsegment, count(*)::BIGINT AS n_custs,
        sum(CAST(c_acctbal AS DECIMAL(18,4)))::DOUBLE AS total_acctbal
      FROM customer CROSS JOIN tot
      WHERE CAST(c_acctbal AS DECIMAL(18,4)) * n_pos > sum_pos
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '$Q22Lapse')
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // ---- TPC-H Q21 shape: suppliers who kept orders waiting ------------------

  private val Q21Late = "1997-06-01"
  private val Q21Nation = "NATION_3"

  /** TPC-H Q21's correlated EXISTS / NOT EXISTS pair, DECORRELATED the
    * Spark-first way: both subqueries are per-order supplier facts, so
    * ONE aggregate per order — distinct suppliers, distinct LATE
    * suppliers (late = shipped past [[Q21Late]]; the synthetic lineitem
    * has no receipt/commit dates, so lateness is adapted to the schema
    * like q89's Q2 shape) — replaces two correlated rescans of lineitem.
    * A late line qualifies iff its order has another supplier
    * (n_supp > 1) and NO OTHER late supplier (n_late_supp = 1 — the line
    * itself being late pins the one late supplier to be ours). Then the
    * standard star tail: status-F orders semi-filter, supplier dim,
    * nation filter, count per supplier, top-100. The oracle keeps the
    * textbook EXISTS/NOT-EXISTS form — the hash gate proves the
    * decorrelation equivalent.
    */
  def q103Tpch21(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
      .select(
        col("l_orderkey"),
        col("l_suppkey"),
        (col("l_shipdate") > lit(Q21Late).cast("timestamp")).as("late"))
    val perOrder = l
      .groupBy("l_orderkey")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
    l.filter(col("late"))
      .join(perOrder, Seq("l_orderkey"))
      .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
      .join(
        t(spark, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"),
        "left_semi")
      .join(
        broadcast(
          t(spark, dir, "supplier")
            .join(
              broadcast(t(spark, dir, "nation").filter(col("n_name") === Q21Nation)),
              col("s_nationkey") === col("n_nationkey"))
            .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q103Tpch21Sql: String =
    s"""WITH l AS (SELECT l_orderkey, l_suppkey,
          l_shipdate > TIMESTAMP '$Q21Late' AS late FROM lineitem)
      SELECT s.s_name, count(*)::BIGINT AS numwait
      FROM l l1
      JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
      JOIN supplier s ON s.s_suppkey = l1.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = '$Q21Nation'
      WHERE l1.late
        AND EXISTS (SELECT 1 FROM l l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM l l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.late)
      GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 100"""

  // ---- TPC-H Q7 shape: volume shipping between two nations -----------------

  private val Q7NationA = "NATION_18"
  private val Q7NationB = "NATION_19"

  /** TPC-H Q7 (volume shipping): revenue between a nation PAIR in both
    * directions, by ship year. Deliberately a SECOND Q7 on the surface
    * next to [[q92Tpch7]] — same logical query family, OPPOSITE plan
    * discipline, so the benchmark tracks both shapes: q92 prunes the
    * SF-proportional dims through the broadcast nation filter BEFORE
    * they reach the fact (dim-side early pruning; no fact-scan
    * predicate), while this variant drives a ship-date RANGE predicate
    * into the fact SCAN (parquet min/max pruning — the dominant lever
    * when the fact is 100 TB and date-partitioned) and applies the
    * nation filter as post-join broadcast lookups. A regression in
    * either pruning path moves exactly one of the two bench rows. The
    * two nation lookups are broadcast (25 rows);
    * customer/supplier/orders/lineitem are SF-proportional and stay
    * size-planned (the q77 lesson — a forced broadcast OOMs at large
    * SF). Money routes through DECIMAL(18,4) per row before the sum so
    * both engines add the same exact values, with ONE final cast to
    * double.
    */
  def q104Tpch7(spark: SparkSession, dir: String): DataFrame = {
    val n1 = broadcast(
      t(spark, dir, "nation")
        .filter(col("n_name").isin(Q7NationA, Q7NationB))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(
      t(spark, dir, "nation")
        .filter(col("n_name").isin(Q7NationA, Q7NationB))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    t(spark, dir, "lineitem")
      .filter(
        col("l_shipdate").between(
          lit("1995-01-01").cast("timestamp"),
          lit("1998-12-31").cast("timestamp")))
      .join(
        t(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(
        t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(
        t(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(
        col("supp_nation"),
        col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q104Tpch7Sql: String =
    s"""SELECT supp_nation, cust_nation, l_year,
        sum(CAST(volume AS DECIMAL(18,4)))::DOUBLE AS revenue
      FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          year(l.l_shipdate)::BIGINT AS l_year,
          l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = '$Q7NationA' AND n2.n_name = '$Q7NationB')
            OR (n1.n_name = '$Q7NationB' AND n2.n_name = '$Q7NationA'))
          AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1998-12-31')
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  // ---- TPC-H Q8 shape: national market share within a region ---------------

  private val Q8Region = "ASIA"
  private val Q8Nation = "NATION_19"
  private val Q8Type = "PROMO"

  /** TPC-H Q8 (market share): [[Q8Nation]]'s supplier share of the
    * [[Q8Type]]-part volume sold into [[Q8Region]], by order year — the
    * widest TPC-H star here (part, supplier, lineitem, orders, customer,
    * nation ×2, region). Region and the nation lookups broadcast; the
    * share is a division of two exactly-summed DECIMALs, cast to double
    * FIRST so both engines divide the same IEEE values (decimal-division
    * precision rules differ between engines; double division does not).
    */
  def q105Tpch8(spark: SparkSession, dir: String): DataFrame = {
    val custRegion = t(spark, dir, "customer")
      .join(
        broadcast(
          t(spark, dir, "nation")
            .join(
              broadcast(t(spark, dir, "region").filter(col("r_name") === Q8Region)),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey").as("c_nk"))),
        col("c_nationkey") === col("c_nk"))
      .select(col("c_custkey"))
    val suppNation = broadcast(
      t(spark, dir, "nation").select(col("n_nationkey").as("s_nk"), col("n_name").as("nation")))
    val volDec =
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")
    t(spark, dir, "lineitem")
      .join(
        t(spark, dir, "part").filter(col("p_type") === Q8Type).select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(
        t(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(suppNation, col("s_nationkey") === col("s_nk"))
      .join(
        t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custRegion, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        (sum(when(col("nation") === Q8Nation, volDec)
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
          sum(volDec).cast("double")).as("mkt_share"))
      .orderBy("o_year")
  }

  val q105Tpch8Sql: String =
    s"""SELECT o_year,
        (sum(CASE WHEN nation = '$Q8Nation' THEN CAST(volume AS DECIMAL(18,4))
              ELSE CAST(0 AS DECIMAL(18,4)) END)::DOUBLE /
         sum(CAST(volume AS DECIMAL(18,4)))::DOUBLE) AS mkt_share
      FROM (SELECT year(o.o_orderdate)::BIGINT AS o_year,
          l.l_extendedprice * (1 - l.l_discount) AS volume, n2.n_name AS nation
        FROM lineitem l
        JOIN part pt ON pt.p_partkey = l.l_partkey AND pt.p_type = '$Q8Type'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE EXISTS (SELECT 1 FROM customer c
          JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
          JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = '$Q8Region'
          WHERE c.c_custkey = o.o_custkey))
      GROUP BY o_year ORDER BY o_year"""

  // ---- TPC-H Q9 shape: product-type profit by nation and year -------------

  private val Q9NameToken = "widget"
  private val Q9CostFactor = 0.6

  /** TPC-H Q9 (product-type profit): per supplier nation and order year,
    * the profit on parts whose name contains a token. The harness schema
    * has no `partsupp`, so the supply cost is derived deterministically
    * from the part itself (`0.6 * p_retailprice * l_quantity` — the same
    * role `ps_supplycost * l_quantity` plays in the original): the
    * amount expression, five-table join topology, and (nation, o_year)
    * rollup are Q9's.
    *
    * Plan discipline at 100 TB: the `p_name` CONTAINS filter is pushed to
    * the part scan (a parquet StringContains pushdown) so the fact join
    * sees only matching parts; nation (25 rows) broadcasts onto supplier;
    * lineitem⋈orders stays a size-planned shuffle on the order key. Money
    * routes through DECIMAL(18,4) per row before the sum (exact,
    * order-independent), ONE final cast to double.
    */
  def q106Tpch9(spark: SparkSession, dir: String): DataFrame = {
    val pt = t(spark, dir, "part")
      .filter(col("p_name").contains(Q9NameToken))
      .select(col("p_partkey"), col("p_retailprice"))
    val supp = t(spark, dir, "supplier")
      .join(
        broadcast(t(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    t(spark, dir, "lineitem")
      .join(pt, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(
        t(spark, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          lit(Q9CostFactor) * col("p_retailprice") * col("l_quantity"))
          .cast("decimal(18,4)")).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q106Tpch9Sql: String =
    s"""SELECT nation, o_year, sum(CAST(amount AS DECIMAL(18,4)))::DOUBLE AS sum_profit
      FROM (SELECT n.n_name AS nation, year(o.o_orderdate)::BIGINT AS o_year,
          l.l_extendedprice * (1 - l.l_discount)
            - $Q9CostFactor * p.p_retailprice * l.l_quantity AS amount
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND contains(p.p_name, '$Q9NameToken')
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey)
      GROUP BY nation, o_year ORDER BY nation, o_year DESC"""

  // ---- TPC-H Q11 shape: important stock (scalar-threshold HAVING) ---------

  // NATION_8 is the lowest-key nation with supplier coverage at EVERY
  // harness SF (NATION_7 has zero suppliers at sf0.001, which left the
  // whole query empty there regardless of threshold)
  private val Q11Nation = "NATION_8"

  /** TPC-H Q11 (important stock): per-part inventory value from one
    * nation's suppliers, keeping parts whose value exceeds a FRACTION OF
    * THE GLOBAL TOTAL — the scalar-aggregate-in-HAVING decorrelation
    * pattern. The harness schema has no `partsupp`, so the value ledger
    * is lineitem (`l_extendedprice * l_quantity` in place of
    * `ps_supplycost * ps_availqty`); the two-level aggregate, the
    * same-filtered scalar subquery, and the threshold semantics are
    * Q11's.
    *
    * Plan discipline at 100 TB: ONE aggregation pass builds the per-part
    * values; the global total re-aggregates THAT frame (part-count-sized,
    * not fact-sized), and rejoins as a 1-row broadcast — the fact is
    * scanned once and nothing fact-sized crosses the threshold join. The
    * threshold compare runs in EXACT arithmetic (`v * n_parts >
    * total * 2`, decimal × BIGINT — parts above 2× the mean part value,
    * the scale-free form of Q11's 0.0001/SF fraction), so
    * both engines keep or drop identical boundary rows — no
    * double-rounding at the cut.
    */
  def q107Tpch11(spark: SparkSession, dir: String): DataFrame = {
    val supp = t(spark, dir, "supplier")
      .join(
        broadcast(
          t(spark, dir, "nation").filter(col("n_name") === Q11Nation).select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    // Referenced twice (value side + the scalar total): persist the
    // part-count-sized aggregate so the fact scan+agg runs ONCE — the
    // agg-and-join-back double-scan was exactly q89's r7 defect.
    val perPart = graft.Caches.track(
      t(spark, dir, "lineitem")
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey").as("p_partkey"))
        .agg(sum((col("l_extendedprice") * col("l_quantity")).cast("decimal(18,4)")).as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // Scale-FREE threshold: TPC-H Q11's published fraction is 0.0001/SF
    // (it shrinks as the corpus grows); a fixed `v > tot/1000` went
    // vacuous at sf0.1 (0 rows — caught by the r13 vacuous-gate warning).
    // "v above 2x the MEAN part value" selects a stable tail fraction at
    // ANY scale (5x was still vacuous at sf0.001, where each part has
    // 1-2 national lineitems), and the compare stays exact (decimal x
    // BIGINT on both sides, never a double).
    val total = perPart.agg(sum(col("v")).as("tot"), count(lit(1)).as("np"))
    perPart
      .crossJoin(broadcast(total))
      .filter(col("v") * col("np") > col("tot") * lit(2))
      .select(col("p_partkey"), col("v").cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  val q107Tpch11Sql: String =
    s"""WITH supp AS (SELECT s_suppkey FROM supplier
          JOIN nation ON n_nationkey = s_nationkey WHERE n_name = '$Q11Nation'),
      per_part AS (SELECT l_partkey AS p_partkey,
          sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS v
        FROM lineitem JOIN supp ON s_suppkey = l_suppkey
        GROUP BY l_partkey),
      tot AS (SELECT sum(v) AS tot, count(*)::BIGINT AS np FROM per_part)
      SELECT p_partkey, v::DOUBLE AS value
      FROM per_part, tot
      WHERE v * np > tot * 2
      ORDER BY value DESC, p_partkey"""

  // ---- TPC-H Q15 shape: top supplier (tie-exact max-revenue view) ---------

  private val Q15Start = "1996-01-01"
  private val Q15End = "1996-04-01"

  /** TPC-H Q15 (top supplier): the quarterly revenue VIEW per supplier,
    * filtered to the supplier(s) whose revenue EQUALS the view's maximum
    * — Q15's tie-exact semantics (every tied supplier returned, which is
    * why the original uses `= (SELECT max(...))`, not `LIMIT 1`).
    *
    * Plan discipline at 100 TB: the revenue view is one aggregate over
    * the date-pruned fact scan (the BETWEEN range reaches the parquet
    * reader); the max re-aggregates the supplier-count-sized view and
    * rejoins as a 1-row broadcast; only the winners (bounded by tie
    * count) touch the supplier dimension, as a broadcast equi-join.
    * Revenue accumulates in EXACT decimal and the max-equality compare
    * runs on those decimals, so tie membership is bit-deterministic
    * cross-engine; ONE final cast to double.
    */
  def q108Tpch15(spark: SparkSession, dir: String): DataFrame = {
    // Referenced twice (winner filter + the scalar max): persist the
    // supplier-count-sized view so the date-pruned fact scan runs ONCE.
    val rev = graft.Caches.track(
      t(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit(Q15Start).cast("timestamp") &&
          col("l_shipdate") < lit(Q15End).cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val maxRev = rev.agg(max(col("rev")).as("max_rev"))
    val winners = rev.crossJoin(broadcast(maxRev)).filter(col("rev") === col("max_rev"))
    t(spark, dir, "supplier")
      .join(broadcast(winners), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q108Tpch15Sql: String =
    s"""WITH rev AS (SELECT l_suppkey,
          sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '$Q15Start' AND l_shipdate < TIMESTAMP '$Q15End'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, rev::DOUBLE AS total_revenue
      FROM supplier JOIN rev ON l_suppkey = s_suppkey
      WHERE rev = (SELECT max(rev) FROM rev)
      ORDER BY s_suppkey"""

  // ---- TPC-H Q17 shape: small-quantity-order revenue ----------------------

  private val Q17Brand = "Brand#13"

  /** TPC-H Q17 (small-quantity-order revenue): average yearly revenue lost
    * if small orders (below 20% of the part's mean order quantity) were
    * not filled. The correlated `avg(l_quantity)` subquery is written as
    * `avg OVER (PARTITION BY p_partkey)` + filter — the SAME
    * window-decorrelation q89_tpch2 adopted after its agg+join-back form
    * double-scanned the fact (one scan, one shuffle on partkey; the mean
    * and the filter ride the same exchange).
    *
    * Float discipline: `l_quantity` is integral (1..50), so the window
    * SUM is exact in double at any accumulation order and avg = sum/count
    * is ONE correctly-rounded division — cross-engine deterministic with
    * no decimal routing needed. The revenue sum still routes DECIMAL.
    */
  def q109Tpch17(spark: SparkSession, dir: String): DataFrame = {
    val pt = t(spark, dir, "part")
      .filter(col("p_brand") === Q17Brand)
      .select(col("p_partkey"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("p_partkey")
    t(spark, dir, "lineitem")
      .join(pt, col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty", avg(col("l_quantity")).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double") / 7.0)
        .as("avg_yearly"))
  }

  val q109Tpch17Sql: String =
    s"""SELECT sum(CAST(l_extendedprice AS DECIMAL(18,4)))::DOUBLE / 7.0 AS avg_yearly
      FROM (SELECT l_extendedprice, l_quantity,
          avg(l_quantity) OVER (PARTITION BY p_partkey) AS avg_qty
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = '$Q17Brand')
      WHERE l_quantity < 0.2 * avg_qty"""

  // ---- TPC-H Q4 shape: order priority checking ----------------------------

  private val Q4Start = "1997-01-01"
  private val Q4End = "1997-04-01"
  private val Q4LateDays = 60

  /** TPC-H Q4 (order priority checking): orders placed in one quarter
    * with at least one LATE line item, counted by priority. The original
    * correlates on `l_commitdate < l_receiptdate`; the harness schema has
    * neither column, so "late" is a shipment more than [[Q4LateDays]]
    * after the order date — the EXISTS → LEFT-SEMI decorrelation and the
    * quarter-pruned orders scan are Q4's.
    *
    * Scale shape: the date window reaches the orders parquet scan
    * (min/max pruning on a date-partitioned 100 TB orders table keeps the
    * probe side small), the semi join keys on the order key, and lineitem
    * is never aggregated — the semi join short-circuits per order.
    */
  def q110Tpch4(spark: SparkSession, dir: String): DataFrame = {
    // Referenced twice (the late-lineitem join and the outer semi join):
    // persist the quarter-pruned frame so the orders scan+filter runs
    // ONCE — Spark dedupes exchanges, not scans (the q89/q107/q108
    // discipline).
    val o = graft.Caches.track(
      t(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit(Q4Start).cast("timestamp") &&
          col("o_orderdate") < lit(Q4End).cast("timestamp"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val late = t(spark, dir, "lineitem")
      .join(
        o.select(col("o_orderkey").as("k"), col("o_orderdate").as("od")),
        col("l_orderkey") === col("k"))
      .filter(col("l_shipdate") > col("od") + expr(s"INTERVAL $Q4LateDays DAYS"))
      .select(col("l_orderkey"))
    o.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q110Tpch4Sql: String =
    s"""SELECT o_orderpriority, count(*)::BIGINT AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '$Q4Start' AND o_orderdate < TIMESTAMP '$Q4End'
        AND EXISTS (SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL $Q4LateDays DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- TPC-H Q6 shape: forecasting revenue change -------------------------

  /** TPC-H Q6 (forecasting revenue change): one filtered scan, one global
    * sum — deliberately the SIMPLEST query in the sweep, because it is
    * the purest pushdown test: all three predicates (date range, discount
    * band, quantity cap) must reach the parquet reader, and the plan is a
    * map-only aggregate with no exchange before the final 1-row merge.
    * Revenue routes DECIMAL per row.
    */
  def q111Tpch6(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)"))
        .cast("double").as("revenue"))

  val q111Tpch6Sql: String =
    """SELECT sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))::DOUBLE AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""

  // ---- TPC-H Q12 shape: shipping-class priority split ---------------------

  /** TPC-H Q12 (shipping modes and order priority): per shipping class,
    * how many critical-priority vs other orders shipped in a year — the
    * join + CASE-split conditional aggregation. The harness schema has no
    * `l_shipmode`, so the class is the part's `p_type` restricted to two
    * values (the original restricts to two ship modes); the
    * lineitem⋈orders join, the year window, and the two CASE counts are
    * Q12's.
    */
  def q112Tpch12(spark: SparkSession, dir: String): DataFrame = {
    val critical = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(
        t(spark, dir, "part").filter(col("p_type").isin("PROMO", "ECONOMY"))
          .select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .join(
        t(spark, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("p_type").as("ship_class"))
      .agg(
        sum(when(critical, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(critical, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("ship_class")
  }

  val q112Tpch12Sql: String =
    """SELECT p_type AS ship_class,
        sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT
          AS high_line_count,
        sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT
          AS low_line_count
      FROM lineitem
      JOIN part ON p_partkey = l_partkey AND p_type IN ('PROMO', 'ECONOMY')
      JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY p_type ORDER BY ship_class"""

  // ---- TPC-H Q16 shape: parts/supplier relationship -----------------------

  /** TPC-H Q16 (parts/supplier relationship): how many distinct suppliers
    * can supply each part class, excluding a complaints blacklist — the
    * distinct-count + NOT-IN-subquery (anti join) composite. The harness
    * schema has no partsupp, so the supply relation is the DISTINCT
    * (part, supplier) pairs observed in lineitem; the blacklist (the
    * original's `comment LIKE '%Complaints%'` suppliers) is a
    * deterministic key-based subset. The anti join must stay key-only
    * (supplier-count-sized broadcast), and the distinct-count aggregate
    * keys on the class triple.
    */
  def q113Tpch16(spark: SparkSession, dir: String): DataFrame = {
    val blacklist = t(spark, dir, "supplier")
      .filter(col("s_suppkey") % 7 === 0)
      .select(col("s_suppkey").as("bad_key"))
    val supply = t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .distinct()
      .join(broadcast(blacklist), col("l_suppkey") === col("bad_key"), "left_anti")
    supply
      .join(
        t(spark, dir, "part")
          .filter(col("p_size").isin(1, 9, 17, 25, 33, 41, 49))
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q113Tpch16Sql: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            WHERE l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)) ps
      JOIN part ON p_partkey = l_partkey AND p_size IN (1, 9, 17, 25, 33, 41, 49)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  // ---- TPC-H Q1 shape: the full pricing summary ---------------------------

  /** TPC-H Q1 at full fidelity (q1_agg is the two-column sibling): the
    * canonical pricing summary — 2 group keys, 8 aggregates incl. three
    * means, over the date-bounded fact scan. The means are
    * `sum(DECIMAL)/count` in double (NOT the engines' float `avg`, whose
    * accumulation order differs) — exact numerators, one division, bit-
    * identical cross-engine. The two PRODUCT sums (disc_price, charge)
    * ride a floor-scaled BIGINT grid instead of a double→DECIMAL cast:
    * at full-scan row counts the product doubles land on .xxxx5 rounding
    * ties often enough that the engines' cast-rounding conventions
    * visibly diverge (measured: 3 of 6 groups off by ~0.005 at sf0.01),
    * while `floor(x * 10000)` is one exact IEEE multiply + floor —
    * bit-identical everywhere, overflow-safe in BIGINT to ~9e14 in
    * summed value. Map-side partial aggregation compresses the scan to
    * |groups| rows per partition before the one exchange — the canonical
    * "aggregate early" shape that makes Q1 scan-bound at any scale.
    */
  def q114Tpch1(spark: SparkSession, dir: String): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")
    def grid(c: org.apache.spark.sql.Column) =
      (sum(floor(c * lit(10000.0)).cast("long")).cast("double") / 10000.0)
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        grid(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        grid(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q114Tpch1Sql: String =
    """SELECT l_returnflag, l_linestatus,
        sum(CAST(l_quantity AS DECIMAL(18,4)))::DOUBLE AS sum_qty,
        sum(CAST(l_extendedprice AS DECIMAL(18,4)))::DOUBLE AS sum_base_price,
        sum(floor(l_extendedprice * (1 - l_discount) * 10000.0)::BIGINT)::DOUBLE / 10000.0
          AS sum_disc_price,
        sum(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000.0)::BIGINT)::DOUBLE
          / 10000.0 AS sum_charge,
        sum(CAST(l_quantity AS DECIMAL(18,4)))::DOUBLE / count(*) AS avg_qty,
        sum(CAST(l_extendedprice AS DECIMAL(18,4)))::DOUBLE / count(*) AS avg_price,
        sum(CAST(l_discount AS DECIMAL(18,4)))::DOUBLE / count(*) AS avg_disc,
        count(*)::BIGINT AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""

  // ---- ordered conversion funnel (view → click → purchase) ----------------

  private val FunnelWindowUs = 48L * 3600L * 1000000L

  /** First-touch conversion funnel per user: t1 = first view, t2 = first
    * click AFTER t1, t3 = first purchase AFTER t2; depth = steps reached,
    * completed = full depth inside a 48 h window of t1 (the synthetic
    * event stream is sparse per user — first-view→first-purchase gaps run
    * 4–380 h — so 48 h splits the population instead of zeroing the flag). (The deterministic
    * first-touch variant — each step is a min over a filtered set, so the
    * result is order-independent; sliding-start variants maximize depth
    * over every candidate start and are quadratic per user.)
    *
    * Scale shape: three slim (user_id, ts) aggregates — each step filters
    * the event scan, joins the previous step's per-user frame (user-keyed,
    * one row per user) and takes a min; the event table is never shuffled
    * whole, and no window function touches the full stream.
    */
  def q78Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val users = ev.select("user_id").distinct()
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1_us"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, Seq("user_id"))
      .filter(col("us") > col("t1_us"))
      .groupBy("user_id").agg(min("us").as("t2_us"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, Seq("user_id"))
      .filter(col("us") > col("t2_us"))
      .groupBy("user_id").agg(min("us").as("t3_us"))
    users
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(
        col("user_id"),
        col("t1_us"),
        col("t2_us"),
        col("t3_us"),
        (when(col("t1_us").isNull, 0)
          .otherwise(lit(1) + when(col("t2_us").isNull, 0).otherwise(1) +
            when(col("t3_us").isNull, 0).otherwise(1))).cast("long").as("depth"),
        (col("t3_us").isNotNull &&
          col("t3_us") - col("t1_us") <= FunnelWindowUs).as("completed"))
      .orderBy("user_id")
  }

  val q78FunnelSql: String =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      users AS (SELECT DISTINCT user_id FROM ev),
      s1 AS (SELECT user_id, min(us) AS t1_us FROM ev WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (SELECT ev.user_id, min(us) AS t2_us FROM ev JOIN s1 USING (user_id)
             WHERE event_type = 'click' AND us > t1_us GROUP BY ev.user_id),
      s3 AS (SELECT ev.user_id, min(us) AS t3_us FROM ev JOIN s2 USING (user_id)
             WHERE event_type = 'purchase' AND us > t2_us GROUP BY ev.user_id)
      SELECT u.user_id, t1_us, t2_us, t3_us,
        (CASE WHEN t1_us IS NULL THEN 0
              ELSE 1 + (CASE WHEN t2_us IS NULL THEN 0 ELSE 1 END)
                     + (CASE WHEN t3_us IS NULL THEN 0 ELSE 1 END) END)::BIGINT AS depth,
        (t3_us IS NOT NULL AND t3_us - t1_us <= $FunnelWindowUs) AS completed
      FROM users u
      LEFT JOIN s1 USING (user_id)
      LEFT JOIN s2 USING (user_id)
      LEFT JOIN s3 USING (user_id)
      ORDER BY u.user_id"""

  // ---- exact equi-depth histogram (two-pass global rank) ------------------

  private val HistBuckets = 16

  /** Exact 16-bucket equi-depth histogram of `l_extendedprice`: bucket
    * boundaries at exact global rank positions, per-bucket row count,
    * bounds, and decimal-exact sum. The global total order comes from
    * [[graft.operators.GlobalRank]] (range-repartition + per-partition
    * offsets) — NOT a single-partition `Window.orderBy`, which is the
    * classic 100 TB cliff for profiling queries. Bucket assignment is
    * integer arithmetic on exact ranks: `(rank-1)*B div N` — identical on
    * both engines.
    */
  def q79Histogram(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_extendedprice").as("p"), col("l_orderkey"), col("l_linenumber"))
    val n = li.count()
    graft.operators.GlobalRank
      .withRank(li, Seq(col("p"), col("l_orderkey"), col("l_linenumber")), "rk")
      .withColumn("bucket", expr(s"((rk - 1) * $HistBuckets) div $n"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("p")).as("lo"),
        max(col("p")).as("hi"),
        sum(col("p").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy("bucket")
  }

  val q79HistogramSql: String =
    s"""WITH r AS (SELECT l_extendedprice AS p,
        row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) - 1 AS rk,
        count(*) OVER () AS n
      FROM lineitem)
      SELECT rk * $HistBuckets // n AS bucket, count(*) AS n_rows,
        min(p) AS lo, max(p) AS hi,
        sum(CAST(p AS DECIMAL(18,2)))::DOUBLE AS total
      FROM r GROUP BY 1 ORDER BY 1"""

  // ---- session path analysis (top user journeys) --------------------------

  /** Distribution of session-opening journeys: each session's first three
    * event types (30-min gap sessions, q14's machinery) joined into a
    * `a>b>c` path, counted across all sessions. The product-analytics
    * "top user journeys" query. Scale shape: the gaps-and-islands windows
    * partition by user (parallel at any scale), the path assembly is a
    * map-side-combined (user, session) aggregate, and the final path
    * distribution aggregates on a low-cardinality key.
    */
  def q80Paths(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val sess = events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn(
        "ns",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sess", sum(col("ns")).over(byUser))
    sess
      .groupBy("user_id", "sess")
      .agg(sort_array(collect_list(struct(col("us"), col("event_id"), col("event_type"))))
        .as("evs"))
      .select(
        concat_ws(">", transform(slice(col("evs"), 1, 3), e => e.getField("event_type")))
          .as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
  }

  val q80PathsSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      w AS (SELECT *, lag(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us FROM e),
      s AS (SELECT *, sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY us, event_id) AS sess FROM w),
      r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sess ORDER BY us, event_id) AS rn FROM s),
      p AS (SELECT user_id, sess, string_agg(event_type, '>' ORDER BY rn) AS path
            FROM r WHERE rn <= 3 GROUP BY user_id, sess)
      SELECT path, count(*) AS n_sessions FROM p GROUP BY path
      ORDER BY n_sessions DESC, path"""

  // ---- cohort retention triangle ------------------------------------------

  /** Weekly cohort retention: users grouped by first-activity week, then
    * for each (cohort, weeks-since) cell the distinct returning users and
    * the retained fraction. Weeks are INTEGER epoch-week indexes
    * (`us div 604800e6`) — calendar-free, so both engines bucket
    * identically. Scale shape: one (user, week) distinct (map-side
    * combined), one per-user min for the cohort, one broadcast-sized
    * cohort-size join; no window over the event stream.
    */
  def q81Retention(spark: SparkSession, dir: String): DataFrame = {
    val wk = events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 604800000000").as("week"))
      .distinct()
    val cohort = wk.groupBy("user_id").agg(min("week").as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week").agg(countDistinct("user_id").as("cohort_users"))
    wk.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(countDistinct("user_id").as("n_active"))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(
        col("cohort_week"),
        col("weeks_since"),
        col("n_active"),
        col("cohort_users"),
        (col("n_active").cast("double") / col("cohort_users").cast("double")).as("retention"))
      .orderBy("cohort_week", "weeks_since")
  }

  val q81RetentionSql: String =
    """WITH wk AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
      cohort AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id),
      sizes AS (SELECT cohort_week, count(DISTINCT user_id) AS cohort_users
                FROM cohort GROUP BY cohort_week)
      SELECT c.cohort_week, w.week - c.cohort_week AS weeks_since,
        count(DISTINCT w.user_id) AS n_active, s.cohort_users,
        count(DISTINCT w.user_id)::DOUBLE / s.cohort_users::DOUBLE AS retention
      FROM wk w JOIN cohort c USING (user_id) JOIN sizes s ON s.cohort_week = c.cohort_week
      GROUP BY c.cohort_week, w.week - c.cohort_week, s.cohort_users
      ORDER BY c.cohort_week, weeks_since"""

  // ---- large-volume orders (TPC-H Q18 shape) ------------------------------

  private val Tpch18MinQty = 250L

  /** TPC-H Q18: customers with orders whose total line quantity exceeds a
    * threshold — the aggregate-then-semi-join shape. The HAVING aggregate
    * runs over the slim (orderkey, quantity) projection with map-side
    * combine; the qualifying-key set is orders-of-magnitude smaller than
    * lineitem (204 of 14,743 orders at sf0.01), so it broadcasts into
    * orders and the fact table is never shuffled on the probe side. At
    * 100 TB the same plan holds — the filtered key set stays
    * threshold-bounded — and AQE demotes to a shuffle join if it doesn't.
    * Quantities are integral, so the DOUBLE sum is exact and casts to
    * BIGINT deterministically on both engines.
    */
  def q82Tpch18(spark: SparkSession, dir: String): DataFrame = {
    val big = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").cast("long").as("total_qty"))
      .filter(col("total_qty") > Tpch18MinQty)
    t(spark, dir, "orders")
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_custkey"),
        col("c_name"),
        col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("odate_us"),
        col("o_totalprice"),
        col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  val q82Tpch18Sql: String =
    s"""WITH big AS (SELECT l_orderkey, sum(l_quantity)::BIGINT AS total_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity)::BIGINT > $Tpch18MinQty)
      SELECT c_custkey, c_name, o_orderkey, epoch_us(o_orderdate) AS odate_us,
        o_totalprice, total_qty
      FROM orders JOIN big ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY total_qty DESC, o_orderkey"""

  // ---- last-touch attribution ---------------------------------------------

  /** Last-touch attribution: each purchase is credited to the same user's
    * most recent preceding non-purchase event. Reuses the
    * [[graft.operators.AsOfJoin]] union-window formulation — ONE shuffle of
    * |purchases| + |touches| rows on user_id, no pair blowup — where the
    * naive formulation joins every purchase to every earlier touch
    * (O(pairs), the plan the oracle is allowed to pay at sf0.01 but a
    * 100 TB event stream cannot). Equal-timestamp touches are pre-reduced
    * to the greatest event_id, making the attachment deterministic.
    */
  def q83Attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(
      col("event_id"),
      col("user_id"),
      col("event_type"),
      unix_micros(col("ts")).as("us"))
    val probe = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "us")
    val build = ev
      .filter(col("event_type") =!= "purchase")
      .groupBy("user_id", "us")
      // max + max_by, mirroring the oracle's max/arg_max. (Both this and
      // max-of-struct sort-aggregate: the string buffer keeps either off
      // the hash-agg path; the per-partition sorts are group-bounded.)
      .agg(
        max(col("event_id")).as("touch_id"),
        max_by(col("event_type"), col("event_id")).as("touch_type"))
      .select(col("user_id"), col("us"), col("touch_id"), col("touch_type"))
    graft.operators.AsOfJoin
      .asOf(probe, build, key = "user_id", time = "us",
        buildValues = Seq("touch_id", "touch_type"))
      .select(
        col("event_id"),
        col("user_id"),
        col("us"),
        col("asof_us").as("touch_us"),
        col("touch_id"),
        col("touch_type"),
        (col("us") - col("asof_us")).as("gap_us"))
      .orderBy("event_id")
  }

  val q83AttributionSql: String =
    """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
      p AS (SELECT event_id, user_id, us FROM ev WHERE event_type = 'purchase'),
      b AS (SELECT user_id, us, max(event_id) AS touch_id,
            arg_max(event_type, event_id) AS touch_type
            FROM ev WHERE event_type <> 'purchase' GROUP BY user_id, us),
      j AS (SELECT p.event_id, p.user_id, p.us, b.us AS touch_us, b.touch_id, b.touch_type,
            row_number() OVER (PARTITION BY p.event_id ORDER BY b.us DESC) AS rn
            FROM p LEFT JOIN b ON b.user_id = p.user_id AND b.us <= p.us)
      SELECT event_id, user_id, us, touch_us, touch_id, touch_type,
        us - touch_us AS gap_us
      FROM j WHERE rn = 1 ORDER BY event_id"""

  // ---- last-touch attribution on the custom sort-merge as-of exec ---------

  /** q83's attribution computed by the OTHER as-of backend: the custom
    * [[graft.plans.AsOfMergeJoinExec]] physical operator (logical node →
    * planner strategy → streaming-merge exec, injected via
    * `SparkSessionExtensions`) instead of the union-window composition.
    * Same oracle as q83, so the custom exec is proven against DuckDB
    * end-to-end, not just against the sibling backend (AsOfMergeSpec).
    * Plan shape: both sides hash-clustered on user_id and sorted by
    * (user_id, us) by EnsureRequirements, then ONE forward pass per
    * partition with O(1) state — no union widening, no window frames.
    */
  def q85AsofExec(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(
      col("event_id"),
      col("user_id"),
      col("event_type"),
      unix_micros(col("ts")).as("us"))
    val probe = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "us")
    val build = ev
      .filter(col("event_type") =!= "purchase")
      .groupBy("user_id", "us")
      // max + max_by, mirroring the oracle's max/arg_max. (Both this and
      // max-of-struct sort-aggregate: the string buffer keeps either off
      // the hash-agg path; the per-partition sorts are group-bounded.)
      .agg(
        max(col("event_id")).as("touch_id"),
        max_by(col("event_type"), col("event_id")).as("touch_type"))
      .select(col("user_id"), col("us"), col("touch_id"), col("touch_type"))
    graft.plans.AsOfMerge
      .asOf(probe, build, key = "user_id", time = "us",
        buildValues = Seq("touch_id", "touch_type"))
      .select(
        col("event_id"),
        col("user_id"),
        col("us"),
        col("asof_us").as("touch_us"),
        col("touch_id"),
        col("touch_type"),
        (col("us") - col("asof_us")).as("gap_us"))
      .orderBy("event_id")
  }

  // ---- incremental view maintenance (signed delta merge) ------------------

  /** Incremental maintenance of a grouped aggregate under a CDC delta:
    * the stored MV (per-priority count + DECIMAL revenue over the base
    * snapshot) is updated by MERGING a signed delta aggregate — inserts
    * count +1, deletes −1 with negated revenue — and dropping groups
    * whose maintained count reaches zero. No base rescan in the
    * maintenance path: cost ∝ |delta| + |MV| (here the base aggregate
    * stands in for the stored MV, built once from the simulated
    * snapshot). The oracle recomputes the post-delta state from scratch,
    * so the gate proves the retraction algebra — the property IVM
    * engines must hold — not just the arithmetic.
    */
  def q86Ivm(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val base = orders.filter(col("o_orderkey") % 10 < 8)
    val deletes = orders.filter(col("o_orderkey") % 10 === 7)
    val inserts = orders.filter(col("o_orderkey") % 10 >= 8)
    def agg(df: DataFrame, sign: Int): DataFrame =
      df.groupBy("o_orderpriority")
        .agg(
          (count(lit(1)) * sign).as("dn"),
          (sum(col("o_totalprice").cast("decimal(18,2)")) * sign).as("drev"))
    val mv = agg(base, 1).select(
      col("o_orderpriority"), col("dn").as("n"), col("drev").as("rev"))
    val delta = agg(inserts, 1)
      .unionByName(agg(deletes, -1))
      .groupBy("o_orderpriority")
      .agg(sum("dn").as("dn"), sum("drev").as("drev"))
    mv.join(delta, Seq("o_orderpriority"), "full_outer")
      .select(
        col("o_orderpriority"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("rev"), lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)")) +
          coalesce(col("drev"), lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)")))
          .cast("double").as("rev"))
      .filter(col("n") > 0)
      .orderBy("o_orderpriority")
  }

  val q86IvmSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS rev
      FROM orders WHERE o_orderkey % 10 <> 7
      GROUP BY o_orderpriority HAVING count(*) > 0
      ORDER BY o_orderpriority"""

  // ---- k-anonymous release ------------------------------------------------

  private val KAnonK = 12L

  /** K-anonymous aggregate release: the (segment, nation) cell table is
    * published as-is where the cell population reaches [[KAnonK]], while
    * every smaller cell is pooled into one residual row per segment
    * (nation = -1) so no released row describes fewer than K individuals
    * — the small-cell suppression step of a privacy-preserving data
    * release. Exact DECIMAL money sums; the suppression regroup touches
    * only the below-K sliver, and both aggregates are map-side combined,
    * so the release costs two slim shuffles at any scale.
    */
  def q84Kanon(spark: SparkSession, dir: String): DataFrame = {
    val cells = t(spark, dir, "customer")
      .groupBy(col("c_mktsegment"), col("c_nationkey").cast("long").as("nation"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("c_acctbal").cast("decimal(18,2)")).as("bal"))
    val kept = cells
      .filter(col("n") >= KAnonK)
      .select(col("c_mktsegment"), col("nation"), col("n"), col("bal"),
        lit(1L).as("n_cells"))
    val pooled = cells
      .filter(col("n") < KAnonK)
      .groupBy("c_mktsegment")
      .agg(sum(col("n")).as("n"), sum(col("bal")).as("bal"), count(lit(1)).as("n_cells"))
      .select(col("c_mktsegment"), lit(-1L).as("nation"), col("n"), col("bal"),
        col("n_cells"))
    kept.unionByName(pooled)
      .select(col("c_mktsegment"), col("nation"), col("n"),
        col("bal").cast("double").as("bal"), col("n_cells"))
      .orderBy("c_mktsegment", "nation")
  }

  val q84KanonSql: String =
    s"""WITH cells AS (SELECT c_mktsegment, c_nationkey::BIGINT AS nation,
          count(*) AS n, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal
        FROM customer GROUP BY 1, 2),
      kept AS (SELECT c_mktsegment, nation, n, bal, 1::BIGINT AS n_cells
        FROM cells WHERE n >= $KAnonK),
      pooled AS (SELECT c_mktsegment, -1::BIGINT AS nation, sum(n)::BIGINT AS n,
          sum(bal) AS bal, count(*) AS n_cells
        FROM cells WHERE n < $KAnonK GROUP BY c_mktsegment)
      SELECT c_mktsegment, nation, n, bal::DOUBLE AS bal, n_cells
      FROM (SELECT * FROM kept UNION ALL SELECT * FROM pooled)
      ORDER BY c_mktsegment, nation"""

  // ---- SCD2 dimension build (type-2 slowly changing dimension) ------------

  /** SCD2 build from the event change log: per user, consecutive runs of
    * the same `event_type` collapse into one versioned validity interval
    * `[valid_from_us, valid_to_us)`; the last interval per user stays open
    * (`valid_to_us` null, `is_current` true) — the standard lakehouse
    * dimension-history table, built as gaps-and-islands: one `lag` flags
    * run starts, a running sum numbers versions, one aggregate collapses
    * each run, one `lead` closes intervals against the next run's start.
    *
    * Scale shape: every window and the aggregate partition by `user_id`,
    * so the whole build is ONE hash exchange of the slim
    * (user, time, type) projection reused across all four steps — no
    * global sort, no second shuffle, and per-user timelines are the only
    * serialization unit (the same bound every SCD2 merge has).
    * Determinism: run boundaries order by (us, event_id) — a total order.
    */
  def q88Scd2(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        col("event_id"),
        col("event_type"))
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val runs = ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn(
        "chg",
        when(col("prev_type").isNull || col("prev_type") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn(
        "version",
        sum(col("chg")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "version")
      .agg(
        min(col("event_type")).as("event_type"), // constant within the run
        min(col("us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val byVersion = Window.partitionBy("user_id").orderBy("version")
    runs
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(byVersion))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select(
        col("user_id"),
        col("version"),
        col("event_type"),
        col("valid_from_us"),
        col("valid_to_us"),
        col("n_events"),
        col("is_current"))
      .orderBy("user_id", "version")
  }

  val q88Scd2Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
      r AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
                             OR lag(event_type) OVER w <> event_type
                           THEN 1 ELSE 0 END AS chg
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      v AS (SELECT *, (sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                                      ROWS UNBOUNDED PRECEDING))::BIGINT AS version
            FROM r),
      runs AS (SELECT user_id, version, min(event_type) AS event_type,
          min(us)::BIGINT AS valid_from_us, count(*)::BIGINT AS n_events
        FROM v GROUP BY user_id, version)
      SELECT user_id, version, event_type, valid_from_us,
        lead(valid_from_us) OVER w2 AS valid_to_us, n_events,
        (lead(valid_from_us) OVER w2 IS NULL) AS is_current
      FROM runs WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
      ORDER BY user_id, version"""

  // ---- correlated-subquery decorrelation (TPC-H Q2 shape) -----------------

  /** Min-cost supplier per part, Europe-only (the TPC-H Q2 correlated
    * subquery: `price = (SELECT min(price) ... WHERE partkey = outer key)`).
    * Written DECORRELATED as `min(price) OVER (PARTITION BY p_partkey)` +
    * filter — a per-row subquery is the one shape that cannot scale, and
    * the r7 aggregate+join-back form was worse still: the `offers` join
    * tree fed BOTH the aggregate and the join-back with no shareable
    * exchange (the agg partitions on partkey, the join-back on
    * (partkey, price)), so the fact scan and both dimension joins ran
    * TWICE (r7 verdict #1; bench row 0.94 s → 4.19 s). The window form is
    * one scan and one shuffle on p_partkey; the min and the filter ride
    * the same exchange. The nation⋈region chain broadcasts
    * (constant-size). Ties (several suppliers at the min price) are all
    * kept, like Q2; output is bounded by the part filter, ordered by
    * (part, supplier).
    */
  def q89Tpch2(spark: SparkSession, dir: String): DataFrame = {
    val euroNations = t(spark, dir, "nation")
      .join(
        t(spark, dir, "region").filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = t(spark, dir, "supplier")
      .join(broadcast(euroNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val offers = t(spark, dir, "lineitem")
      .join(t(spark, dir, "part").filter(col("p_size") % 10 === 0),
        col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_type"), col("s_suppkey"), col("s_name"),
        col("n_name"), col("l_extendedprice").as("price"))
    val wMin = org.apache.spark.sql.expressions.Window.partitionBy("p_partkey")
    offers
      .withColumn("min_price", min(col("price")).over(wMin))
      .filter(col("price") === col("min_price"))
      .select(col("p_partkey"), col("p_type"), col("s_suppkey"), col("s_name"),
        col("n_name"), col("price"))
      .distinct()
      .orderBy("p_partkey", "s_suppkey")
  }

  val q89Tpch2Sql: String =
    """WITH euro AS (SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
      offers AS (SELECT p_partkey, p_type, s_suppkey, s_name, n_name,
          l_extendedprice AS price
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_size % 10 = 0
        JOIN euro ON l_suppkey = s_suppkey),
      mp AS (SELECT p_partkey AS mp_partkey, min(price) AS min_price
        FROM offers GROUP BY 1)
      SELECT DISTINCT p_partkey, p_type, s_suppkey, s_name, n_name, price
      FROM offers JOIN mp ON p_partkey = mp_partkey AND price = min_price
      ORDER BY p_partkey, s_suppkey"""

  // ---- time-series resampling (OHLC bars) ---------------------------------

  private val BarUs = 6L * 3600L * 1000000L

  /** Downsample the event stream to 6-hour OHLC bars per event type —
    * the time-series resample every metrics/fintech pipeline runs. Open
    * and close are true FIRST/LAST values under the total order
    * (ts, event_id) — selected with two row_number windows over the SAME
    * (type, bar) partitioning as the aggregate, so the whole resample is
    * one hash exchange; high/low/volume are plain min/max/count. At scale
    * the bar key is derived map-side (integer division of epoch micros),
    * so partition pruning and AQE see a slim (type, bar, value) stream,
    * never the raw payload.
    */
  def q90Resample(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(
        col("event_type"),
        unix_micros(col("ts")).as("us"),
        col("event_id"),
        col("value"))
      .withColumn("bar", expr(s"us div $BarUs"))
    val asc = Window.partitionBy("event_type", "bar").orderBy(col("us"), col("event_id"))
    val desc =
      Window.partitionBy("event_type", "bar").orderBy(col("us").desc, col("event_id").desc)
    ev.withColumn("ra", row_number().over(asc))
      .withColumn("rd", row_number().over(desc))
      .groupBy("event_type", "bar")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("value")).as("low"),
        max(col("value")).as("high"),
        max(when(col("ra") === 1, col("value"))).as("open"),
        max(when(col("rd") === 1, col("value"))).as("close"))
      .orderBy("event_type", "bar")
  }

  val q90ResampleSql: String =
    s"""WITH ev AS (SELECT event_type, epoch_us(ts) AS us, event_id, value,
          epoch_us(ts) // $BarUs AS bar FROM events),
      r AS (SELECT *,
          row_number() OVER (PARTITION BY event_type, bar ORDER BY us, event_id) AS ra,
          row_number() OVER (PARTITION BY event_type, bar ORDER BY us DESC, event_id DESC) AS rd
        FROM ev)
      SELECT event_type, bar, count(*)::BIGINT AS n_events,
        min(value) AS low, max(value) AS high,
        max(CASE WHEN ra = 1 THEN value END) AS open,
        max(CASE WHEN rd = 1 THEN value END) AS close
      FROM r GROUP BY event_type, bar ORDER BY event_type, bar"""

  private val CpW = 50
  private val CpShiftMin = 1000000L

  /** Mean-shift changepoint detection over the per-type event stream: at
    * each position, the sum of the previous [[CpW]] values vs the sum of
    * the next [[CpW]] (current row inclusive), emitting positions where
    * the windows are both FULL and the absolute shift clears
    * [[CpShiftMin]] — the drift detector a data pipeline runs over
    * telemetry before trusting a day's ingest. Exactness discipline:
    * values enter as `floor(value * 1000)` BIGINTs, so the two ROWS-frame
    * sums and their difference are order-free integer arithmetic
    * (hash-exact), not a float CUSUM (whose recursive max doesn't
    * translate to window SQL at all). Per-type windows partition by a
    * bounded key; at 100 TB the frame is one range-partitioned sort per
    * type — the same layout the per-type resample bars reuse.
    */
  def q91Changepoint(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(
        col("event_type"),
        unix_micros(col("ts")).as("us"),
        col("event_id"),
        floor(col("value") * 1000).cast("long").as("v"))
    val order = Window.partitionBy("event_type").orderBy(col("us"), col("event_id"))
    val pre = order.rowsBetween(-CpW, -1)
    val post = order.rowsBetween(Window.currentRow, CpW - 1)
    ev.withColumn("pre_sum", sum(col("v")).over(pre))
      .withColumn("n_pre", count(col("v")).over(pre))
      .withColumn("post_sum", sum(col("v")).over(post))
      .withColumn("n_post", count(col("v")).over(post))
      .filter(col("n_pre") === CpW && col("n_post") === CpW)
      .withColumn("shift", col("post_sum") - col("pre_sum"))
      .filter(abs(col("shift")) >= CpShiftMin)
      .select("event_type", "us", "event_id", "pre_sum", "post_sum", "shift")
      .orderBy("event_type", "us", "event_id")
  }

  val q91ChangepointSql: String =
    s"""WITH ev AS (SELECT event_type, epoch_us(ts) AS us, event_id,
          floor(value * 1000)::BIGINT AS v FROM events),
      w AS (SELECT event_type, us, event_id,
          (sum(v) OVER (PARTITION BY event_type ORDER BY us, event_id
            ROWS BETWEEN $CpW PRECEDING AND 1 PRECEDING))::BIGINT AS pre_sum,
          count(v) OVER (PARTITION BY event_type ORDER BY us, event_id
            ROWS BETWEEN $CpW PRECEDING AND 1 PRECEDING) AS n_pre,
          (sum(v) OVER (PARTITION BY event_type ORDER BY us, event_id
            ROWS BETWEEN CURRENT ROW AND ${CpW - 1} FOLLOWING))::BIGINT AS post_sum,
          count(v) OVER (PARTITION BY event_type ORDER BY us, event_id
            ROWS BETWEEN CURRENT ROW AND ${CpW - 1} FOLLOWING) AS n_post
        FROM ev)
      SELECT event_type, us, event_id, pre_sum, post_sum,
        (post_sum - pre_sum)::BIGINT AS shift
      FROM w WHERE n_pre = $CpW AND n_post = $CpW
        AND abs(post_sum - pre_sum) >= $CpShiftMin
      ORDER BY event_type, us, event_id"""

  // ---- TPC-DS-shaped batch (round 10) ---------------------------------------
  // The relational pattern family the 22-shape TPC-H zoo doesn't exercise:
  // a reuse-heavy CTE consumed twice, a window stack over a joined
  // aggregate, and a multi-channel UNION feeding one aggregate.

  /** TPC-DS Q1 shape (reuse-heavy CTE): per-customer total spend is
    * computed ONCE and consumed TWICE — as the input of the per-nation
    * average and as each customer's own value (keep customers spending
    * more than 1.2× their nation's average). The CTE persists via
    * [[graft.Caches.track]] so the orders⋈customer aggregate runs once —
    * one orders scan (PlanAssertionsSpec lock); without it Catalyst
    * plans the subtree twice, the exact failure TPC-DS Q1 punishes at
    * fact-table scale. The per-nation frame is nation-bounded (≤25
    * rows), so it broadcasts; the 1.2× threshold is decided on the
    * DECIMAL-exact cross inequality `5·total·n_cust > 6·nation_sum` —
    * no float division in the decision path; doubles appear only in the
    * presented columns.
    */
  def q115Dscte(spark: SparkSession, dir: String): DataFrame = {
    val ct = graft.Caches.track(
      t(spark, dir, "orders")
        .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_nationkey").cast("long").as("nationkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val byNation = ct
      .groupBy("nationkey")
      .agg(sum("total").as("nation_sum"), count(lit(1)).as("n_cust"))
    ct.join(broadcast(byNation), Seq("nationkey"))
      .filter(col("total") * 5 * col("n_cust") > col("nation_sum") * 6)
      .select(
        col("c_custkey"),
        col("nationkey"),
        col("total").cast("double").as("total"),
        col("n_cust"),
        col("nation_sum").cast("double").as("nation_sum"))
      .orderBy("c_custkey")
  }

  val q115DscteSql: String =
    """WITH ct AS (
        SELECT c_custkey, c_nationkey::BIGINT AS nationkey,
          sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
      bn AS (SELECT nationkey, sum(total) AS nation_sum, count(*) AS n_cust
             FROM ct GROUP BY 1)
      SELECT ct.c_custkey, ct.nationkey, ct.total::DOUBLE AS total, bn.n_cust,
        bn.nation_sum::DOUBLE AS nation_sum
      FROM ct JOIN bn ON ct.nationkey = bn.nationkey
      WHERE ct.total * 5 * bn.n_cust > bn.nation_sum * 6
      ORDER BY ct.c_custkey"""

  /** TPC-DS Q47 shape (window stack over a joined aggregate): monthly
    * revenue per supplier nation (lineitem⋈supplier, the established
    * DECIMAL(18,4) exact-sum discipline), then two PARTITIONED windows
    * on the aggregate — the nation's revenue rank within each month
    * (ties on the nation key: decimal comparisons are exact) and the
    * month's deviation from the nation's across-month total, kept
    * decimal-exact as `rev·n_months − nation_total` (the avg-free form
    * of Q47's "deviation from yearly mean"; a float mean would put the
    * compare one ulp from flipping). Both windows key on real
    * partitions — never a partitionless funnel — and the window input
    * is the (nation × month) aggregate, thousands of rows at any SF.
    */
  def q116Dswindow(spark: SparkSession, dir: String): DataFrame = {
    val monthly = t(spark, dir, "lineitem")
      .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(
        col("s_nationkey").cast("long").as("nationkey"),
        date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).as("rev"))
    val wMonth = Window.partitionBy("month").orderBy(col("rev").desc, col("nationkey"))
    val wNation = Window.partitionBy("nationkey")
    monthly
      .withColumn("rnk", rank().over(wMonth).cast("long"))
      .withColumn("n_months", count(lit(1)).over(wNation))
      .withColumn("nation_total", sum(col("rev")).over(wNation))
      .select(
        col("nationkey"),
        col("month"),
        col("rev").cast("double").as("rev"),
        col("rnk"),
        (col("rev") * col("n_months") - col("nation_total")).cast("double").as("dev_scaled"))
      .orderBy("nationkey", "month")
  }

  val q116DswindowSql: String =
    """WITH m AS (
        SELECT s_nationkey::BIGINT AS nationkey,
          strftime(l_shipdate, '%Y-%m') AS month,
          sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS rev
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2)
      SELECT nationkey, month, rev::DOUBLE AS rev,
        rank() OVER (PARTITION BY month ORDER BY rev DESC, nationkey)::BIGINT AS rnk,
        (rev * (count(*) OVER (PARTITION BY nationkey))
          - sum(rev) OVER (PARTITION BY nationkey))::DOUBLE AS dev_scaled
      FROM m ORDER BY nationkey, month"""

  /** TPC-DS Q76 shape (multi-channel union): two DIFFERENT fact streams —
    * order headers and shipped line items — are tagged with their channel,
    * UNIONed, and fed to ONE (channel, year) aggregate plus a per-year
    * channel rank. The union is map-only (each branch is a pruned
    * columnar scan; no join ever relates the channels), partial
    * aggregation runs ABOVE the union so each branch combines map-side
    * before the single exchange, and the rank's window input is the
    * (channel × year) aggregate — constant-bounded. Money stays in the
    * exact DECIMAL lane until the presented cast.
    */
  def q117Dschannels(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders").select(
      lit("orders").as("channel"),
      year(col("o_orderdate")).cast("long").as("yr"),
      col("o_totalprice").cast("decimal(18,4)").as("val"))
    val li = t(spark, dir, "lineitem").select(
      lit("lineitem").as("channel"),
      year(col("l_shipdate")).cast("long").as("yr"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)").as("val"))
    val yearly = ord.unionByName(li)
      .groupBy("channel", "yr")
      .agg(count(lit(1)).as("n"), sum("val").as("val"))
    val w = Window.partitionBy("yr").orderBy(col("val").desc, col("channel"))
    yearly
      .withColumn("rnk", rank().over(w).cast("long"))
      .select(col("channel"), col("yr"), col("n"), col("val").cast("double").as("val"), col("rnk"))
      .orderBy("channel", "yr")
  }

  val q117DschannelsSql: String =
    """WITH u AS (
        SELECT 'orders' AS channel, year(o_orderdate)::BIGINT AS yr,
          CAST(o_totalprice AS DECIMAL(18,4)) AS val FROM orders
        UNION ALL
        SELECT 'lineitem' AS channel, year(l_shipdate)::BIGINT AS yr,
          CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS val
        FROM lineitem),
      y AS (SELECT channel, yr, count(*) AS n, sum(val) AS val FROM u GROUP BY 1, 2)
      SELECT channel, yr, n, val::DOUBLE AS val,
        rank() OVER (PARTITION BY yr ORDER BY val DESC, channel)::BIGINT AS rnk
      FROM y ORDER BY channel, yr"""

  /** TPC-DS Q36 shape (rank within a rollup hierarchy): discount ratio per
    * (region, nation) with ROLLUP subtotals, `lochierarchy` derived from
    * `grouping()` (0 = nation row, 1 = region subtotal, 2 = grand total),
    * and a rank window PARTITIONED BY the grouping level — plus, at the
    * leaf level, the parent region — exactly Q36's
    * `PARTITION BY lochierarchy, CASE WHEN lochierarchy = 0 THEN parent`.
    * The window input is the rollup OUTPUT (nation-bounded, ≤ |regions| ×
    * |nations| + |regions| + 1 rows at any SF), never the fact table.
    * Determinism: both sums ride DECIMAL(18,4) (exact, order-free); the
    * ranked ratio is ONE correctly-rounded double division of bit-equal
    * doubles, so equal ratios are bit-equal on both engines and the
    * (ratio, r_name, n_name) order needs no tolerance. Null subtotal
    * labels sort NULLS FIRST explicitly on both engines (DuckDB defaults
    * NULLS LAST; Spark ascending defaults nulls-first).
    */
  def q118Dsrollup(spark: SparkSession, dir: String): DataFrame = {
    val rolled = t(spark, dir, "lineitem")
      .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)")).as("disc_amt"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).as("gross"),
        // grouping() is only defined under the rollup's Aggregate, so the
        // hierarchy level is computed here, not in a later withColumn.
        (grouping(col("r_name")) + grouping(col("n_name"))).cast("long").as("lochierarchy"))
      .withColumn("ratio", col("disc_amt").cast("double") / col("gross").cast("double"))
    val w = Window
      .partitionBy(col("lochierarchy"), when(col("lochierarchy") === 0, col("r_name")))
      .orderBy(col("ratio").desc, col("r_name"), col("n_name"))
    rolled
      .withColumn("rnk", rank().over(w).cast("long"))
      .select(
        col("r_name"),
        col("n_name"),
        col("lochierarchy"),
        col("disc_amt").cast("double").as("disc_amt"),
        col("gross").cast("double").as("gross"),
        col("ratio"),
        col("rnk"))
      .orderBy(col("lochierarchy").desc, col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  val q118DsrollupSql: String =
    """WITH r AS (
        SELECT r_name, n_name,
          grouping(r_name)::BIGINT + grouping(n_name)::BIGINT AS lochierarchy,
          sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS disc_amt,
          sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS gross
        FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name))
      SELECT r_name, n_name, lochierarchy,
        disc_amt::DOUBLE AS disc_amt, gross::DOUBLE AS gross,
        disc_amt::DOUBLE / gross::DOUBLE AS ratio,
        rank() OVER (
          PARTITION BY lochierarchy, CASE WHEN lochierarchy = 0 THEN r_name END
          ORDER BY disc_amt::DOUBLE / gross::DOUBLE DESC, r_name, n_name)::BIGINT AS rnk
      FROM r
      ORDER BY lochierarchy DESC, r_name NULLS FIRST, n_name NULLS FIRST"""

  /** TPC-DS Q35 shape (OR-of-EXISTS over two fact channels): customers
    * active in EITHER channel — an order placed in 1996, OR a returned
    * line item shipped in 1995 — rolled up to nation counts. The
    * correlated `EXISTS … OR EXISTS …` decorrelates to ONE left-semi join
    * against the UNION of two pruned key streams: each branch is a
    * map-only filtered scan (the lineitem branch resolves custkey through
    * a slim two-column orders projection), no distinct is needed because
    * semi-join is set-semantics, and the customer table never joins a
    * fact table directly. At 100 TB both branches prune at the scan
    * (year/flag predicates push down) and ship only custkeys into the
    * semi — the decorrelation Catalyst cannot do by itself when the OR
    * spans two subqueries.
    */
  def q119Dsexists(spark: SparkSession, dir: String): DataFrame = {
    // Date-RANGE prunes, not `year(col) === y`: the function form defeats
    // parquet pushdown (see q122's note) — the range reaches the scan.
    val ordKeys = t(spark, dir, "orders")
      .filter(
        col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") <= lit("1996-12-31"))
      .select(col("o_custkey").as("c_custkey"))
    val liKeys = t(spark, dir, "lineitem")
      .filter(
        col("l_returnflag") === "R" &&
          col("l_shipdate") >= lit("1995-01-01") && col("l_shipdate") <= lit("1995-12-31"))
      .select(col("l_orderkey").as("o_orderkey"))
      .join(t(spark, dir, "orders").select("o_orderkey", "o_custkey"), "o_orderkey")
      .select(col("o_custkey").as("c_custkey"))
    t(spark, dir, "customer")
      .join(ordKeys.union(liKeys), Seq("c_custkey"), "left_semi")
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(
        count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("acctbal"))
      .orderBy("nationkey")
  }

  val q119DsexistsSql: String =
    """SELECT c_nationkey::BIGINT AS nationkey, count(*) AS n_cust,
        sum(CAST(c_acctbal AS DECIMAL(18,2)))::DOUBLE AS acctbal
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND year(o_orderdate) = 1996)
         OR EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_custkey = c_custkey
                AND l_returnflag = 'R' AND year(l_shipdate) = 1995)
      GROUP BY 1 ORDER BY 1"""

  /** TPC-DS Q14 shape (cross-channel INTERSECT): parts bought by customers
    * of ALL THREE market segments (the harness's channels), then the
    * revenue those cross-channel parts earn. The DISTINCT (part, segment)
    * relationship frame is computed ONCE and persisted (the q115
    * CTE-reuse discipline) — all three channel key sets are filters of
    * it, and the sets INTERSECT (Spark plans set-intersect as left-semi
    * chains on the distinct sets, so nothing wider than a part key ever
    * shuffles). The final revenue aggregate semi-joins the intersected
    * key set back onto the fact scan. At 100 TB every stream is either a
    * pruned scan or a key-only set op; the fact table is scanned exactly
    * twice (relationship build + revenue — plan-locked), never joined to
    * itself.
    */
  def q120Dsintersect(spark: SparkSession, dir: String): DataFrame = {
    val Channels = Seq("BUILDING", "AUTOMOBILE", "MACHINERY")
    // ONE (part, segment) distinct frame feeds all three channel sets —
    // the q115 CTE-reuse discipline; without the persist each INTERSECT
    // branch would re-scan and re-join the fact table.
    val seg = t(spark, dir, "orders")
      .join(
        t(spark, dir, "customer")
          .filter(col("c_mktsegment").isInCollection(Channels))
          .select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"))
    val partSeg = graft.Caches.track(
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
        .join(seg, col("l_orderkey") === col("o_orderkey"))
        .select("l_partkey", "c_mktsegment")
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    def channelParts(segment: String): DataFrame =
      partSeg.filter(col("c_mktsegment") === segment).select("l_partkey")
    val crossChannel = channelParts("BUILDING")
      .intersect(channelParts("AUTOMOBILE"))
      .intersect(channelParts("MACHINERY"))
    t(spark, dir, "lineitem")
      .join(crossChannel, Seq("l_partkey"), "left_semi")
      .groupBy(col("l_partkey").cast("long").as("partkey"))
      .agg(
        count(lit(1)).as("n"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("rev"))
      .orderBy("partkey")
  }

  val q120DsintersectSql: String =
    """WITH seg AS (SELECT o_orderkey, c_mktsegment
          FROM orders JOIN customer ON o_custkey = c_custkey),
      b AS (SELECT DISTINCT l_partkey FROM lineitem
            JOIN seg ON l_orderkey = o_orderkey WHERE c_mktsegment = 'BUILDING'),
      a AS (SELECT DISTINCT l_partkey FROM lineitem
            JOIN seg ON l_orderkey = o_orderkey WHERE c_mktsegment = 'AUTOMOBILE'),
      m AS (SELECT DISTINCT l_partkey FROM lineitem
            JOIN seg ON l_orderkey = o_orderkey WHERE c_mktsegment = 'MACHINERY'),
      x AS (SELECT l_partkey FROM b INTERSECT SELECT l_partkey FROM a
            INTERSECT SELECT l_partkey FROM m)
      SELECT l_partkey::BIGINT AS partkey, count(*) AS n,
        sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))::DOUBLE AS rev
      FROM lineitem WHERE l_partkey IN (SELECT l_partkey FROM x)
      GROUP BY 1 ORDER BY 1"""

  /** TPC-DS Q51 shape (cumulative compare across channels): monthly
    * revenue of the two fact channels, each with a RUNNING cumulative
    * sum, FULL OUTER joined on month, keeping months where the orders
    * channel's cumulative total leads the lineitem channel's. The
    * windows are partitionless — but their input is the (month)
    * aggregate, bounded by the calendar (80 rows here, a few hundred at
    * ANY corpus scale), so the single-task window is a constant-size
    * epilogue, not a corpus funnel; the heavy lifting is two map-side
    * partially-aggregated fact scans. Cumulative sums stay DECIMAL-exact
    * end to end and the lead/lag decision is an exact decimal compare;
    * the join runs BEFORE the windows and each channel's missing months
    * coalesce to 0 on the joined spine, so a month one channel skips
    * carries that channel's running total forward instead of reading 0.
    */
  def q121Dscumulative(spark: SparkSession, dir: String): DataFrame = {
    val om = t(spark, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("orev"))
    val lm = t(spark, dir, "lineitem")
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).as("lrev"))
    cumulativeLeads(om, lm)
  }

  /** The q121 core over any two `(month, orev)` / `(month, lrev)` monthly
    * frames — factored so the spec can exercise BOTH one-sided-month
    * directions (the sf0.01 corpus only has lineitem-only trailing
    * months). Outer-join FIRST, cumulate SECOND: a month one channel
    * skips must carry that channel's running total forward (coalesce the
    * month's own revenue to 0 on the joined spine), not read
    * cumulative 0.
    */
  private[graft] def cumulativeLeads(om: DataFrame, lm: DataFrame): DataFrame = {
    val w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    om.join(lm, Seq("month"), "full_outer")
      .withColumn("ocum", sum(coalesce(col("orev"), lit(0))).over(w))
      .withColumn("lcum", sum(coalesce(col("lrev"), lit(0))).over(w))
      .filter(col("ocum") > col("lcum"))
      .select(
        col("month"),
        col("ocum").cast("double").as("ocum"),
        col("lcum").cast("double").as("lcum"))
      .orderBy("month")
  }

  val q121DscumulativeSql: String =
    """WITH om AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
          sum(CAST(o_totalprice AS DECIMAL(18,2))) AS orev
        FROM orders GROUP BY 1),
      lm AS (SELECT strftime(l_shipdate, '%Y-%m') AS month,
          sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS lrev
        FROM lineitem GROUP BY 1),
      j AS (SELECT coalesce(om.month, lm.month) AS month,
          coalesce(orev, 0) AS orev, coalesce(lrev, 0) AS lrev
        FROM om FULL OUTER JOIN lm ON om.month = lm.month),
      c AS (SELECT month,
          sum(orev) OVER (ORDER BY month
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ocum,
          sum(lrev) OVER (ORDER BY month
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lcum
        FROM j)
      SELECT month, ocum::DOUBLE AS ocum, lcum::DOUBLE AS lcum
      FROM c WHERE ocum > lcum ORDER BY month"""

  /** TPC-DS Q4 shape (cross-channel year-over-year growth): customers
    * active in BOTH years in BOTH channels whose lineitem-channel spend
    * grew FASTER than their orders-channel spend. Each channel reduces to
    * one conditionally-aggregated pass (sum-when per year — never a
    * per-year rescan), the channels join on the customer key, and the Q4
    * growth-ratio comparison `l97/l96 > o97/o96` is decided as the exact
    * decimal cross-product `l97·o96 > l96·o97` — positive denominators
    * make the forms equivalent, and no division ever enters the decision
    * path (the q115 discipline; a float ratio would sit one ulp from
    * flipping on near-equal growth). At 100 TB: two pruned fact scans,
    * two map-side-combined aggregates, one key join.
    */
  def q122Dsgrowth(spark: SparkSession, dir: String): DataFrame = {
    // The two-year prunes are DATE-RANGE predicates, not
    // `year(col) IN (…)`: a function over the column defeats parquet
    // pushdown entirely (the r10-advice audit caught the scans reading
    // every year with only IsNotNull pushed), while the equivalent range
    // reaches the scan as a min/max row-group filter — the difference
    // between scanning 2 years and scanning the whole fact table at
    // 100 TB. The per-year split inside the aggregate keeps `year()`.
    val byYearOrd = t(spark, dir, "orders")
      .filter(
        col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") <= lit("1997-12-31"))
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(
        sum(when(year(col("o_orderdate")) === 1996, col("o_totalprice"))
          .cast("decimal(18,2)")).as("o96"),
        sum(when(year(col("o_orderdate")) === 1997, col("o_totalprice"))
          .cast("decimal(18,2)")).as("o97"))
    val byYearLi = t(spark, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") <= lit("1997-12-31"))
      .join(t(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(
        sum(when(year(col("l_shipdate")) === 1996,
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("l96"),
        sum(when(year(col("l_shipdate")) === 1997,
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("l97"))
    byYearOrd
      .join(byYearLi, Seq("c_custkey"))
      // Q4's presence rule: active in both years in both channels
      .filter(
        col("o96").isNotNull && col("o97").isNotNull &&
          col("l96").isNotNull && col("l97").isNotNull &&
          col("o96") > 0 && col("l96") > 0)
      // Narrow the widened sums back to 18 digits before multiplying:
      // the cross-products then fit decimal(37,6) EXACTLY on both engines
      // (the unnarrowed 28/38-digit operands would overflow the 38-digit
      // product cap, where precision-loss rules differ per engine).
      .filter(
        col("l97").cast("decimal(18,4)") * col("o96").cast("decimal(18,2)") >
          col("l96").cast("decimal(18,4)") * col("o97").cast("decimal(18,2)"))
      .select(
        col("c_custkey"),
        col("o96").cast("double").as("o96"),
        col("o97").cast("double").as("o97"),
        col("l96").cast("double").as("l96"),
        col("l97").cast("double").as("l97"))
      .orderBy("c_custkey")
  }

  val q122DsgrowthSql: String =
    """WITH o AS (
        SELECT o_custkey AS c_custkey,
          sum(CASE WHEN year(o_orderdate) = 1996
              THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS o96,
          sum(CASE WHEN year(o_orderdate) = 1997
              THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS o97
        FROM orders WHERE year(o_orderdate) IN (1996, 1997) GROUP BY 1),
      l AS (
        SELECT o_custkey AS c_custkey,
          sum(CASE WHEN year(l_shipdate) = 1996
              THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) END) AS l96,
          sum(CASE WHEN year(l_shipdate) = 1997
              THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) END) AS l97
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE year(l_shipdate) IN (1996, 1997) GROUP BY 1)
      SELECT o.c_custkey, o96::DOUBLE AS o96, o97::DOUBLE AS o97,
        l96::DOUBLE AS l96, l97::DOUBLE AS l97
      FROM o JOIN l ON o.c_custkey = l.c_custkey
      WHERE o96 IS NOT NULL AND o97 IS NOT NULL
        AND l96 IS NOT NULL AND l97 IS NOT NULL
        AND o96 > 0 AND l96 > 0
        AND CAST(l97 AS DECIMAL(18,4)) * CAST(o96 AS DECIMAL(19,2))
          > CAST(l96 AS DECIMAL(18,4)) * CAST(o97 AS DECIMAL(19,2))
      ORDER BY o.c_custkey"""

  /** TPC-DS Q64 shape (multi-join CTE reused by self-join): one expensive
    * three-table sales profile — lineitem resolved through orders (year)
    * and part (brand) — materialized ONCE, then self-joined to compare a
    * part's 1996 profile against its 1997 one (Q64's "bought again at a
    * higher price" rule becomes revenue growth). The plan decision this
    * shape exercises, which no other TPC-DS query here does: the CTE has
    * TWO downstream consumers with different filters, so an engine either
    * materializes it once (one lineitem scan + two InMemoryRelation reads
    * + a slim self-join on the aggregate) or re-runs the three-table join
    * per year — at 100 TB the difference is one fact-table pass vs two.
    * Plan-locked by PlanAssertionsSpec: exactly one lineitem scan.
    * Exactness: the year prune is a pushable DATE RANGE (q122's note);
    * revenue sums are DECIMAL(18,4) with ONE terminal cast to double; the
    * growth compare runs on the decimals.
    */
  def q123Dsreuse(spark: SparkSession, dir: String): DataFrame = {
    val cs = graft.Caches.track(
      t(spark, dir, "lineitem")
        .join(
          t(spark, dir, "orders")
            .filter(col("o_orderdate") >= lit("1996-01-01") &&
              col("o_orderdate") <= lit("1997-12-31"))
            .select(col("o_orderkey"), year(col("o_orderdate")).as("yr")),
          col("l_orderkey") === col("o_orderkey"))
        .join(
          t(spark, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_partkey"), col("p_brand"), col("yr"))
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).as("rev"),
          count_distinct(col("l_orderkey")).as("n_ord"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    cs.filter(col("yr") === 1996)
      .select(
        col("p_partkey"), col("p_brand"),
        col("rev").as("rev96"), col("n_ord").as("ord96"))
      .join(
        cs.filter(col("yr") === 1997)
          .select(col("p_partkey"), col("rev").as("rev97"), col("n_ord").as("ord97")),
        Seq("p_partkey"))
      .filter(col("rev97") > col("rev96"))
      .select(
        col("p_partkey"),
        col("p_brand"),
        col("rev96").cast("double").as("rev96"),
        col("rev97").cast("double").as("rev97"),
        col("ord96"),
        col("ord97"))
      .orderBy("p_partkey")
  }

  val q123DsreuseSql: String =
    """WITH cs AS (
        SELECT p_partkey, p_brand, year(o_orderdate) AS yr,
          sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS rev,
          count(DISTINCT l_orderkey) AS n_ord
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN part ON l_partkey = p_partkey
        WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate <= DATE '1997-12-31'
        GROUP BY 1, 2, 3)
      SELECT a.p_partkey, a.p_brand,
        a.rev::DOUBLE AS rev96, b.rev::DOUBLE AS rev97,
        a.n_ord AS ord96, b.n_ord AS ord97
      FROM cs a JOIN cs b ON a.p_partkey = b.p_partkey
      WHERE a.yr = 1996 AND b.yr = 1997 AND b.rev > a.rev
      ORDER BY a.p_partkey"""

  /** TPC-DS Q72 shape (fact-to-fact date-offset join through a date
    * spine): for each demand event (an order line, dated by its order),
    * count the supply events (ship events of the SAME part) landing
    * within the next 14 days — Q72's catalog_sales⋈inventory
    * "inv_date within the weeks after the sale" join, the benchmark's
    * notorious biggest-join. The scale re-expression: the raw predicate
    * is a RANGE join (a cartesian per part at 100 TB), so both sides are
    * BANDED onto a week spine — each fact computes its week id, the
    * demand side explodes into the ≤3 week bands its 14-day window can
    * touch (a bounded ×3, never data-dependent), and the join becomes
    * ONE equi-join on (partkey, week) with the exact date residual
    * applied after. The spine itself is the third frame, Q72's d2/d3
    * role: a generated week dimension broadcast onto the demand side to
    * stamp each band's start date (bounded rows, broadcast hash join —
    * never a nested loop). Both fact scans carry pushable date ranges.
    */
  def q124Dsspine(spark: SparkSession, dir: String): DataFrame = {
    val weekOf = (c: Column) => floor(datediff(c, lit("1996-01-01")) / 7)
    // Week spine for H1 1996 + the 2-week overhang: (wk, wk_start).
    val spine = broadcast(
      spark.range(0, 29)
        .select(
          col("id").as("wk"),
          date_add(lit("1996-01-01"), (col("id") * 7).cast("int")).as("wk_start")))
    val demand = t(spark, dir, "lineitem")
      .select(col("l_partkey").as("partkey"), col("l_orderkey"))
      .join(
        t(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") <= lit("1996-03-31"))
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("partkey"), col("o_orderdate"), weekOf(col("o_orderdate")).as("w0"))
    val supply = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") <= lit("1996-06-30"))
      .select(
        col("l_partkey").as("partkey"),
        col("l_shipdate"),
        weekOf(col("l_shipdate")).as("wk"))
    demand
      .select(
        col("partkey"), col("o_orderdate"),
        explode(array(col("w0"), col("w0") + 1, col("w0") + 2)).as("wk"))
      .join(spine, Seq("wk"))
      .join(supply, Seq("partkey", "wk"))
      .filter(
        col("l_shipdate") > col("o_orderdate") &&
          col("l_shipdate") <= date_add(col("o_orderdate"), 14))
      .groupBy(col("partkey"))
      .agg(
        count(lit(1)).as("n_pairs"),
        count_distinct(col("wk")).as("n_weeks"),
        min(col("wk_start")).cast("string").as("first_week"))
      .orderBy("partkey")
  }

  val q124DsspineSql: String =
    """WITH demand AS (
        SELECT l_partkey AS partkey, o_orderdate,
          date_diff('day', DATE '1996-01-01', o_orderdate) // 7 AS w0
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate <= DATE '1996-03-31'),
      supply AS (
        SELECT l_partkey AS partkey, l_shipdate,
          date_diff('day', DATE '1996-01-01', l_shipdate) // 7 AS wk
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate <= DATE '1996-06-30'),
      spine AS (SELECT wk, DATE '1996-01-01' + (wk * 7)::INT AS wk_start
        FROM (SELECT unnest(range(0, 29)) AS wk)),
      banded AS (
        SELECT d.partkey, d.o_orderdate, d.w0 + o.off AS wk
        FROM demand d CROSS JOIN (SELECT unnest([0, 1, 2]) AS off) o)
      SELECT bd.partkey, count(*) AS n_pairs,
        count(DISTINCT bd.wk) AS n_weeks,
        min(sp.wk_start)::DATE::VARCHAR AS first_week
      FROM banded bd
        JOIN spine sp ON sp.wk = bd.wk
        JOIN supply s ON s.partkey = bd.partkey AND s.wk = bd.wk
      WHERE s.l_shipdate > bd.o_orderdate
        AND s.l_shipdate <= bd.o_orderdate + INTERVAL 14 DAY
      GROUP BY 1 ORDER BY 1"""

  /** TPC-DS Q88 shape: eight "how busy was the store in window X"
    * scalar subqueries — each a (time-band, qualifier) count over the
    * same fact table — FUSED into ONE scan with conditional aggregation.
    * Eight separate subqueries would scan the fact table eight times
    * (at 100 TB, eight times the I/O for one dashboard row); the fused
    * form is one pass, fully map-side (partial aggregation collapses
    * every partition to a single 8-column row before the 1-row
    * exchange). Bands: 3-hour windows with a per-band value floor
    * (mirroring Q88's per-window demographic qualifier).
    */
  def q125Dstimebands(spark: SparkSession, dir: String): DataFrame = {
    val h = hour(col("ts"))
    def band(name: String, lo: Int, floorV: Double) =
      sum(
        when(h >= lo && h < lo + 3 && col("value") >= floorV, 1L)
          .otherwise(0L)).as(name)
    events(spark, dir).agg(
      band("b0_3", 0, 20.0),
      band("b3_6", 3, 25.0),
      band("b6_9", 6, 30.0),
      band("b9_12", 9, 35.0),
      band("b12_15", 12, 40.0),
      band("b15_18", 15, 45.0),
      band("b18_21", 18, 50.0),
      band("b21_24", 21, 55.0))
  }

  val q125DstimebandsSql: String = {
    val bands = Seq(
      ("b0_3", 0, 20), ("b3_6", 3, 25), ("b6_9", 6, 30), ("b9_12", 9, 35),
      ("b12_15", 12, 40), ("b15_18", 15, 45), ("b18_21", 18, 50), ("b21_24", 21, 55))
    val cols = bands
      .map { case (n, lo, fl) =>
        s"""sum(CASE WHEN hour(ts) >= $lo AND hour(ts) < ${lo + 3}
           AND value >= $fl.0 THEN 1 ELSE 0 END)::BIGINT AS $n"""
      }
      .mkString(",\n        ")
    s"SELECT $cols FROM events"
  }

  /** TPC-DS Q49 shape: per channel, the worst-returning items by BOTH the
    * quantity return ratio and the currency return ratio, union of the two
    * top-10 lists with each item's rank(s). The scale decision: a window
    * `row_number` would SORT the whole item aggregate per channel (billions
    * of rows at 100 TB) to keep ten; instead each top-10 comes from the
    * bounded [[graft.operators.TopKByScore]] aggregator (map-side partials
    * ship at most k rows per channel per partition) and ranks fall out of
    * the sorted buffer position — row_number semantics, ties to the lower
    * partkey, identical to the oracle's window replay. Items outside a
    * list carry a NULL rank for that metric. Ratios are exact-decimal
    * sums divided once as doubles (bit-stable both engines).
    */
  def q126Dsreturns(spark: SparkSession, dir: String): DataFrame = {
    val amt = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")
    val base = graft.Caches.track(
      t(spark, dir, "lineitem")
        .groupBy(col("l_linestatus").as("channel"), col("l_partkey").as("partkey"))
        .agg(
          sum(
            when(col("l_returnflag") === "R", col("l_quantity").cast("decimal(18,2)"))
              .otherwise(lit(0).cast("decimal(18,2)"))).as("qty_ret"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("qty_tot"),
          sum(when(col("l_returnflag") === "R", amt).otherwise(lit(0).cast("decimal(18,4)")))
            .as("amt_ret"),
          sum(amt).as("amt_tot"))
        .select(
          col("channel"),
          col("partkey"),
          (col("qty_ret").cast("double") / col("qty_tot").cast("double")).as("return_ratio"),
          (col("amt_ret").cast("double") / col("amt_tot").cast("double")).as("currency_ratio"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    def top10(metric: String, rankName: String) =
      base
        .groupBy("channel")
        .agg(graft.operators.TopKByScore.applied(10, col(metric), col("partkey")).as("t"))
        .select(col("channel"), posexplode(col("t.ids")).as(Seq("r0", "partkey")))
        .select(col("channel"), col("partkey"), (col("r0") + 1).cast("long").as(rankName))
    base
      .join(top10("return_ratio", "rnk_qty"), Seq("channel", "partkey"), "left")
      .join(top10("currency_ratio", "rnk_amt"), Seq("channel", "partkey"), "left")
      .filter(col("rnk_qty").isNotNull || col("rnk_amt").isNotNull)
      .select("channel", "partkey", "return_ratio", "currency_ratio", "rnk_qty", "rnk_amt")
      .orderBy("channel", "partkey")
  }

  val q126DsreturnsSql: String =
    """WITH base AS (SELECT l_linestatus AS channel, l_partkey AS partkey,
        sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2))
            ELSE 0::DECIMAL(18,2) END) AS qty_ret,
        sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_tot,
        sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
            ELSE 0::DECIMAL(18,4) END) AS amt_ret,
        sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS amt_tot
      FROM lineitem GROUP BY 1, 2),
      r AS (SELECT channel, partkey,
        qty_ret::DOUBLE / qty_tot::DOUBLE AS return_ratio,
        amt_ret::DOUBLE / amt_tot::DOUBLE AS currency_ratio FROM base),
      rq AS (SELECT channel, partkey,
        row_number() OVER (PARTITION BY channel ORDER BY return_ratio DESC, partkey) AS rnk FROM r),
      ra AS (SELECT channel, partkey,
        row_number() OVER (PARTITION BY channel ORDER BY currency_ratio DESC, partkey) AS rnk FROM r)
      SELECT r.channel, r.partkey, r.return_ratio, r.currency_ratio,
        CASE WHEN rq.rnk <= 10 THEN rq.rnk END AS rnk_qty,
        CASE WHEN ra.rnk <= 10 THEN ra.rnk END AS rnk_amt
      FROM r JOIN rq USING (channel, partkey) JOIN ra USING (channel, partkey)
      WHERE rq.rnk <= 10 OR ra.rnk <= 10
      ORDER BY channel, partkey"""

  /** TPC-DS Q39 shape: per-(part, month) demand mean and coefficient of
    * variation from EXACT integer co-moments (quantities are integral, so
    * n/Σq/Σq² are plain longs — the q41 discipline), then the
    * CONSECUTIVE-MONTH self-join keeping parts whose demand stays noisy
    * (cov > 0.5) in both months — the inventory-volatility pairing Q39
    * runs over warehouses. Float math is confined to the final
    * mean/cov expressions, written in one textual order on both engines
    * (divisions + one sqrt — all correctly rounded, hash-stable). One
    * fact aggregate (map-side) + one month-offset equi-join of the
    * part×month frame against itself.
    */
  def q127Dsvariance(spark: SparkSession, dir: String): DataFrame = {
    val m = t(spark, dir, "lineitem")
      .groupBy(
        col("l_partkey").as("partkey"),
        date_trunc("month", col("l_shipdate")).cast("date").as("mon"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("s"),
        sum((col("l_quantity").cast("long") * col("l_quantity").cast("long"))).as("s2"))
      .filter(col("n") >= 2)
      .select(
        col("partkey"),
        col("mon"),
        (col("s").cast("double") / col("n")).as("mean_qty"),
        (sqrt(
          (col("n") * col("s2") - col("s") * col("s")).cast("double") /
            (col("n") * (col("n") - 1)).cast("double")) /
          (col("s").cast("double") / col("n"))).as("cov"))
      .filter(col("cov") > 0.5)
    val nxt = m.select(
      col("partkey").as("p2"),
      col("mon").as("mon2"),
      col("mean_qty").as("mean_qty2"),
      col("cov").as("cov2"))
    m.join(
        nxt,
        col("partkey") === col("p2") && col("mon2") === add_months(col("mon"), 1))
      .select(
        col("partkey"),
        col("mon").cast("string").as("mon"),
        col("mean_qty"),
        col("cov"),
        col("mean_qty2"),
        col("cov2"))
      .orderBy("partkey", "mon")
  }

  val q127DsvarianceSql: String =
    """WITH m AS (
        SELECT l_partkey AS partkey, date_trunc('month', l_shipdate)::DATE AS mon,
          count(*) AS n, sum(l_quantity::BIGINT) AS s,
          sum(l_quantity::BIGINT * l_quantity::BIGINT) AS s2
        FROM lineitem GROUP BY 1, 2 HAVING count(*) >= 2),
      c AS (SELECT partkey, mon,
          s::DOUBLE / n AS mean_qty,
          sqrt((n * s2 - s * s)::DOUBLE / (n * (n - 1))::DOUBLE) / (s::DOUBLE / n) AS cov
        FROM m),
      f AS (SELECT * FROM c WHERE cov > 0.5)
      SELECT a.partkey, a.mon::VARCHAR AS mon, a.mean_qty, a.cov,
        b.mean_qty AS mean_qty2, b.cov AS cov2
      FROM f a JOIN f b ON b.partkey = a.partkey AND b.mon = a.mon + INTERVAL 1 MONTH
      ORDER BY a.partkey, a.mon"""

  /** TPC-DS Q47 shape: months whose demand spikes against the item-year
    * mean, reported with their calendar neighbors. The windows partition
    * by (item, year) — BOUNDED at ≤ 12 rows per partition at any corpus
    * scale (the q121 discipline: never a partitionless or corpus-keyed
    * window). All inputs exact longs; the spike ratio
    * `qty·n_months / year_sum` is one double division per row, written
    * identically on both engines; lag/lead run BEFORE the spike filter so
    * neighbors of a kept month are reported even when themselves
    * ordinary.
    */
  def q128Dsdev(spark: SparkSession, dir: String): DataFrame = {
    val part = Window.partitionBy("partkey", "yr")
    val ord = part.orderBy("mon")
    t(spark, dir, "lineitem")
      .groupBy(
        col("l_partkey").as("partkey"),
        year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("mon"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
      .withColumn("yr_sum", sum(col("qty")).over(part))
      .withColumn("n_months", count(lit(1)).over(part))
      .withColumn("prev_qty", lag(col("qty"), 1).over(ord))
      .withColumn("next_qty", lead(col("qty"), 1).over(ord))
      .withColumn(
        "ratio",
        (col("qty") * col("n_months")).cast("double") / col("yr_sum").cast("double"))
      .filter(col("ratio") >= 2.0)
      .select("partkey", "yr", "mon", "qty", "n_months", "yr_sum", "prev_qty", "next_qty", "ratio")
      .orderBy("partkey", "yr", "mon")
  }

  // Emitted integer columns are cast ::BIGINT / ::INT explicitly:
  // DuckDB's sum(BIGINT) is HUGEINT and year()/month() are BIGINT, and
  // the driver's hasher serializes by declared type (the r5 lesson).
  val q128DsdevSql: String =
    """WITH m AS (SELECT l_partkey AS partkey, year(l_shipdate)::INT AS yr,
        month(l_shipdate)::INT AS mon, sum(l_quantity::BIGINT)::BIGINT AS qty
      FROM lineitem GROUP BY 1, 2, 3),
      w AS (SELECT partkey, yr, mon, qty,
        sum(qty) OVER (PARTITION BY partkey, yr)::BIGINT AS yr_sum,
        count(*) OVER (PARTITION BY partkey, yr) AS n_months,
        lag(qty, 1) OVER (PARTITION BY partkey, yr ORDER BY mon) AS prev_qty,
        lead(qty, 1) OVER (PARTITION BY partkey, yr ORDER BY mon) AS next_qty
      FROM m)
      SELECT partkey, yr, mon, qty, n_months, yr_sum, prev_qty, next_qty,
        (qty * n_months)::DOUBLE / yr_sum::DOUBLE AS ratio
      FROM w WHERE (qty * n_months)::DOUBLE / yr_sum::DOUBLE >= 2.0
      ORDER BY partkey, yr, mon"""

  /** TPC-DS Q69 shape: customers PRESENT in one behavior channel and
    * ABSENT from two others — one semi join plus TWO anti joins against
    * slim derived keysets, the triple-decorrelation plan none of the
    * single-predicate queries (q4 semi, q5 anti) exercises. Channels
    * derive from the fact side: any order at all (EXISTS), a top-tier order
    * by total price (NOT EXISTS), a max-quantity deep-discount
    * line (NOT EXISTS) — thresholds set so the absent cohort populates every segment. The keysets are custkey-only projections —
    * duplicate-free slivers at any scale — and the final rollup is one
    * segment aggregate with decimal-exact balances.
    */
  def q129Dsabsent(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val big = orders
      .filter(col("o_totalprice") > 450000.0)
      .select(col("o_custkey"))
      .distinct()
    val bulk = t(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 50.0 && col("l_discount") > 0.09)
      .select(col("l_orderkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"))
      .distinct()
    t(spark, dir, "customer")
      .join(orders.select(col("o_custkey").as("c_custkey")).distinct(), Seq("c_custkey"), "left_semi")
      .join(big.select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_anti")
      .join(bulk.select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"),
        min(col("c_custkey")).as("min_cust"))
      .orderBy("c_mktsegment")
  }

  val q129DsabsentSql: String =
    """WITH active AS (SELECT DISTINCT o_custkey FROM orders),
      big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 450000.0),
      bulk AS (SELECT DISTINCT o_custkey FROM orders
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_quantity >= 50.0 AND l_discount > 0.09)
      SELECT c_mktsegment, count(*) AS n_customers,
        sum(CAST(c_acctbal AS DECIMAL(18,2)))::DOUBLE AS total_bal,
        min(c_custkey) AS min_cust
      FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM active)
        AND c_custkey NOT IN (SELECT o_custkey FROM big)
        AND c_custkey NOT IN (SELECT o_custkey FROM bulk)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** TPC-DS Q67 shape: a four-level ROLLUP (type → brand → year → month)
    * of shipped quantity, then a windowed top-k WITHIN each part type
    * over the rollup output — every aggregation level competes in one
    * ranking, the decision shape none of the flat groupBys exercises.
    * The window partitions by type over the ROLLUP OUTPUT, which is
    * dimension-bounded (|type|·|brand|·|yr|·|mon| groups), never
    * corpus-sized — the q121 window discipline holds at any SF. The rank
    * order appends (lvl, brand, yr, mon) after the quantity, a strict
    * total order within the partition, so rank ≡ row_number and the
    * output is deterministic; every null ordering is pinned NULLS FIRST
    * explicitly on BOTH engines (Spark's ASC default is nulls-first,
    * DuckDB's is nulls-last — an unpinned sort would silently disagree
    * on every rollup row). Quantity routes through DECIMAL(18,4) and one
    * final cast to DOUBLE (the q36 moment-sum device): l_quantity is a
    * DOUBLE allowed ≤2 decimal digits, and a direct double→BIGINT cast
    * TRUNCATES in Spark but ROUNDS in DuckDB — a latent value divergence
    * current (integral) data would never surface.
    */
  // Expressed through spark.sql rather than the Dataset rollup/Window
  // API: Spark 4.1's Dataset-API ambiguous-self-join detection false-
  // positives on the join -> rollup -> window chain (the rollup Expand
  // duplicates the grouping attributes and the detector then flags ALL
  // of them, even dataset-qualified ones — reproduced minimally in this
  // round; SQL analysis does not run that check). The logical plan is
  // identical either way: one Expand + partial/final aggregate + one
  // bounded window.
  def q130Dsrollup(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("q130_lineitem")
    t(spark, dir, "part").createOrReplaceTempView("q130_part")
    spark.sql("""
      WITH base AS (
        SELECT p_type AS ptype, p_brand AS brand,
               year(l_shipdate) AS yr, month(l_shipdate) AS mon,
               CAST(l_quantity AS DECIMAL(18,4)) AS qty
        FROM q130_lineitem JOIN q130_part ON p_partkey = l_partkey),
      r AS (
        SELECT ptype, brand, yr, mon,
          CAST(GROUPING(ptype)*8 + GROUPING(brand)*4 + GROUPING(yr)*2 + GROUPING(mon) AS INT) AS lvl,
          CAST(sum(qty) AS DOUBLE) AS sum_qty
        FROM base GROUP BY ROLLUP(ptype, brand, yr, mon)),
      w AS (
        SELECT *, rank() OVER (PARTITION BY ptype ORDER BY sum_qty DESC,
          lvl ASC, brand ASC NULLS FIRST, yr ASC NULLS FIRST, mon ASC NULLS FIRST) AS rk
        FROM r)
      SELECT ptype, brand, yr, mon, lvl, sum_qty, rk FROM w WHERE rk <= 5
      ORDER BY ptype NULLS FIRST, rk, lvl, brand NULLS FIRST, yr NULLS FIRST, mon NULLS FIRST""")
  }

  val q130DsrollupSql: String =
    """WITH base AS (SELECT p_type AS ptype, p_brand AS brand,
        year(l_shipdate)::INT AS yr, month(l_shipdate)::INT AS mon,
        CAST(l_quantity AS DECIMAL(18,4)) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey),
      r AS (SELECT ptype, brand, yr, mon,
        (GROUPING(ptype)*8 + GROUPING(brand)*4 + GROUPING(yr)*2 + GROUPING(mon))::INT AS lvl,
        sum(qty)::DOUBLE AS sum_qty
      FROM base GROUP BY ROLLUP(ptype, brand, yr, mon)),
      w AS (SELECT *, rank() OVER (PARTITION BY ptype ORDER BY sum_qty DESC,
        lvl ASC, brand ASC NULLS FIRST, yr ASC NULLS FIRST, mon ASC NULLS FIRST) AS rk
      FROM r)
      SELECT ptype, brand, yr, mon, lvl, sum_qty, rk::INT AS rk FROM w WHERE rk <= 5
      ORDER BY ptype NULLS FIRST, rk, lvl, brand NULLS FIRST, yr NULLS FIRST, mon NULLS FIRST"""

  /** TPC-DS Q95 shape: orders provably MULTI-SOURCED (a second lineitem
    * of the same order from a different supplier — a self semi-join on
    * the fact's own key with an inequality residual) that ALSO saw a
    * return — a second semi-join against the returned-line keyset — then
    * one priority rollup of the surviving orders. Three fact references,
    * zero fact-fact row multiplication: both EXISTS collapse to slim
    * distinct orderkey sets before touching orders, and the self
    * semi-join shuffles on orderkey where the per-order fan is bounded
    * by lines-per-order (≤7 in TPC-H at any SF), so no key explodes.
    */
  def q131Dsmultihop(spark: SparkSession, dir: String): DataFrame = {
    // One target year out of the data's ~6.6-year span (1995..2001 —
    // NOTE: the TPC-DS Q95 text's 1994 window is EMPTY in this corpus at
    // every SF, which made the r12 oracle gate vacuous; 1996 keeps the
    // query's selectivity real).
    val ordersYear = t(spark, dir, "orders")
      .filter(col("o_orderdate").between("1996-01-01", "1996-12-31"))
    // r12 verdict #2: only ~15% of orders survive the year filter, but
    // the fact self-semi-join ran over ALL lineitem rows — derive the
    // date-pruned orderkey keyset from orders FIRST and semi-filter the
    // fact before the self-join. Every downstream shuffle (the self
    // semi-join, both distincts) co-partitions on l_orderkey, so the
    // prune costs one slim keyset exchange and shrinks the
    // scan/shuffle/distinct volume on the largest table ~7x at any SF.
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      .join(
        ordersYear.select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"),
        "left_semi")
    val multi = li
      .as("a")
      .join(
        li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") =!= col("b.l_suppkey"),
        "left_semi")
      .select(col("l_orderkey"))
      .distinct()
    val returned = li
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
      .distinct()
    ordersYear
      .join(multi.select(col("l_orderkey").as("o_orderkey")), Seq("o_orderkey"), "left_semi")
      .join(returned.select(col("l_orderkey").as("o_orderkey")), Seq("o_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"))
      .orderBy("o_orderpriority")
  }

  val q131DsmultihopSql: String =
    """WITH multi AS (SELECT DISTINCT a.l_orderkey FROM lineitem a
        WHERE EXISTS (SELECT 1 FROM lineitem b
          WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey)),
      ret AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
      SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
        sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS total_price
      FROM orders
      WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        AND o_orderkey IN (SELECT l_orderkey FROM multi)
        AND o_orderkey IN (SELECT l_orderkey FROM ret)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** TPC-DS Q23 shape (multi-CTE frequent-buyer reuse consumed by two
    * scalar contexts): an expensive per-customer spend CTE over all of
    * orders is built ONCE (Caches.track persist) and consumed three ways —
    * (a) the max-spend scalar that sets the best-buyer threshold, (b) the
    * best-buyer count scalar stamped onto the output, (c) the best-buyer
    * keyset that semi-filters the fact — plus a frequent-part keyset
    * (parts in >6 distinct orders in the target year), Q23's
    * frequent_ss_items. Q23's two UNION'd channel branches collapse to one
    * tagged fact pass (Spark-first: the branches differ only in a
    * predicate, so one scan + a channel CASE replaces two scans).
    *
    * Scale: the spend CTE shuffles orders once on o_custkey; the scalars
    * are 1-row broadcasts; the best/frequent keysets join as semi-joins
    * with no size hint — customer-/part-proportional at 100 TB, so AQE
    * picks broadcast only when they actually fit. Threshold compares stay
    * in exact DECIMAL (spend*2 > max), never double.
    */
  def q132Dsfreqbuyer(spark: SparkSession, dir: String): DataFrame = {
    val spend = graft.Caches.track(
      t(spark, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val mx = spend.agg(max(col("spend")).as("max_spend"))
    val best = spend
      .crossJoin(broadcast(mx))
      .filter(col("spend") * lit(2) > col("max_spend"))
      .select(col("o_custkey"))
    val nBest = best.agg(count(lit(1)).as("n_best_cust"))
    val freq = t(spark, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1996)
      .groupBy(col("l_partkey"))
      .agg(countDistinct(col("l_orderkey")).as("n_ord"))
      .filter(col("n_ord") > 6)
      .select(col("l_partkey"))
    t(spark, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1996)
      .join(
        t(spark, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"), col("o_orderpriority")),
        Seq("l_orderkey"))
      .join(best, Seq("o_custkey"), "left_semi")
      .join(freq, Seq("l_partkey"), "left_semi")
      .withColumn(
        "channel",
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit("urgent"))
          .otherwise(lit("regular")))
      .groupBy("channel")
      .agg(
        count(lit(1)).as("n_lines"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("revenue"))
      .crossJoin(broadcast(nBest))
      .crossJoin(broadcast(mx))
      .select(
        col("channel"),
        col("n_lines"),
        col("revenue").cast("double").as("revenue"),
        col("n_best_cust"),
        col("max_spend").cast("double").as("max_spend"))
      .orderBy("channel")
  }

  val q132DsfreqbuyerSql: String =
    """WITH spend AS (
        SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        FROM orders GROUP BY 1),
      mx AS (SELECT max(spend) AS max_spend FROM spend),
      best AS (SELECT o_custkey FROM spend, mx WHERE spend * 2 > max_spend),
      nb AS (SELECT count(*)::BIGINT AS n_best_cust FROM best),
      freq AS (SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1996
        GROUP BY 1 HAVING count(DISTINCT l_orderkey) > 6)
      SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
               THEN 'urgent' ELSE 'regular' END AS channel,
        count(*)::BIGINT AS n_lines,
        sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4)))::DOUBLE AS revenue,
        nb.n_best_cust, mx.max_spend::DOUBLE AS max_spend
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey, nb, mx
      WHERE year(l.l_shipdate) = 1996
        AND o.o_custkey IN (SELECT o_custkey FROM best)
        AND l.l_partkey IN (SELECT l_partkey FROM freq)
      GROUP BY 1, nb.n_best_cust, mx.max_spend
      ORDER BY channel"""

  /** Revenue-concentration (Pareto) election per market segment: the
    * smallest prefix of customers — spend-descending — whose cumulative
    * revenue reaches 80% of the segment's total, reported as a per-
    * segment `(n_cust, n_top, total_cents)` row. The concentration
    * report every account-weighted sampler and curriculum builder reads
    * ("how few keys carry most of the mass?").
    *
    * Cross-engine discipline: money aggregates through DECIMAL(18,2),
    * lands in exact BIGINT CENTS, and the 80% election is the integer
    * cross-multiplication `(cum − own)·5 < total·4` — no ratio ever
    * forms; ordering ties break on custkey. Scale: the window runs over
    * the AGGREGATED (segment, customer) spend frame, partitioned by
    * segment — at an extreme per-segment cardinality the same
    * prefix-sum rides the two-pass GlobalRank device (range-partition
    * by spend, per-partition totals offset-broadcast); the election
    * and both aggregates are map-side combinable.
    */
  def q135Paretocust(spark: SparkSession, dir: String): DataFrame = {
    val spend = graft.Caches.track(
      t(spark, dir, "orders")
        .join(
          t(spark, dir, "customer")
            .select(col("c_custkey").as("o_custkey"), col("c_mktsegment").as("seg")),
          Seq("o_custkey"))
        .groupBy(col("seg"), col("o_custkey").as("ck"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("cents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val tot = spend
      .groupBy("seg")
      .agg(sum(col("cents")).as("total_cents"), count(lit(1)).as("n_cust"))
    val cum = spend.withColumn(
      "cum",
      sum(col("cents")).over(
        Window
          .partitionBy("seg")
          .orderBy(col("cents").desc, col("ck"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val elect = cum
      .join(broadcast(tot.select("seg", "total_cents")), Seq("seg"))
      .filter((col("cum") - col("cents")) * 5 < col("total_cents") * 4)
      .groupBy("seg")
      .agg(count(lit(1)).as("n_top"))
    tot
      .join(elect, Seq("seg"))
      .select("seg", "n_cust", "n_top", "total_cents")
      .orderBy("seg")
  }

  val q135ParetocustSql: String =
    """WITH spend AS MATERIALIZED (SELECT c_mktsegment AS seg, o_custkey AS ck,
        (sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100)::BIGINT AS cents
      FROM orders JOIN customer ON c_custkey = o_custkey GROUP BY 1, 2),
      tot AS (SELECT seg, sum(cents)::BIGINT AS total_cents, count(*)::BIGINT AS n_cust
        FROM spend GROUP BY 1),
      cum AS (SELECT seg, ck, cents,
          sum(cents) OVER (PARTITION BY seg ORDER BY cents DESC, ck
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        FROM spend),
      elect AS (SELECT c.seg, count(*)::BIGINT AS n_top
        FROM cum c JOIN tot USING (seg)
        WHERE (c.cum - c.cents) * 5 < total_cents * 4
        GROUP BY 1)
      SELECT t.seg, t.n_cust, e.n_top, t.total_cents
      FROM tot t JOIN elect e USING (seg) ORDER BY t.seg"""

  /** TPC-DS Q97 shape (two-channel customer-item overlap): the DISTINCT
    * (customer, part) pairs bought through the "urgent" channel
    * (priority 1/2) vs the "deferred" channel (priority 4/5), FULL-OUTER
    * aligned, reduced to the three overlap counts Q97 emits (both,
    * left-only, right-only).
    *
    * Scale: each channel is a map-side-combinable DISTINCT on
    * (custkey, partkey); the full outer join co-partitions both sides on
    * exactly those keys, so the alignment is one co-clustered shuffle and
    * the output is three counters — nothing row-shaped survives the agg.
    */
  def q136Dschannelmix(spark: SparkSession, dir: String): DataFrame = {
    def channel(prios: Seq[String], tag: String): DataFrame =
      t(spark, dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(
          t(spark, dir, "orders")
            .filter(col("o_orderpriority").isin(prios: _*))
            .select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
          Seq("l_orderkey"))
        .select(col("o_custkey"), col("l_partkey"), lit(1L).as(tag))
        .distinct()
    val a = channel(Seq("1-URGENT", "2-HIGH"), "in_a")
    val b = channel(Seq("5-LOW", "4-NOT SPECIFIED"), "in_b")
    a.join(b, Seq("o_custkey", "l_partkey"), "full_outer")
      .agg(
        sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1L).otherwise(0L))
          .as("n_both"),
        sum(when(col("in_b").isNull, 1L).otherwise(0L)).as("n_a_only"),
        sum(when(col("in_a").isNull, 1L).otherwise(0L)).as("n_b_only"))
  }

  val q136DschannelmixSql: String =
    """WITH a AS (SELECT DISTINCT o_custkey, l_partkey
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderpriority IN ('1-URGENT','2-HIGH')),
      b AS (SELECT DISTINCT o_custkey, l_partkey
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderpriority IN ('5-LOW','4-NOT SPECIFIED'))
      SELECT
        count(*) FILTER (WHERE a.o_custkey IS NOT NULL AND b.o_custkey IS NOT NULL)::BIGINT AS n_both,
        count(*) FILTER (WHERE b.o_custkey IS NULL)::BIGINT AS n_a_only,
        count(*) FILTER (WHERE a.o_custkey IS NULL)::BIGINT AS n_b_only
      FROM a FULL OUTER JOIN b
        ON a.o_custkey = b.o_custkey AND a.l_partkey = b.l_partkey"""

  /** TPC-DS Q39 shape (inventory coefficient-of-variation across
    * consecutive months): per (part, 1996-month) daily shipped-quantity
    * series → mean/stdev, keep months where COV = stdev/mean > 1/4, and
    * self-join a flagged month with its flagged successor.
    *
    * Cross-engine discipline: COV on floats is a sqrt + division — both
    * order- and libm-sensitive. The filter is instead the integer
    * cross-multiplication `16·n·(nQ − S²) > (n−1)·S²` (sample variance
    * vs (mean/4)², quantities are exact ints so S and Q are exact
    * BIGINTs), and the emitted mean is floor-scaled ppm
    * (`S·1e6 div n`) — no float ever forms. Scale: daily and monthly
    * aggregates are map-side combinable on (partkey, …); the
    * consecutive-month self-join runs on the tiny flagged-stats frame,
    * never on lineitem.
    */
  def q137Dsinventory(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1996)
      .groupBy(
        col("l_partkey"),
        month(col("l_shipdate")).cast("long").as("m"),
        date_trunc("day", col("l_shipdate")).as("d"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
    val flagged = daily
      .groupBy("l_partkey", "m")
      .agg(
        count(lit(1)).as("n"),
        sum(col("qty")).as("s"),
        sum(col("qty") * col("qty")).as("q"))
      .filter(
        col("n") > 1 &&
          lit(16L) * col("n") * (col("n") * col("q") - col("s") * col("s")) >
          (col("n") - 1) * col("s") * col("s"))
      .select(
        col("l_partkey"),
        col("m"),
        col("n"),
        expr("(s * CAST(1000000 AS BIGINT)) div n").as("mean_ppm"))
    flagged
      .select(
        col("l_partkey"),
        col("m"),
        col("n").as("n_a"),
        col("mean_ppm").as("mean_a_ppm"))
      .join(
        flagged.select(
          col("l_partkey"),
          (col("m") - 1).as("m"),
          col("n").as("n_b"),
          col("mean_ppm").as("mean_b_ppm")),
        Seq("l_partkey", "m"))
      .orderBy("l_partkey", "m")
  }

  val q137DsinventorySql: String =
    """WITH daily AS (
        SELECT l_partkey, month(l_shipdate)::BIGINT AS m,
          date_trunc('day', l_shipdate) AS d,
          sum(l_quantity::BIGINT)::BIGINT AS qty
        FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1, 2, 3),
      flagged AS (
        SELECT l_partkey, m, count(*)::BIGINT AS n,
          (sum(qty) * 1000000 // count(*))::BIGINT AS mean_ppm
        FROM daily GROUP BY 1, 2
        HAVING count(*) > 1
          AND 16 * count(*) * (count(*) * sum(qty * qty) - sum(qty) * sum(qty))
              > (count(*) - 1) * sum(qty) * sum(qty))
      SELECT a.l_partkey, a.m, a.n AS n_a, a.mean_ppm AS mean_a_ppm,
        b.n AS n_b, b.mean_ppm AS mean_b_ppm
      FROM flagged a JOIN flagged b
        ON a.l_partkey = b.l_partkey AND b.m = a.m + 1
      ORDER BY a.l_partkey, a.m"""

  /** TPC-DS Q78 shape (three-channel full-outer alignment with
    * null-channel ratios): three independently-aggregated per-
    * (customer, year) channels — orders placed (by order year), lineitems
    * shipped (by SHIP year, so a December order genuinely lands in the
    * next shipping year and the alignment has real one-sided rows), and
    * returned lines — FULL-OUTER aligned on (custkey, yr), absent
    * channels coalesced into the ratios exactly as Q78 treats a customer
    * with store sales but no web/catalog row. Anchored on the ord channel
    * (Q78 anchors store sales); top-100 by ship-to-order ratio with full
    * tie-breaks.
    *
    * Scale: each channel is one map-side-combined aggregate; the two
    * full-outer joins co-partition on (custkey, yr) so the alignment is
    * one shuffle per channel and never row-multiplying (the keys are
    * unique per channel by construction). Ratios divide as doubles cast
    * from exact DECIMAL sums — IEEE-identical across engines.
    */
  def q133Dsalign3(spark: SparkSession, dir: String): DataFrame = {
    val liCust = t(spark, dir, "lineitem")
      .join(
        t(spark, dir, "orders").select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        Seq("l_orderkey"))
    val ord = t(spark, dir, "orders")
      .groupBy(
        col("o_custkey").as("custkey"),
        year(col("o_orderdate")).cast("int").as("yr"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("ord_rev"))
    val shp = liCust
      .groupBy(
        col("o_custkey").as("custkey"),
        year(col("l_shipdate")).cast("int").as("yr"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).as("shp_rev"))
    val ret = liCust
      .filter(col("l_returnflag") === "R")
      .groupBy(
        col("o_custkey").as("custkey"),
        year(col("l_shipdate")).cast("int").as("yr"))
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("ret_qty"))
    ord
      .join(shp, Seq("custkey", "yr"), "full_outer")
      .join(ret, Seq("custkey", "yr"), "full_outer")
      .filter(col("ord_rev").isNotNull)
      .select(
        col("custkey"),
        col("yr"),
        col("ord_rev").cast("double").as("ord_rev"),
        coalesce(col("shp_rev"), lit(0).cast("decimal(18,4)")).cast("double").as("shp_rev"),
        coalesce(col("ret_qty"), lit(0).cast("decimal(18,4)")).cast("double").as("ret_qty"),
        when(col("shp_rev").isNull, lit(0.0))
          .otherwise(col("shp_rev").cast("double") / col("ord_rev").cast("double"))
          .as("ship_ratio"),
        when(col("shp_rev").isNull, lit(0.0))
          .otherwise(
            coalesce(col("ret_qty"), lit(0).cast("decimal(18,4)")).cast("double") /
              col("shp_rev").cast("double"))
          .as("ret_ratio"))
      .orderBy(col("ship_ratio").desc, col("custkey"), col("yr"))
      .limit(100)
  }

  val q133Dsalign3Sql: String =
    """WITH ord AS (
        SELECT o_custkey AS custkey, year(o_orderdate)::INT AS yr,
          sum(CAST(o_totalprice AS DECIMAL(18,2))) AS ord_rev
        FROM orders GROUP BY 1, 2),
      shp AS (
        SELECT o_custkey AS custkey, year(l_shipdate)::INT AS yr,
          sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS shp_rev
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey GROUP BY 1, 2),
      ret AS (
        SELECT o_custkey AS custkey, year(l_shipdate)::INT AS yr,
          sum(CAST(l_quantity AS DECIMAL(18,4))) AS ret_qty
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_returnflag = 'R' GROUP BY 1, 2)
      SELECT custkey, yr, ord_rev::DOUBLE AS ord_rev,
        COALESCE(shp_rev, 0)::DOUBLE AS shp_rev,
        COALESCE(ret_qty, 0)::DOUBLE AS ret_qty,
        CASE WHEN shp_rev IS NULL THEN 0.0
             ELSE shp_rev::DOUBLE / ord_rev::DOUBLE END AS ship_ratio,
        CASE WHEN shp_rev IS NULL THEN 0.0
             ELSE COALESCE(ret_qty, 0)::DOUBLE / shp_rev::DOUBLE END AS ret_ratio
      FROM ord
      FULL JOIN shp USING (custkey, yr)
      FULL JOIN ret USING (custkey, yr)
      WHERE ord_rev IS NOT NULL
      ORDER BY ship_ratio DESC, custkey, yr LIMIT 100"""

  /** Pure band join (NO equi key): for every purchase event, the count of
    * click events — by ANY user — within ±60 s, then the histogram of
    * those neighbor counts. The keyless |l.t − r.t| ≤ w join is the shape
    * Spark plans as BroadcastNestedLoopJoin / cartesian (|L|×|R|);
    * [[graft.operators.BandJoin]] rewrites it to a 3-cell explode + one
    * equi-join on the time cell + an exact residual — plan-locked to
    * contain a Generate and a hash join and NO nested-loop/cartesian.
    * DuckDB's IEJoin answers the naive inequality-join oracle directly.
    */
  def q134Bandjoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val p = ev
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
    val c = ev
      .filter(col("event_type") === "click")
      .select(unix_micros(col("ts")).as("c_us"))
    graft.operators.BandJoin
      .banded(p, c, "p_us", "c_us", 60L * 1000000L)
      .groupBy("p_id")
      .agg(count(lit(1)).as("n_nearby"))
      .groupBy("n_nearby")
      .agg(count(lit(1)).as("n_purchases"))
      .orderBy("n_nearby")
  }

  val q134BandjoinSql: String =
    """WITH p AS (SELECT event_id AS p_id, epoch_us(ts) AS p_us
        FROM events WHERE event_type = 'purchase'),
      c AS (SELECT epoch_us(ts) AS c_us FROM events WHERE event_type = 'click'),
      j AS (SELECT p_id, count(*)::BIGINT AS n_nearby
        FROM p JOIN c ON abs(p_us - c_us) <= 60000000 GROUP BY 1)
      SELECT n_nearby, count(*)::BIGINT AS n_purchases
      FROM j GROUP BY 1 ORDER BY 1"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q135_paretocust" -> q135Paretocust _,
    "q136_dschannelmix" -> q136Dschannelmix _,
    "q137_dsinventory" -> q137Dsinventory _,
    "q132_dsfreqbuyer" -> q132Dsfreqbuyer _,
    "q133_dsalign3" -> q133Dsalign3 _,
    "q134_bandjoin" -> q134Bandjoin _,
    "q129_dsabsent" -> q129Dsabsent _,
    "q130_dsrollup" -> q130Dsrollup _,
    "q131_dsmultihop" -> q131Dsmultihop _,
    "q128_dsdev" -> q128Dsdev _,
    "q127_dsvariance" -> q127Dsvariance _,
    "q126_dsreturns" -> q126Dsreturns _,
    "q125_dstimebands" -> q125Dstimebands _,
    "q123_dsreuse" -> q123Dsreuse _,
    "q124_dsspine" -> q124Dsspine _,
    "q122_dsgrowth" -> q122Dsgrowth _,
    "q120_dsintersect" -> q120Dsintersect _,
    "q121_dscumulative" -> q121Dscumulative _,
    "q118_dsrollup" -> q118Dsrollup _,
    "q119_dsexists" -> q119Dsexists _,
    "q115_dscte" -> q115Dscte _,
    "q116_dswindow" -> q116Dswindow _,
    "q117_dschannels" -> q117Dschannels _,
    "q92_tpch7" -> q92Tpch7 _,
    "q93_tpch20" -> q93Tpch20 _,
    "q96_tpch13" -> q96Tpch13 _,
    "q97_tpch3" -> q97Tpch3 _,
    "q98_tpch10" -> q98Tpch10 _,
    "q99_tpch14" -> q99Tpch14 _,
    "q100_tpch19" -> q100Tpch19 _,
    "q101_tpch22" -> q101Tpch22 _,
    "q103_tpch21" -> q103Tpch21 _,
    "q104_tpch7" -> q104Tpch7 _,
    "q105_tpch8" -> q105Tpch8 _,
    "q106_tpch9" -> q106Tpch9 _,
    "q107_tpch11" -> q107Tpch11 _,
    "q108_tpch15" -> q108Tpch15 _,
    "q109_tpch17" -> q109Tpch17 _,
    "q110_tpch4" -> q110Tpch4 _,
    "q111_tpch6" -> q111Tpch6 _,
    "q112_tpch12" -> q112Tpch12 _,
    "q113_tpch16" -> q113Tpch16 _,
    "q114_tpch1" -> q114Tpch1 _,
    "q102_sketch_merge" -> q102SketchMerge _,
    "q95_islands" -> q95Islands _,
    "q91_changepoint" -> q91Changepoint _,
    "q90_resample" -> q90Resample _,
    "q88_scd2" -> q88Scd2 _,
    "q89_tpch2" -> q89Tpch2 _,
    "q86_ivm" -> q86Ivm _,
    "q85_asof_exec" -> q85AsofExec _,
    "q84_kanon" -> q84Kanon _,
    "q82_tpch18" -> q82Tpch18 _,
    "q83_attribution" -> q83Attribution _,
    "q81_retention" -> q81Retention _,
    "q80_paths" -> q80Paths _,
    "q79_histogram" -> q79Histogram _,
    "q77_tpch5" -> q77Tpch5 _,
    "q78_funnel" -> q78Funnel _,
    "q76_orc_roundtrip" -> q76OrcRoundtrip _,
    "q75_skewstats" -> q75Skewstats _,
    "q73_profile" -> q73Profile _,
    "q74_constraints" -> q74Constraints _,
    "q1_agg" -> q1Agg _,
    "q2_filter" -> q2Filter _,
    "q3_join_agg" -> q3JoinAgg _,
    "q4_semi" -> q4Semi _,
    "q5_anti" -> q5Anti _,
    "q6_cross" -> q6Cross _,
    "q7_union" -> q7Union _,
    "q8_intersect" -> q8Intersect _,
    "q9_except" -> q9Except _,
    "q10_pivot" -> q10Pivot _,
    "q11_window" -> q11Window _,
    "q12_topk" -> q12TopK _,
    "q13_hourly" -> q13Hourly _,
    "q14_sessionize" -> q14Sessionize _,
    "q15_asof" -> q15Asof _,
    "q16_rollup" -> q16Rollup _,
    "q17_explode" -> q17Explode _,
    "q18_csv_roundtrip" -> q18CsvRoundtrip _,
    "q19_json" -> q19Json _,
    "q20_ndv" -> q20Ndv _,
    "q21_sql" -> q21Sql _,
    "q22_running" -> q22Running _,
    "q23_json_roundtrip" -> q23JsonRoundtrip _,
    "q24_partitioned" -> q24Partitioned _,
    "q25_bucketed" -> q25Bucketed _,
    "q26_udaf" -> q26Udaf _,
    "q27_orc_roundtrip" -> q27OrcRoundtrip _,
    "q28_sketch" -> q28Sketch _,
    "q29_strings" -> q29Strings _,
    "q30_datetime" -> q30Datetime _,
    "q31_ranks" -> q31Ranks _,
    "q32_conditional" -> q32Conditional _,
    "q33_nulls" -> q33Nulls _,
    "q34_arrays" -> q34Arrays _,
    "q35_map" -> q35Map _,
    "q36_stats" -> q36Stats _,
    "q37_range" -> q37Range _,
    "q38_lateral" -> q38Lateral _,
    "q39_groupingsets" -> q39GroupingSets _,
    "q40_median" -> q40Median _,
    "q41_corr" -> q41Corr _,
    "q42_bitagg" -> q42Bitagg _,
    "q43_stringagg" -> q43StringAgg _,
    "q44_unpivot" -> q44Unpivot _,
    "q45_range_join" -> q45RangeJoin _,
    "q46_skew_salted" -> q46SkewSalted _,
    "q47_xml_roundtrip" -> q47XmlRoundtrip _,
    "q48_outer" -> q48Outer _,
    "q49_bagops" -> q49Bagops _,
    "q50_hof" -> q50Hof _,
    "q51_compact" -> q51Compact _,
    "q52_evolution" -> q52Evolution _,
    "q53_sql_native" -> q53SqlNative _,
    "q54_sliding" -> q54Sliding _,
    "q55_cube" -> q55Cube _,
    "q56_datespine" -> q56Datespine _,
    "q57_recursive" -> q57Recursive _,
    "q58_variant" -> q58Variant _,
    "q59_try" -> q59Try _,
    "q60_maphof" -> q60Maphof _,
    "q61_params" -> q61Params _,
    "q62_backfill" -> q62Backfill _,
    "q63_zorder" -> q63Zorder _,
    "q64_bloom" -> q64Bloom _,
    "q65_latest" -> q65Latest _,
    "q66_asof_fwd" -> q66AsofFwd _,
    "q67_scd2" -> q67Scd2 _,
    "q68_diff" -> q68Diff _,
    "q69_merge" -> q69Merge _,
    "q70_dynamic_pivot" -> q70DynamicPivot _,
    "q71_badrecords" -> q71Badrecords _,
    "q72_observe" -> q72Observe _)

  val oracles: Map[String, String] = Map(
    "q122_dsgrowth" -> q122DsgrowthSql,
    "q125_dstimebands" -> q125DstimebandsSql,
    "q126_dsreturns" -> q126DsreturnsSql,
    "q127_dsvariance" -> q127DsvarianceSql,
    "q128_dsdev" -> q128DsdevSql,
    "q129_dsabsent" -> q129DsabsentSql,
    "q130_dsrollup" -> q130DsrollupSql,
    "q131_dsmultihop" -> q131DsmultihopSql,
    "q135_paretocust" -> q135ParetocustSql,
    "q136_dschannelmix" -> q136DschannelmixSql,
    "q137_dsinventory" -> q137DsinventorySql,
    "q132_dsfreqbuyer" -> q132DsfreqbuyerSql,
    "q133_dsalign3" -> q133Dsalign3Sql,
    "q134_bandjoin" -> q134BandjoinSql,
    "q123_dsreuse" -> q123DsreuseSql,
    "q124_dsspine" -> q124DsspineSql,
    "q120_dsintersect" -> q120DsintersectSql,
    "q121_dscumulative" -> q121DscumulativeSql,
    "q118_dsrollup" -> q118DsrollupSql,
    "q119_dsexists" -> q119DsexistsSql,
    "q115_dscte" -> q115DscteSql,
    "q116_dswindow" -> q116DswindowSql,
    "q117_dschannels" -> q117DschannelsSql,
    "q92_tpch7" -> q92Tpch7Sql,
    "q93_tpch20" -> q93Tpch20Sql,
    "q96_tpch13" -> q96Tpch13Sql,
    "q97_tpch3" -> q97Tpch3Sql,
    "q98_tpch10" -> q98Tpch10Sql,
    "q99_tpch14" -> q99Tpch14Sql,
    "q100_tpch19" -> q100Tpch19Sql,
    "q101_tpch22" -> q101Tpch22Sql,
    "q103_tpch21" -> q103Tpch21Sql,
    "q104_tpch7" -> q104Tpch7Sql,
    "q105_tpch8" -> q105Tpch8Sql,
    "q106_tpch9" -> q106Tpch9Sql,
    "q107_tpch11" -> q107Tpch11Sql,
    "q108_tpch15" -> q108Tpch15Sql,
    "q109_tpch17" -> q109Tpch17Sql,
    "q110_tpch4" -> q110Tpch4Sql,
    "q111_tpch6" -> q111Tpch6Sql,
    "q112_tpch12" -> q112Tpch12Sql,
    "q113_tpch16" -> q113Tpch16Sql,
    "q114_tpch1" -> q114Tpch1Sql,
    "q102_sketch_merge" -> q102SketchMergeSql,
    "q95_islands" -> q95IslandsSql,
    "q91_changepoint" -> q91ChangepointSql,
    "q90_resample" -> q90ResampleSql,
    "q88_scd2" -> q88Scd2Sql,
    "q89_tpch2" -> q89Tpch2Sql,
    "q86_ivm" -> q86IvmSql,
    "q85_asof_exec" -> q83AttributionSql,
    "q84_kanon" -> q84KanonSql,
    "q82_tpch18" -> q82Tpch18Sql,
    "q83_attribution" -> q83AttributionSql,
    "q81_retention" -> q81RetentionSql,
    "q80_paths" -> q80PathsSql,
    "q79_histogram" -> q79HistogramSql,
    "q77_tpch5" -> q77Tpch5Sql,
    "q78_funnel" -> q78FunnelSql,
    "q1_agg" -> q1AggSql,
    "q2_filter" -> q2FilterSql,
    "q3_join_agg" -> q3JoinAggSql,
    "q4_semi" -> q4SemiSql,
    "q5_anti" -> q5AntiSql,
    "q6_cross" -> q6CrossSql,
    "q7_union" -> q7UnionSql,
    "q8_intersect" -> q8IntersectSql,
    "q9_except" -> q9ExceptSql,
    "q10_pivot" -> q10PivotSql,
    "q11_window" -> q11WindowSql,
    "q12_topk" -> q12TopKSql,
    "q13_hourly" -> q13HourlySql,
    "q14_sessionize" -> q14SessionizeSql,
    "q15_asof" -> q15AsofSql,
    "q16_rollup" -> q16RollupSql,
    "q17_explode" -> q17ExplodeSql,
    "q18_csv_roundtrip" -> q18CsvRoundtripSql,
    "q19_json" -> q19JsonSql,
    "q20_ndv" -> q20NdvSql,
    "q21_sql" -> q21SqlSql,
    "q22_running" -> q22RunningSql,
    "q23_json_roundtrip" -> q23JsonRoundtripSql,
    "q24_partitioned" -> q24PartitionedSql,
    "q25_bucketed" -> q25BucketedSql,
    "q26_udaf" -> q26UdafSql,
    "q27_orc_roundtrip" -> q27OrcRoundtripSql,
    "q28_sketch" -> q28SketchSql,
    "q29_strings" -> q29StringsSql,
    "q30_datetime" -> q30DatetimeSql,
    "q31_ranks" -> q31RanksSql,
    "q32_conditional" -> q32ConditionalSql,
    "q33_nulls" -> q33NullsSql,
    "q34_arrays" -> q34ArraysSql,
    "q35_map" -> q35MapSql,
    "q36_stats" -> q36StatsSql,
    "q37_range" -> q37RangeSql,
    "q38_lateral" -> q38LateralSql,
    "q39_groupingsets" -> q39GroupingSetsSql,
    "q40_median" -> q40MedianSql,
    "q41_corr" -> q41CorrSql,
    "q42_bitagg" -> q42BitaggSql,
    "q43_stringagg" -> q43StringAggSql,
    "q44_unpivot" -> q44UnpivotSql,
    "q45_range_join" -> q45RangeJoinSql,
    "q46_skew_salted" -> q46SkewSaltedSql,
    "q47_xml_roundtrip" -> q47XmlRoundtripSql,
    "q48_outer" -> q48OuterSql,
    "q49_bagops" -> q49BagopsSql,
    "q50_hof" -> q50HofSql,
    "q51_compact" -> q51CompactSql,
    "q52_evolution" -> q52EvolutionSql,
    "q53_sql_native" -> q53SqlNativeSql,
    "q54_sliding" -> q54SlidingSql,
    "q55_cube" -> q55CubeSql,
    "q56_datespine" -> q56DatespineSql,
    "q57_recursive" -> q57RecursiveSql,
    "q58_variant" -> q58VariantSql,
    "q59_try" -> q59TrySql,
    "q60_maphof" -> q60MaphofSql,
    "q61_params" -> q61ParamsSql,
    "q62_backfill" -> q62BackfillSql,
    "q63_zorder" -> q63ZorderSql,
    "q64_bloom" -> q64BloomSql,
    "q65_latest" -> q65LatestSql,
    "q66_asof_fwd" -> q66AsofFwdSql,
    "q67_scd2" -> q67Scd2Sql,
    "q68_diff" -> q68DiffSql,
    "q69_merge" -> q69MergeSql,
    "q70_dynamic_pivot" -> q70DynamicPivotSql,
    "q71_badrecords" -> q71BadrecordsSql,
    "q72_observe" -> q72ObserveSql,
    "q73_profile" -> q73ProfileSql,
    "q74_constraints" -> q74ConstraintsSql,
    "q75_skewstats" -> q75SkewstatsSql,
    "q76_orc_roundtrip" -> q76OrcRoundtripSql)
}
