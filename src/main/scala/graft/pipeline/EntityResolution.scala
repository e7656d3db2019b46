package graft.pipeline

import graft.functions.{Cleaning, Similarity}
import graft.operators.ConnectedComponents
import graft.sources.AminerReader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end entity-resolution pipeline: parse -> clean -> block -> match ->
  * cluster -> emit. Spark-first re-expression of
  * `/root/reference/src/pipeline.py` with three deliberate scale-design
  * departures (results are set-equal; see Scaladoc per stage):
  *
  *  - deterministic record ids (`xxhash64(value)`) instead of
  *    `monotonically_increasing_id()` called twice (`cleaning.py:190,193`),
  *    which is partition-order dependent;
  *  - blocking as ONE equi-join on exploded `(venue_tag, window_start)` block
  *    keys instead of a driver loop of 2 x N cross-joins + iterative
  *    `union().distinct()` (`pipeline.py:523-545`) — same candidate set, a
  *    single shuffle, no lineage blow-up;
  *  - clustering via distributed [[ConnectedComponents]] instead of a
  *    driver-side recursive DFS over `collect()`ed pairs.
  */
object EntityResolution {

  case class Config(
      lowerYear: Int = 1995,
      upperYear: Int = 2004,
      venues: Seq[String] = Seq("sigmod", "vldb"),
      /** None = exhaustive cross join; Some(n) = rolling year-window size,
        * clamped to 9 as in `match.py:70-79`. */
      yearBlockSize: Option[Int] = None,
      levMax: Int = 10,
      jaccardMin: Double = 0.6,
      /** Reference-parity id assignment (SURVEY §7.2): the reference uses
        * `monotonically_increasing_id` (`cleaning.py:193`), which is
        * partition-layout dependent — two runs of the same data can assign
        * different ids. The default is the deterministic `xxhash64(value)`;
        * flip this flag only to reproduce the reference's id column
        * byte-for-byte in a same-layout replay.
        */
      parityIds: Boolean = false) {
    def blockSize: Option[Int] = yearBlockSize.map(n => math.min(n, 9))
  }

  /** Stage 1+2: parse one AMiner dump, filter, clean, assign ids
    * (`cleaning.py:175-199`). Output columns: value, title, authors, year,
    * `publication venue`, index, references, id, num_authors.
    */
  def prepareDataset(spark: SparkSession, path: String, cfg: Config = Config()): DataFrame = {
    // A dump smaller than one FS block arrives as a single partition; the
    // cleaning chain and the downstream match join would then run on one
    // core. Spread to the session's parallelism — on a cluster a 100 GB
    // dump already splits by block and this is a near-no-op reshuffle of
    // parsed (pre-clean) rows.
    val parsed = AminerReader
      .load(spark, path)
      .repartition(spark.sparkContext.defaultParallelism)
    val filtered =
      AminerReader.filterByYearAndVenue(parsed, cfg.lowerYear, cfg.upperYear, cfg.venues)
    val id = if (cfg.parityIds) monotonically_increasing_id() else xxhash64(col("value"))
    cleanDf(filtered)
      .withColumn("id", id)
      .withColumn("num_authors", Cleaning.numAuthors(col("authors")))
  }

  /** The cleaning chain of `clean_df` (`cleaning.py:118-134`). */
  def cleanDf(df: DataFrame): DataFrame =
    df.withColumn("title", Cleaning.cleanTitle(col("title")))
      .withColumn("authors", Cleaning.cleanAuthors(col("authors")))
      .withColumn("publication venue", Cleaning.cleanRecord(col("publication venue")))
      .withColumn("index", Cleaning.cleanRecord(col("index")))
      .withColumn("references", Cleaning.cleanRecord(col("references")))
      .withColumn("value", trim(regexp_replace(col("value"), "\n", " ")))

  /** `rename_columns` (`utils.py:24-28`) + the drop of heavy columns before
    * the join (`match.py:88-91`) — one `select`, not a rename loop.
    */
  def renameColumns(df: DataFrame, name: String): DataFrame = {
    val keep = df.columns.filterNot(Seq("value", "index", "references").contains)
    df.select(keep.map { c =>
      val target = if (c == "publication venue") "venue" else c
      col(s"`$c`").as(s"${name}_$target")
    }.toIndexedSeq: _*)
  }

  /** Stage 3+4: candidate generation + matching. Full mode is the exhaustive
    * cross join (`match.py:94`); Catalyst turns the same-venue conjunct of
    * the match predicate into the physical join condition. Blocked mode
    * explodes each record into its `(venue_tag, window_start)` block keys and
    * equi-joins on them — the distributed equivalent of the reference's
    * per-block loop; overlapping windows re-find pairs, deduped by one final
    * `distinct` exactly like the loop's `union().distinct()`.
    */
  def matchPairs(dblp: DataFrame, acm: DataFrame, cfg: Config = Config()): DataFrame = {
    // Tokenize titles once per record before the pair join; the match
    // predicate consumes the arrays (identical Jaccard values).
    val l = renameColumns(dblp, "dblp")
      .withColumn("dblp_title_toks", split(col("dblp_title"), "\\s+"))
    val r = renameColumns(acm, "acm")
      .withColumn("acm_title_toks", split(col("acm_title"), "\\s+"))
    val matched = cfg.blockSize match {
      case None =>
        Similarity.computeSimAndMatch(
          l.crossJoin(r),
          venues = cfg.venues, levMax = cfg.levMax, jaccardMin = cfg.jaccardMin)
      case Some(n) =>
        val lb = withBlockKeys(l, "dblp_venue", "dblp_year", cfg, n)
        val rb = withBlockKeys(r, "acm_venue", "acm_year", cfg, n)
        Similarity
          .computeSimAndMatch(
            lb.join(rb, Seq("block_venue", "block_start")),
            venues = cfg.venues, levMax = cfg.levMax, jaccardMin = cfg.jaccardMin)
          .drop("block_venue", "block_start")
          .distinct()
    }
    matched.select("dblp_id", "acm_id", "dblp_title", "acm_title", "dblp_authors", "acm_authors")
  }

  /** Explode a renamed side into one row per block it belongs to. A record
    * with year y joins window starts s with
    * max(lowerYear, y-n) <= s <= min(y, upperYear-n), per venue tag its
    * venue contains — mirroring the loop bounds at `match.py:102-110`.
    */
  private def withBlockKeys(
      df: DataFrame, venueCol: String, yearCol: String, cfg: Config, n: Int): DataFrame = {
    val tags = array(cfg.venues.map(lit): _*)
    df.withColumn("block_venue", explode(filter(tags, t => col(venueCol).contains(t))))
      .withColumn(
        "block_start",
        explode(
          sequence(
            greatest(lit(cfg.lowerYear), col(yearCol) - n),
            least(col(yearCol), lit(cfg.upperYear - n)))))
  }

  /** Stage 5: cluster matched pairs into entities. Node identity is
    * `(dataset, id)` hashed to a long; the component min-label becomes the
    * cluster id. Returns (id, title, authors, df_name, cluster_id) like the
    * reference's re-parallelized frame (`pipeline.py:554-556`).
    */
  def resolveEntities(pairs: DataFrame): DataFrame = {
    val lNodes = pairs.select(
      xxhash64(lit("dblp"), col("dblp_id")).as("node"),
      col("dblp_id").as("id"), col("dblp_title").as("title"),
      col("dblp_authors").as("authors"), lit("dblp").as("df_name"))
    val rNodes = pairs.select(
      xxhash64(lit("acm"), col("acm_id")).as("node"),
      col("acm_id").as("id"), col("acm_title").as("title"),
      col("acm_authors").as("authors"), lit("acm").as("df_name"))
    val nodes = lNodes.union(rNodes).distinct()

    val edges = pairs.select(
      xxhash64(lit("dblp"), col("dblp_id")).as("src"),
      xxhash64(lit("acm"), col("acm_id")).as("dst"))

    val comps = ConnectedComponents.run(edges)
    nodes
      .join(comps, nodes("node") === comps("node"))
      .select(col("id"), col("title"), col("authors"), col("df_name"), col("comp").as("cluster_id"))
  }

  /** Stage 6: one representative record per (cluster, dataset), raw text
    * attached, pivoted wide (`pipeline.py:558-583` / `create_graph.py:62-87`).
    * Representative = min(id), a deterministic pin of the reference's
    * nondeterministic `first()` (`pipeline.py:559`). Pivot values are passed
    * explicitly to skip the distinct-values job; column names reproduce the
    * golden header `acm_first(value)` / `dblp_first(value)`.
    */
  def emitEntities(clustered: DataFrame, dblp: DataFrame, acm: DataFrame): DataFrame = {
    val reps = clustered.groupBy("cluster_id", "df_name").agg(min("id").as("id"))
    val joined = reps
      .filter(col("df_name") === "dblp")
      .join(dblp.select(col("id"), col("value")), Seq("id"), "left")
      .union(
        reps
          .filter(col("df_name") === "acm")
          .join(acm.select(col("id"), col("value")), Seq("id"), "left"))
    joined
      .groupBy("cluster_id")
      .pivot("df_name", Seq("acm", "dblp"))
      .agg(first("id").as("first(id)"), first("value").as("first(value)"))
      .drop("acm_first(id)", "dblp_first(id)", "cluster_id")
  }
}
