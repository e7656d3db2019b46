package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reader for the AMiner v8 flat-text citation format: one multi-line record
  * per blank-line-separated block, fields tagged by line prefixes
  * (`#*` title, `#@` authors, `#t` year, `#c` venue, `#index` id, `#%`
  * reference — repeatable).
  *
  * Re-expresses `/root/reference/src/cleaning.py:101-160`. The custom record
  * separator maps 1:1 onto Spark's text source `lineSep` option, so the scan
  * is a plain distributed text read — splittable and parallel across
  * executors; no driver-side parsing.
  */
object AminerReader {

  val RecordSeparator = "\n\n"

  /** Extract one tagged field from the lowercased raw record. `prefix` is a
    * regex (`#\*` must escape the star). The references field (`\n#%`) is
    * multi-valued: split once on the first tag, then rewrite the remaining
    * tags to ", " before taking the line (`cleaning.py:101-108`).
    */
  def extractField(raw: Column, prefix: String): Column = {
    // `get` (not `getItem`) tolerates a missing field under ANSI mode
    // (Spark 4 default): absent tag -> 1-element split -> null, like the
    // PySpark 3.5 non-ANSI behavior the reference relies on.
    val items =
      if (prefix == "\n#%")
        regexp_replace(get(split(raw, prefix, 2), lit(1)), "\n#%", ", ")
      else
        get(split(raw, prefix), lit(1))
    trim(get(split(items, "\n"), lit(0)))
  }

  /** Parse a frame holding raw AMiner records in `value` into the tagged
    * columns `title, authors, year, publication venue, index, references`
    * (`cleaning.py:137-160`); other columns pass through. `value` keeps the
    * original record text.
    */
  def parseRecords(records: DataFrame): DataFrame = {
    val withRaw = records.withColumn("raw", lower(trim(col("value"))))
    val raw = col("raw")
    withRaw
      .withColumn("title", trim(extractField(raw, "#\\*")))
      .withColumn("authors", trim(extractField(raw, "\n#@")))
      // try_cast: non-numeric year -> null (ANSI-safe), as PySpark's cast did
      .withColumn("year", trim(extractField(raw, "\n#t")).try_cast("int"))
      .withColumn("publication venue", trim(extractField(raw, "\n#c")))
      .withColumn("index", trim(extractField(raw, "\n#index")))
      .withColumn("references", trim(extractField(raw, "\n#%")))
      .drop("raw")
  }

  /** Parse one AMiner dump file: blank-line-separated record scan +
    * [[parseRecords]].
    */
  def load(spark: SparkSession, path: String, lineSep: String = RecordSeparator): DataFrame =
    parseRecords(spark.read.option("lineSep", lineSep).text(path))

  /** Year/venue predicate (`cleaning.py:163-172`). */
  def filterByYearAndVenue(
      df: DataFrame,
      lowerYear: Int,
      upperYear: Int,
      venues: Seq[String]): DataFrame = {
    val yearRange = col("year") >= lowerYear && col("year") <= upperYear
    val venueRange = venues
      .map(v => col("publication venue").contains(v.toLowerCase))
      .reduce(_ || _)
    df.filter(yearRange && venueRange)
  }
}
