package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Golden tests: expected values captured from a Python-stdlib re-execution
  * of the reference UDFs (`/root/reference/src/cleaning.py:46-115`) over
  * fixture strings chosen to hit accents, ligatures, NFKD compatibility
  * chars, em-dash splits, quote stripping, stopword-before-strip ordering,
  * and empty-segment behavior.
  */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def run1(fn: Column => Column, input: String): String = {
    val out = Seq(input).toDF("s").select(fn(col("s")).as("r")).collect()(0)
    if (out.isNullAt(0)) null else out.getString(0)
  }

  private def check(fn: Column => Column, cases: Seq[(String, String)]): Unit =
    cases.foreach { case (in, want) =>
      assert(run1(fn, in) == want, s"input=[$in]")
    }

  test("sort_authors golden") {
    check(
      Cleaning.sortAuthors,
      Seq(
        "jan jannink" -> "jan jannink",
        "ralph kimball, kevin strehlo" -> "kimball ralph, kevin strehlo",
        "  josé pérez-garcía, françois müller123 , li  wei " ->
          "josé pérez-garcía, françois müller123, li wei",
        "a,b,,c" -> "a, b, , c",
        "" -> "",
        "   " -> "",
        "o'neil, van der berg jr." -> "o'neil, berg der jr. van",
        "why the “decision support” systems fail — and how to fix it!" ->
          "and fail fix how it! support” systems the to why — “decision"))
  }

  test("remove_nums golden") {
    check(
      Cleaning.removeNums,
      Seq(
        "the quick brown fox's 42 jumps; over {lazy} dogs?" ->
          "the quick brown fox's  jumps; over {lazy} dogs?",
        "  josé pérez-garcía, françois müller123 , li  wei " ->
          "  josé pérez-garcía, françois müller , li  wei ",
        "" -> ""))
  }

  test("clean_record golden") {
    check(
      Cleaning.cleanRecord,
      Seq(
        "implementing deletion in b+-trees." -> "implementing deletion in b trees",
        "why the “decision support” systems fail — and how to fix it!" ->
          "why the decision support systems fail — and how to fix it",
        "the quick brown fox's 42 jumps; over {lazy} dogs?" ->
          "the quick brown fox s 42 jumps over lazy dogs",
        "o'neil, van der berg jr." -> "o neil, van der berg jr",
        "he said \"hello\" to don and won't stop" -> "he said hello to don and won t stop",
        "data—base systems—now" -> "data—base systems—now",
        "a,b,,c" -> "a,b,,c",
        "   " -> "",
        "ẞ ﬁve naïve café²" -> "ẞ ﬁve naïve café²"))
  }

  test("remove_accents golden") {
    check(
      Cleaning.removeAccents,
      Seq(
        "  josé pérez-garcía, françois müller123 , li  wei " ->
          "  jose perez-garcia, francois muller123 , li  wei ",
        "ẞ ﬁve naïve café²" -> "ẞ five naive cafe2",
        "jan jannink" -> "jan jannink",
        "" -> ""))
  }

  test("remove_stopwords golden") {
    check(
      Cleaning.removeStopwords,
      Seq(
        "ralph kimball, kevin strehlo" -> "ralph kimball kevin strehlo",
        "implementing deletion in b+-trees." -> "implementing deletion b+-trees",
        "why the “decision support” systems fail — and how to fix it!" ->
          "decision support systems fail fix it",
        "the quick brown fox's 42 jumps; over {lazy} dogs?" ->
          "quick brown fox's 42 jumps lazy dogs",
        "he said \"hello\" to don and won't stop" -> "said hello stop",
        "data—base systems—now" -> "data base systems",
        "  josé pérez-garcía, françois müller123 , li  wei " ->
          " josé pérez-garcía françois müller123 li wei ",
        "   " -> " ",
        "" -> ""))
  }

  test("num_authors: null -> 0, empty -> 1, commas counted") {
    val df = Seq(Some("a,b,,c"), Some(""), None, Some("x")).toDF("s")
    val got = df.select(Cleaning.numAuthors(col("s")).as("n")).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(4, 1, 0, 1))
  }

  test("null propagates through string cleaners") {
    val fns: Seq[Column => Column] = Seq(
      Cleaning.sortAuthors, Cleaning.removeNums, Cleaning.cleanRecord,
      Cleaning.removeAccents, Cleaning.removeStopwords)
    fns.foreach(fn => assert(run1(fn, null) == null))
  }

  test("cleaning is idempotent on cleaned output") {
    val inputs = Seq(
      "implementing deletion in b+-trees.",
      "why the “decision support” systems fail — and how to fix it!",
      "ẞ ﬁve naïve café²")
    inputs.foreach { in =>
      val once = run1(Cleaning.cleanRecord, in)
      assert(run1(Cleaning.cleanRecord, once) == once)
      val acc = run1(Cleaning.removeAccents, in)
      assert(run1(Cleaning.removeAccents, acc) == acc)
    }
  }
}
