package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-cleaning operator library.
  *
  * Re-expresses the reference's six Python UDFs
  * (`/root/reference/src/cleaning.py:46-115`) as pure Column expressions, so
  * every one of them runs inside Tungsten whole-stage codegen — no UDF
  * boundary, no serialization, vectorized parquet input. Semantics are
  * token-for-token identical to the Python originals (verified by golden
  * tests in `CleaningSpec`).
  */
object Cleaning {

  /** NLTK English stopword list (179 words), vendored verbatim: the
    * reference loads it via `nltk.corpus.stopwords.words("english")`
    * (`cleaning.py:28-29`). Spark ML's StopWordsRemover default list differs,
    * so we pin the exact list for parity.
    */
  val StopWords: Seq[String] = Seq(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom", "this",
    "that", "that'll", "these", "those", "am", "is", "are", "was", "were",
    "be", "been", "being", "have", "has", "had", "having", "do", "does",
    "did", "doing", "a", "an", "the", "and", "but", "if", "or", "because",
    "as", "until", "while", "of", "at", "by", "for", "with", "about",
    "against", "between", "into", "through", "during", "before", "after",
    "above", "below", "to", "from", "up", "down", "in", "out", "on", "off",
    "over", "under", "again", "further", "then", "once", "here", "there",
    "when", "where", "why", "how", "all", "any", "both", "each", "few",
    "more", "most", "other", "some", "such", "no", "nor", "not", "only",
    "own", "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll", "m",
    "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn", "couldn't",
    "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't", "hasn",
    "hasn't", "haven", "haven't", "isn", "isn't", "ma", "mightn",
    "mightn't", "mustn", "mustn't", "needn", "needn't", "shan", "shan't",
    "shouldn", "shouldn't", "wasn", "wasn't", "weren", "weren't", "won",
    "won't", "wouldn", "wouldn't")

  /** Escape a literal character for use inside a Java-regex character class. */
  private def escapeForClass(chars: String): String =
    chars.flatMap(ch => if (ch.isLetterOrDigit) ch.toString else "\\" + ch)

  /** Python `string.punctuation`. */
  val PythonPunctuation = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"

  /** Quote characters stripped by `remove_stopwords` (`cleaning.py:88`). */
  val Quotes = "\"“'’″`“”"

  /** The `clean_record` replacement set (`cleaning.py:70`): everything in
    * `!"$%&\'()’:;+.<=>?″`“”/-@[\\]#{|}` — commas intentionally preserved.
    */
  val StopSymbols = "!\"$%&\\'()’:;+.<=>?″`“”/-@[\\]#{|}"

  private val stopSymbolClass = "[" + escapeForClass(StopSymbols) + "]"
  private val stripClass = escapeForClass(PythonPunctuation + Quotes + " ")
  private val stripEndsRe = s"^[$stripClass]+|[$stripClass]+$$"

  /** U1 `sort_authors` (`cleaning.py:46-56`): per comma-separated author
    * name, split on single spaces, drop empty tokens, trim and sort tokens
    * alphabetically, rejoin with a space; rejoin authors with ", ".
    */
  def sortAuthors(c: Column): Column =
    array_join(
      transform(
        split(c, ","),
        name =>
          array_join(
            array_sort(transform(filter(split(name, " "), t => t =!= lit("")), t => trim(t))),
            " ")),
      ", ")

  /** U2 `remove_nums` (`cleaning.py:59-63`): delete all decimal digits. */
  def removeNums(c: Column): Column = regexp_replace(c, "\\d", "")

  /** U3 `clean_record` (`cleaning.py:66-73`): replace every stop symbol with
    * a space, collapse runs of >=2 whitespace to one space, trim.
    */
  def cleanRecord(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, stopSymbolClass, " "), "\\s{2,}", " "))

  /** U4 `remove_accents` (`cleaning.py:76-83`): NFKD + drop combining marks.
    * Native Catalyst expression — see [[FoldAccents]].
    */
  def removeAccents(c: Column): Column = FoldAccents(c)

  /** U5 `remove_stopwords` (`cleaning.py:86-98`): split on space or em-dash,
    * drop NLTK stopwords (exact match, *before* punctuation stripping), then
    * strip punctuation/quote chars from each end of every kept token, join
    * with spaces and collapse multi-spaces. Note: the reference does not trim
    * the final string — neither do we.
    */
  def removeStopwords(c: Column): Column = {
    val stopArr = typedLit(StopWords)
    val kept = filter(split(c, " |—"), w => !array_contains(stopArr, w))
    val stripped =
      transform(kept, w => regexp_replace(regexp_replace(w, "\"", ""), stripEndsRe, ""))
    regexp_replace(array_join(stripped, " "), "\\s{2,}", " ")
  }

  /** U6 `get_num_authors` (`cleaning.py:111-115`): null -> 0; otherwise the
    * number of comma-separated segments (empty string -> 1, matching Python's
    * `len("".split(","))`).
    */
  def numAuthors(c: Column): Column =
    when(c.isNull, lit(0)).otherwise(size(split(c, ",")))

  /** The full author-cleaning chain (`cleaning.py:122-125`). */
  def cleanAuthors(c: Column): Column =
    sortAuthors(removeAccents(cleanRecord(removeNums(c))))

  /** The full title-cleaning chain (`cleaning.py:121`). */
  def cleanTitle(c: Column): Column = removeStopwords(removeAccents(c))
}
