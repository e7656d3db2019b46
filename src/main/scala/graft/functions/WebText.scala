package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus ingestion primitives: HTML boilerplate stripping, URL /
  * domain extraction, and encoding-damage ("mojibake") detection — the
  * per-document signals a crawl-to-training-corpus pipeline computes
  * before any dedup or quality gate.
  *
  * Like [[Scrub]], every pattern stays in the common subset of Java regex
  * and RE2 (no lookarounds, no backreferences, non-greedy `.*?` only
  * within one element) so the DuckDB oracle can replay the identical
  * expressions character for character.
  *
  * Scale shape: all of these are per-row codegen'd string expressions —
  * map-only passes with no shuffle. The domain AGGREGATION in the query
  * layer is the only shuffle, and it is a map-side-combined groupBy on a
  * low-cardinality key.
  */
object WebText {

  /** One HTML element (both `<p>` and `</p>`; also matches a full comment
    * because the first `>` in `<!-- ... -->` is the closing one).
    */
  val TagRe = "<[^>]+>"

  /** Inline script block, non-greedy so adjacent blocks stay separate. */
  val ScriptRe = "<script>.*?</script>"

  /** HTML comment, non-greedy. */
  val CommentRe = "<!--.*?-->"

  /** Anchor element; capture group 1 is the visible anchor text. */
  val AnchorRe = "<a [^>]*>([^<]*)</a>"

  /** Absolute http(s) URL, delimited by whitespace. */
  val UrlRe = "https?://[^\\s]+"

  /** Capture group 1 is the host part of an absolute URL. */
  val HostRe = "https?://([^/\\s]+)"

  /** ASCII control characters other than tab/newline/carriage-return. */
  val ControlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"

  /** Any non-ASCII code point. */
  val NonAsciiRe = "[^\\x00-\\x7F]"

  /** Visible text of an HTML fragment: script blocks and comments removed
    * first (their contents are NOT visible text), then every remaining tag
    * replaced by a space, then whitespace normalized. Order matters and is
    * part of the contract the oracle replays.
    */
  def visibleText(html: Column): Column =
    trim(
      regexp_replace(
        regexp_replace(
          regexp_replace(regexp_replace(html, ScriptRe, " "), CommentRe, " "),
          TagRe,
          " "),
        "\\s+",
        " "))

  def tagCount(html: Column): Column = regexp_count(html, lit(TagRe)).cast("long")
  def linkCount(html: Column): Column = regexp_count(html, lit(AnchorRe)).cast("long")
  def scriptCount(html: Column): Column = regexp_count(html, lit(ScriptRe)).cast("long")

  /** Total characters of anchor (link) text — the numerator of link
    * density, the classic boilerplate-page signal.
    */
  def anchorChars(html: Column): Column =
    aggregate(
      transform(regexp_extract_all(html, lit(AnchorRe), lit(1)), a => length(a)),
      lit(0L),
      (acc, x) => acc + x)

  /** Normalized registrable-host of a URL: lowercase, leading `www.`
    * stripped. (True eTLD+1 needs the public-suffix list; the normalized
    * host is the deterministic, dependency-free stand-in.)
    */
  def urlDomain(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, HostRe, 1)), "^www\\.", "")

  /** Canonical URL: the dedup key a crawl frontier uses to recognize one
    * logical resource across surface forms. Deterministic regex chain —
    * every step in the common Java/RE2 subset, ORDER IS THE CONTRACT:
    *   1. drop the `#fragment`;
    *   2. drop tracking query params (`utm_*`, `fbclid`, `gclid`) wherever
    *      they sit in the query string — the param name is anchored to its
    *      preceding `?`/`&` (so `xfbclid=1` or a tracking name inside a
    *      value never matches) and the separator each removal leaves
    *      behind is collapsed (`&&`→`&`, `?&`→`?`, trailing `?`/`&`), so
    *      a mid-query tracking param (`?a=1&utm_x=2&b=3`) lands on the
    *      same key as its tracking-free form (`?a=1&b=3`);
    *   3. lowercase scheme+host only (the authority — paths stay
    *      case-sensitive): done by lowercasing the prefix up to the first
    *      `/` after `//` via a capture-split;
    *   4. drop the scheme, a leading `www.`, and a default `:80`/`:443`;
    *   5. drop one trailing `/`.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noTrack = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(noFrag, "([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*", "$1"),
          "&&+",
          "&"),
        "\\?&+",
        "?"),
      "[?&]+$",
      "")
    // lowercase authority: concat(lower(head-up-to-path), tail)
    val head = regexp_extract(noTrack, "^([^/]*//[^/]*)", 1)
    val tail = regexp_replace(noTrack, "^[^/]*//[^/]*", "")
    val lowered = concat(lower(head), tail)
    val noScheme = regexp_replace(lowered, "^https?://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    val noPort = regexp_replace(noWww, "^([^/]+):(80|443)(/|$)", "$1$3")
    regexp_replace(noPort, "/$", "")
  }

  def replacementCharCount(t: Column): Column =
    (length(t) - length(regexp_replace(t, "�", ""))).cast("long")

  def controlCharCount(t: Column): Column = regexp_count(t, lit(ControlRe)).cast("long")

  def nonAsciiCount(t: Column): Column = regexp_count(t, lit(NonAsciiRe)).cast("long")
}
