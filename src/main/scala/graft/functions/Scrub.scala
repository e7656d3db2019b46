package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for a training corpus: mask emails, IPv4 addresses, and
  * phone-shaped numbers with typed placeholder tokens, and count what was
  * masked (the audit trail a redaction pass has to emit).
  *
  * The patterns are deliberately in the common subset of Java regex and
  * RE2 — no lookarounds, no backreferences — so the DuckDB oracle applies
  * the exact same expressions. Masking order is email → IPv4 → phone:
  * emails are masked first so the later numeric patterns can never match
  * inside an address, and counts are taken on the ORIGINAL text so they
  * are independent of replacement side effects.
  *
  * Scale shape: pure per-row codegen'd string expressions — a map-only
  * pass with no shuffle, which is exactly what a 100 TB redaction sweep
  * must be.
  */
object Scrub {
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  def maskPii(c: Column): Column =
    regexp_replace(
      regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"),
      PhoneRe,
      "<PHONE>")

  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe)).cast("long")
  def ipCount(c: Column): Column = regexp_count(c, lit(Ipv4Re)).cast("long")
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhoneRe)).cast("long")
}
