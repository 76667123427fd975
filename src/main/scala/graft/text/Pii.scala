package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing stage every web-corpus
  * curation pipeline runs before training (C4 / RefinedWeb style):
  * e-mail addresses, IPv4 addresses and NANP-style phone numbers are
  * counted and replaced with typed placeholders.
  *
  * Everything here is `Column` expressions (`regexp_count` /
  * `regexp_replace`) so the whole stage stays inside whole-stage
  * codegen — a pure per-row map with zero shuffles, which is the only
  * acceptable shape for an operator that touches every byte of a
  * 100 TB corpus. The patterns deliberately use only regex constructs
  * with identical semantics in Java's engine and RE2 (character
  * classes, bounded repetition, `\b`) so the DuckDB oracle replays
  * them verbatim.
  *
  * Redaction order is fixed (email → ipv4 → phone) and placeholders
  * contain no digits or `@`, so passes cannot cascade into each other;
  * [[redact]] is idempotent (property-tested in PiiSpec).
  */
object Pii {

  /** Local-part @ domain with a TLD of 2+ letters. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted quad (octet range not validated — scrubbing favors recall). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-ish ddd-ddd-dddd. Matched AFTER ipv4 so a dotted quad never
    * half-matches as a phone.
    */
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val PhoneTag = "<PHONE>"

  def countEmails(text: Column): Column = regexp_count(text, lit(EmailRe))
  def countIpv4(text: Column): Column = regexp_count(text, lit(Ipv4Re))
  def countPhones(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** Redacted text: all three families replaced by typed placeholders,
    * in the fixed email → ipv4 → phone order.
    */
  def redactText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailTag),
        Ipv4Re, IpTag),
      PhoneRe, PhoneTag)

  /** Adds n_email / n_ipv4 / n_phone count columns. */
  def detect(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_email", countEmails(col(textCol)).cast("long"))
      .withColumn("n_ipv4", countIpv4(col(textCol)).cast("long"))
      .withColumn("n_phone", countPhones(col(textCol)).cast("long"))

  /** Replaces `textCol` with its redacted form. */
  def redact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn(textCol, redactText(col(textCol)))
}
