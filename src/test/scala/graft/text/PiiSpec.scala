package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII detection/redaction: planted positives are counted and replaced,
  * near-misses are left alone, and redaction is idempotent.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq((1L, text)).toDF("doc_id", "text")

  test("counts and redacts each family") {
    val df = Pii.redact(Pii.detect(one(
      "mail a.b+c@sub.example.org or 192.168.0.1 or 555-123-4567 end")))
    val r = df.select("n_email", "n_ipv4", "n_phone", "text").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 1L, 1L)))
    assert(r.getString(3) === "mail <EMAIL> or <IP> or <PHONE> end")
  }

  test("near-misses do not match") {
    val r = Pii.detect(one("bad@@nope 999.9 12-34 1.2.3 a@b.c x@y.org-"))
      .select("n_email", "n_ipv4", "n_phone").head()
    // a@b.c fails the 2+-letter TLD; 1.2.3 has three octets; x@y.org-
    // matches (trailing '-' is outside the match) — recall favored
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 0L, 0L)))
  }

  test("redaction is idempotent (placeholders cannot re-match)") {
    val texts = Seq(
      "u@example.com 10.0.0.1 555-000-1111",
      "a@b.co next to 1.2.3.4.5 and 555-123-45678",
      "plain words only")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val once = Pii.redact(df).select("doc_id", "text")
    val twice = Pii.redact(once).select("doc_id", "text")
    assert(once.except(twice).count() === 0 && twice.except(once).count() === 0)
  }

  test("multiple occurrences are all counted and replaced") {
    val r = Pii.redact(Pii.detect(one("a@x.io b@y.io 1.1.1.1 2.2.2.2")))
      .select("n_email", "n_ipv4", "text").head()
    assert((r.getLong(0), r.getLong(1)) === ((2L, 2L)))
    assert(r.getString(2) === "<EMAIL> <EMAIL> <IP> <IP>")
  }
}
