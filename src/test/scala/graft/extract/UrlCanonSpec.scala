package graft.extract

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Canonical-URL rules case table + idempotence (canonicalizing a
  * canonical URL is a no-op — the property that makes the dedup key
  * stable under re-crawls of already-normalized URLs).
  */
class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlCanon.canonical(col("u")).as("c"))
      .as[String].collect().toSeq

  test("case, default port, fragment, utm params, param order") {
    assert(canon(
      "HTTPS://EXAMPLE.ORG:443/a/B?z=1&a=2&utm_source=x#frag",
      "https://example.org/a/B?a=2&z=1",
      "http://Example.org:80/x",
      "http://example.org:8080/x", // non-default port survives
      "https://example.org", // empty path → /
      "https://example.org/p?utm_campaign=only#f"
    ) == Seq(
      "https://example.org/a/B?a=2&z=1",
      "https://example.org/a/B?a=2&z=1",
      "http://example.org/x",
      "http://example.org:8080/x",
      "https://example.org/",
      "https://example.org/p"))
  }

  test("https :443 stripped but http :443 kept (and vice versa)") {
    assert(canon("http://h:443/x", "https://h:80/x") ==
      Seq("http://h:443/x", "https://h:80/x"))
  }

  test("path case and non-utm query values preserved byte-wise") {
    assert(canon("https://h/Path/File.HTML?Key=Val%20ue") ==
      Seq("https://h/Path/File.HTML?Key=Val%20ue"))
  }

  test("idempotence: canonical(canonical(u)) == canonical(u)") {
    val messy = (0 until 50).map { i =>
      val port = if (i % 3 == 0) ":443" else ""
      val frag = if (i % 2 == 0) s"#sec$i" else ""
      val utm = if (i % 4 == 0) s"&utm_id=$i" else ""
      s"HTTPS://Host$i.Example.ORG$port/p$i?b=$i&a=${i * 2}$utm$frag"
    }
    val once = messy.toDF("u")
      .select(UrlCanon.canonical(col("u")).as("c"))
    val twice = once.select(UrlCanon.canonical(col("c")).as("c2"),
        col("c"))
      .filter(col("c2") =!= col("c"))
    assert(twice.count() == 0)
  }
}
