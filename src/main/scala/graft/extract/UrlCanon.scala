package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crawl-side canonical-URL normalization — the dedup tier that runs
  * BEFORE content hashing in a web pipeline: the same page fetched as
  * `HTTPS://HOST:443/x?utm_source=a#frag` and `https://host/x` must
  * collapse to one crawl record. Mirrors the reference's input-side
  * normalization stance (its validators canonicalize names/ids before
  * comparing, `/root/reference/src/core/validators/`), applied to the
  * web-scale input key.
  *
  * Rules (deterministic, order-independent):
  *  1. strip the fragment;
  *  2. lowercase scheme and host;
  *  3. drop the default port (`:443` for https, `:80` for http);
  *  4. empty path → `/`;
  *  5. drop `utm_*` tracking params and empty params, sort the rest
  *     byte-wise, re-join.
  *
  * Everything is a composition of codegen'd string/array expressions —
  * no UDF, fully whole-stage-codegen, replayable verbatim in the DuckDB
  * oracle (same regexes, `list_filter`/`list_sort` for the lambda ops).
  */
object UrlCanon {

  def canonical(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val host = when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .otherwise(hostport)
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val path0 = regexp_extract(pathq, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val qraw = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = filter(split(qraw, "&", -1),
      p => p =!= "" && !p.startsWith("utm_"))
    val qs = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }
}
