package graft.extract

import java.nio.charset.{CharacterCodingException, StandardCharsets}
import java.nio.ByteBuffer

/** Deterministic HTML → text extraction (north-rule per-row invariant:
  * byte-identical extracted text per url).
  *
  * The spec is deliberately exact and total:
  *  1. decode bytes as strict UTF-8; on malformed input fall back to
  *     ISO-8859-1 (mirrors the reference's utf-8 → latin-1 decode ladder,
  *     `src/formats/rdf/rdf_converter.py:650-660`);
  *  2. drop `<script>`/`<style>` elements wholesale;
  *  3. strip all remaining tags;
  *  4. decode the five XML entities + numeric character references;
  *  5. collapse runs of ASCII whitespace to single spaces and trim.
  *
  * Block-level tags contribute a space (so `</h1><p>` does not glue
  * words); inline tags contribute nothing. Every step is a pure function
  * of the input bytes — no locale, no platform default charset — so the
  * same url yields the same bytes on any executor, any cluster size.
  */
object HtmlText {

  def decodeBytes(html: Array[Byte]): String = {
    val dec = StandardCharsets.UTF_8.newDecoder()
    try dec.decode(ByteBuffer.wrap(html)).toString
    catch {
      case _: CharacterCodingException =>
        new String(html, StandardCharsets.ISO_8859_1)
    }
  }

  private val InlineTags = Set(
    "a", "b", "i", "em", "strong", "span", "code", "sub", "sup", "u",
    "small", "abbr", "cite", "q", "mark", "time", "wbr")

  /** Strip tags/scripts/styles/comments; entity-decode; collapse spaces. */
  def extract(html: String): String = {
    val sb = new java.lang.StringBuilder(html.length)
    var i = 0
    val n = html.length
    var skipUntil: String = null // closing tag we are skipping to (script/style)
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val end = html.indexOf('>', i + 1)
          if (end < 0) { i = n }
          else {
            val inner = html.substring(i + 1, end)
            val isClose = inner.startsWith("/")
            val nameSrc = if (isClose) inner.substring(1) else inner
            val nameEnd0 = nameSrc.indexWhere(ch => ch.isWhitespace || ch == '/' || ch == '>')
            val nameEnd = if (nameEnd0 < 0) nameSrc.length else nameEnd0
            val name = nameSrc.substring(0, nameEnd).toLowerCase
            if (skipUntil != null) {
              if (isClose && name == skipUntil) skipUntil = null
            } else if (!isClose && (name == "script" || name == "style") &&
                       !inner.endsWith("/")) {
              skipUntil = name
            } else if (!InlineTags.contains(name)) {
              sb.append(' ') // block boundary
            }
            i = end + 1
          }
        }
      } else if (skipUntil != null) {
        i += 1
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        if (semi > 0 && semi - i <= 10) {
          val ent = html.substring(i + 1, semi)
          val decoded = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try new String(Character.toChars(Integer.parseInt(ent.substring(2), 16)))
              catch { case _: Exception => null }
            case _ if ent.startsWith("#") =>
              try new String(Character.toChars(Integer.parseInt(ent.substring(1))))
              catch { case _: Exception => null }
            case _ => null
          }
          if (decoded != null) { sb.append(decoded); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else {
        sb.append(c)
        i += 1
      }
    }
    collapseWhitespace(sb.toString)
  }

  def collapseWhitespace(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var lastSpace = true // leading spaces dropped
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') {
        if (!lastSpace) { sb.append(' '); lastSpace = true }
      } else { sb.append(c); lastSpace = false }
      i += 1
    }
    // trim single trailing space
    if (sb.length > 0 && sb.charAt(sb.length - 1) == ' ') sb.setLength(sb.length - 1)
    sb.toString
  }

  /** bytes → text in one step (the per-row invariant function). */
  def extractFromBytes(html: Array[Byte]): String = extract(decodeBytes(html))

  /** Main-content extraction (boilerplate removal): the first `<p>`
    * element's inner text. This is the per-url byte-identical invariant
    * function of the pipeline — Common-Crawl-style pages carry the article
    * body in the content block, and `documents.text` must round-trip
    * exactly (title/nav/footer are boilerplate). Falls back to full-page
    * [[extract]] when no `<p>` exists.
    */
  def extractMain(html: String): String = {
    val start = html.indexOf("<p>")
    val end = if (start < 0) -1 else html.indexOf("</p>", start + 3)
    if (start < 0 || end < 0) extract(html)
    else extract(html.substring(start + 3, end))
  }

  def extractMainFromBytes(html: Array[Byte]): String = extractMain(decodeBytes(html))

  /** Minimal escaping for synthesizing html from text (PageGen inverse). */
  def escape(text: String): String =
    text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
