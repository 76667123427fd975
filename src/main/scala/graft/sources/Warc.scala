package graft.sources

import java.nio.charset.StandardCharsets

/** Minimal WARC/1.0 (ISO 28500) record writer/reader — the container
  * Common Crawl ships web pages in (cf. the WARC 1.0 spec and the
  * crawler ecosystem's warcio readers). Records are framed by
  * `Content-Length`, NEVER by scanning for a separator: a payload that
  * itself contains `"WARC/1.0\r\n"` (HTML quoting a WARC example, a
  * nested archive) parses correctly — WarcSpec plants exactly that.
  *
  * Strictness: [[parse]] throws on malformed input (bad version line,
  * missing Content-Length, truncated payload) with the byte offset —
  * in a deterministic pipeline a corrupt archive should fail the task
  * loudly and reproducibly, not silently skip records.
  */
object Warc {

  final case class Rec(url: String, dateIso: String, payload: Array[Byte])

  private val Crlf = "\r\n"

  /** One response record: version line, headers, blank line, payload,
    * two CRLFs (the spec's record terminator). */
  def encodeRecord(r: Rec): Array[Byte] = {
    val head = new StringBuilder()
      .append("WARC/1.0").append(Crlf)
      .append("WARC-Type: response").append(Crlf)
      .append("WARC-Target-URI: ").append(r.url).append(Crlf)
      .append("WARC-Date: ").append(r.dateIso).append(Crlf)
      .append("Content-Type: text/html").append(Crlf)
      .append("Content-Length: ").append(r.payload.length).append(Crlf)
      .append(Crlf)
      .toString.getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](head.length + r.payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(r.payload, 0, out, head.length, r.payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Concatenated records — one WARC "file". */
  def encode(recs: Seq[Rec]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    recs.foreach(r => bos.write(encodeRecord(r)))
    bos.toByteArray
  }

  /** Parse a concatenated-record stream back. Header names are
    * case-insensitive per the spec; unknown headers are skipped (a
    * real crawl record carries WARC-Record-ID, block digests, etc.).
    */
  def parse(bytes: Array[Byte]): Seq[Rec] = {
    val out = scala.collection.mutable.ArrayBuffer[Rec]()
    var off = 0
    def fail(msg: String) =
      throw new IllegalArgumentException(s"WARC parse at byte $off: $msg")
    while (off < bytes.length) {
      while (off < bytes.length &&
        (bytes(off) == '\r' || bytes(off) == '\n')) off += 1
      if (off >= bytes.length) return out.toSeq
      val hdrEnd = indexOfDoubleCrlf(bytes, off)
      if (hdrEnd < 0) fail("unterminated header block")
      val block = new String(bytes, off, hdrEnd - off, StandardCharsets.UTF_8)
      val lines = block.split("\r\n", -1)
      if (!lines.headOption.exists(_.startsWith("WARC/")))
        fail(s"bad version line: ${lines.headOption.getOrElse("")}")
      val headers = lines.tail.flatMap { l =>
        val i = l.indexOf(':')
        if (i < 0) None
        else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
      }.toMap
      val len = headers.get("content-length") match {
        case Some(v) => try v.toInt catch {
          case _: NumberFormatException => fail(s"bad Content-Length: $v")
        }
        case None => fail("missing Content-Length")
      }
      val payloadAt = hdrEnd + 4
      if (len < 0 || payloadAt + len > bytes.length)
        fail(s"payload of $len bytes overruns the archive")
      out += Rec(headers.getOrElse("warc-target-uri", ""),
        headers.getOrElse("warc-date", ""),
        java.util.Arrays.copyOfRange(bytes, payloadAt, payloadAt + len))
      off = payloadAt + len
    }
    out.toSeq
  }

  private def indexOfDoubleCrlf(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
      i += 1
    }
    -1
  }
}
