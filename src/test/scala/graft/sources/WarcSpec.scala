package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import java.nio.charset.StandardCharsets

/** Warc encode/parse round trip — including payloads that contain the
  * record separator and version line (Content-Length framing, not
  * separator scanning), case-insensitive headers, extra headers, and
  * loud failure on malformed archives.
  */
class WarcSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 40): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private val genRec: Gen[Warc.Rec] = for {
    id <- Gen.choose(0, 999)
    // hostile payloads: embedded CRLFs, a fake record header, binary
    body <- Gen.oneOf(
      Gen.alphaNumStr,
      Gen.const("<html>WARC/1.0\r\nContent-Length: 3\r\n\r\nxyz</html>"),
      Gen.const("\r\n\r\n\r\n"),
      Gen.listOf(Gen.choose(0, 255)).map(_.map(_.toChar).mkString))
  } yield Warc.Rec(s"https://example.org/doc/$id",
    "2024-01-01T00:00:00Z", body.toString.getBytes(StandardCharsets.UTF_8))

  test("round trip: any record list, incl. separator-looking payloads") {
    check(Prop.forAll(Gen.listOf(genRec)) { recs =>
      val back = Warc.parse(Warc.encode(recs))
      back.size == recs.size && back.zip(recs).forall { case (g, w) =>
        g.url == w.url && g.dateIso == w.dateIso &&
          java.util.Arrays.equals(g.payload, w.payload)
      }
    })
  }

  test("header names are case-insensitive; unknown headers skipped") {
    val raw = ("WARC/1.0\r\nwarc-target-uri: u1\r\nWARC-RECORD-ID: x\r\n" +
      "CONTENT-LENGTH: 5\r\nWarc-Date: 2024-02-02T03:04:05Z\r\n\r\n" +
      "hello\r\n\r\n").getBytes(StandardCharsets.UTF_8)
    val recs = Warc.parse(raw)
    assert(recs.size == 1)
    assert(recs.head.url == "u1" &&
      recs.head.dateIso == "2024-02-02T03:04:05Z" &&
      new String(recs.head.payload, StandardCharsets.UTF_8) == "hello")
  }

  test("malformed archives fail loudly with the offset") {
    def bad(s: String) = intercept[IllegalArgumentException](
      Warc.parse(s.getBytes(StandardCharsets.UTF_8)))
    assert(bad("HTTP/1.1 200\r\n\r\n").getMessage.contains("version"))
    assert(bad("WARC/1.0\r\nWARC-Date: x\r\n\r\n").getMessage
      .contains("Content-Length"))
    assert(bad("WARC/1.0\r\nContent-Length: 99\r\n\r\nshort")
      .getMessage.contains("overruns"))
    assert(bad("WARC/1.0\r\nno-terminator").getMessage
      .contains("unterminated"))
  }

  test("trailing separators and empty archives parse to empty") {
    assert(Warc.parse(Array.emptyByteArray).isEmpty)
    assert(Warc.parse("\r\n\r\n".getBytes(StandardCharsets.UTF_8)).isEmpty)
  }
}
