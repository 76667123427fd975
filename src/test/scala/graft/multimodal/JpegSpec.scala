package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** encodeJpeg / decodeJpegInfo round trip, the size closed form the
  * mm_jpeg oracle relies on, marker-walk robustness (spliced COM
  * segment, fill bytes), hostile-input hardening, and the decode()
  * dispatch.
  */
class JpegSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 40): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  test("round trip: dims, channels, progressive flag, segment census, " +
      "size closed form") {
    check(Prop.forAll(Gen.choose(1, 300), Gen.choose(1, 300),
        Gen.oneOf(true, false)) { (w, h, prog) =>
      val bytes = Multimodal.encodeJpeg(w, h, prog)
      val info = Multimodal.decodeJpegInfo(bytes)
      info.contains(Multimodal.JpegInfo(w, h, 3, prog, 5)) &&
        bytes.length == 146 + w * h / 16
    })
  }

  test("marker walk skips a spliced COM segment and fill bytes, and " +
      "counts it") {
    val base = Multimodal.encodeJpeg(80, 60, progressive = false)
    // splice [fill 0xFF][COM len=7 "hello"] right after APP0 (offset 20)
    val com = Array(0xFF, 0xFF, 0xFE, 0x00, 0x07).map(_.toByte) ++
      "hello".getBytes("US-ASCII")
    val spliced = base.take(20) ++ com ++ base.drop(20)
    val info = Multimodal.decodeJpegInfo(spliced)
    assert(info.contains(Multimodal.JpegInfo(80, 60, 3, false, 6)))
  }

  test("hostile inputs return None: truncations, missing SOF, garbage") {
    val bytes = Multimodal.encodeJpeg(100, 50, progressive = true)
    for (cut <- Seq(0, 1, 2, 3, 10, 25, 95, 110))
      assert(Multimodal.decodeJpegInfo(bytes.take(cut)).isEmpty,
        s"prefix of $cut bytes decoded")
    assert(Multimodal.decodeJpegInfo(Array[Byte](1, 2, 3, 4)).isEmpty)
    // SOI + EOI only: walks fine but no SOF
    assert(Multimodal.decodeJpegInfo(
      Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)).isEmpty)
    // SOF claiming more components than its length holds
    val bad = bytes.clone()
    val sofAt = { // locate FFC2
      var i = 2
      while (!((bad(i) & 0xff) == 0xFF && (bad(i + 1) & 0xff) == 0xC2))
        i += 1
      i
    }
    bad(sofAt + 9) = 9 // ncomp 9 > (len-8)/3
    assert(Multimodal.decodeJpegInfo(bad).isEmpty)
  }

  test("decode() dispatches JPEG to an image Meta") {
    val m = Multimodal.decode(Multimodal.encodeJpeg(120, 70, false))
    assert(m.contains(Multimodal.Meta("image", 120, 70, 3, 1, 0)))
  }
}
