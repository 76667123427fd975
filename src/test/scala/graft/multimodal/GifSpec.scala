package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** GIF/LZW codec laws: payload round trips at sizes that cross every
  * codec regime (width growth, KwKwK, the 4096-entry CLEAR), an
  * INDEPENDENT decoder (JDK ImageIO) reads our encoder's output
  * pixel-identically, extension blocks are skipped per spec, and
  * malformed inputs fail loudly instead of producing wild pixels.
  */
class GifSpec extends AnyFunSuite {

  private def payload(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(p => ((p % w) + (p / w)) % 251)

  test("GIF round trip reproduces the payload at every size regime") {
    for ((w, h) <- Seq((1, 1), (3, 2), (16, 16), (251, 5), (64, 48),
        (80, 60))) {
      val got = Multimodal.decodeGifIndices(Multimodal.encodeGif(w, h))
      assert(got.isDefined, s"${w}x$h failed to decode")
      val (dw, dh, idx) = got.get
      assert(dw == w && dh == h)
      assert(idx.toSeq == payload(w, h).toSeq, s"${w}x$h pixels differ")
    }
  }

  test("raw LZW round-trips high-entropy data through the CLEAR path") {
    val rnd = new scala.util.Random(7)
    // random symbols defeat the dictionary: ~1 emission per 1-2 input
    // symbols, so 30k symbols exhaust the 4096-entry space and force
    // at least one mid-stream CLEAR + full width ladder to 12 bits
    val data = Array.fill(30000)(rnd.nextInt(256))
    val enc = Multimodal.lzwEncode(data, 8)
    val dec = Multimodal.lzwDecode(enc, 8, data.length)
    assert(dec.isDefined && dec.get.toSeq == data.toSeq)
  }

  test("raw LZW round-trips low-entropy data (deep dictionary chains)") {
    val data = Array.tabulate(40000)(i => i % 7)
    val enc = Multimodal.lzwEncode(data, 8)
    val dec = Multimodal.lzwDecode(enc, 8, data.length)
    assert(dec.isDefined && dec.get.toSeq == data.toSeq)
    assert(enc.length < data.length / 4, "periodic data must compress")
  }

  test("JDK ImageIO — an independent decoder — reads our encoder's " +
      "output pixel-identically through the palette") {
    val (w, h) = (37, 23)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.encodeGif(w, h)))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (x + y) % 251
      val expect = 0xFF000000 | (i << 16) | (((2 * i) % 256) << 8) |
        ((3 * i) % 256)
      assert(img.getRGB(x, y) == expect, s"pixel ($x,$y)")
    }
  }

  test("extension blocks are skipped per spec") {
    val base = Multimodal.encodeGif(9, 7)
    // splice a Graphics Control Extension right before the image
    // descriptor (offset 13 + 768 = after header/LSD/GCT)
    val gce = Array(0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00)
      .map(_.toByte)
    val spliced = base.take(781) ++ gce ++ base.drop(781)
    val got = Multimodal.decodeGifIndices(spliced)
    assert(got.isDefined && got.get._3.toSeq == payload(9, 7).toSeq)
  }

  test("malformed inputs fail loudly, never wild pixels") {
    val base = Multimodal.encodeGif(16, 16)
    assert(Multimodal.decodeGif("NOTAGIF".getBytes ++ base.drop(7)).isEmpty)
    assert(Multimodal.decodeGif(base.take(base.length / 2)).isEmpty)
    // a flipped LZW byte either fails or decodes to DIFFERENT pixels —
    // it must never silently reproduce the original payload
    val corrupt = base.clone()
    corrupt(800) = (corrupt(800) ^ 0x55).toByte
    val got = Multimodal.decodeGifIndices(corrupt)
    assert(got.isEmpty || got.get._3.toSeq != payload(16, 16).toSeq)
  }
}
