package graft.sources

import graft.SparkSpec
import java.nio.charset.StandardCharsets

/** TFRecord tier laws: the CRC32C check value + masking pinned against
  * the published constants, golden proto bytes for a tiny Example
  * (hand-assembled from the wire spec, independent of the encoder),
  * hostile-content round trips, and loud FAILFAST on corruption and
  * truncation.
  */
class TfRecordSpec extends SparkSpec {

  test("masked CRC32C matches the published check value for " +
      "'123456789' (crc32c = 0xE3069283) under the TFRecord mask") {
    val c = 0xE3069283
    val expected = ((c >>> 15) | (c << 17)) + 0xa282ead8
    assert(TfRecord.maskedCrc(
      "123456789".getBytes(StandardCharsets.US_ASCII)) == expected)
  }

  test("golden Example bytes: doc_id=1, lang=a, source=b, text=c") {
    def bf(v: Byte) = Array[Byte](0x0a, 3, 0x0a, 1, v) // Feature{bytes_list}
    val i64 = Array[Byte](0x1a, 3, 0x0a, 1, 1)         // Feature{int64_list}
    def entry(key: String, f: Array[Byte]): Array[Byte] = {
      val k = key.getBytes(StandardCharsets.US_ASCII)
      Array[Byte](0x0a, k.length.toByte) ++ k ++
        Array[Byte](0x12, f.length.toByte) ++ f
    }
    val entries = Seq(entry("doc_id", i64), entry("lang", bf('a')),
      entry("source", bf('b')), entry("text", bf('c')))
    val features = entries.flatMap(e =>
      Array[Byte](0x0a, e.length.toByte) ++ e).toArray
    val golden = Array[Byte](0x0a, features.length.toByte) ++ features
    assert(TfRecord.encodeExample(1L, "a", "b", "c").toSeq ==
      golden.toSeq)
    assert(TfRecord.decodeExample(golden) == ((1L, "a", "b", "c")))
  }

  private val hostile = Seq(
    (1L, "en", "s1", "plain words"),
    (2L, "en", "s1", "line\nbreak\r\nand\ttab"),
    (3L, "zh", "s2", "中文混排 with ascii"),
    (4L, "und", "s2", "emoji 😀 and  control"),
    (5L, "en", "s3", ""),
    (Long.MaxValue, "en", "s3", "big id exercises 10-byte varints"))

  test("Example round-trips hostile content, incl. Long.MaxValue ids") {
    for ((id, l, s, t) <- hostile)
      assert(TfRecord.decodeExample(
        TfRecord.encodeExample(id, l, s, t)) == ((id, l, s, t)))
  }

  test("file framing round-trips and preserves record order") {
    val payloads = hostile.map { case (id, l, s, t) =>
      TfRecord.encodeExample(id, l, s, t) }
    val back = TfRecord.parseFile(TfRecord.encodeFile(payloads))
    assert(back.map(_.toSeq) == payloads.map(_.toSeq))
  }

  test("corruption is loud: flipped data byte, flipped length byte, " +
      "truncation") {
    val file = TfRecord.encodeFile(Seq(
      TfRecord.encodeExample(7L, "en", "s", "hello world")))
    def corrupt(i: Int): Array[Byte] = {
      val c = file.clone(); c(i) = (c(i) ^ 0x01).toByte; c
    }
    // byte 20 sits inside the Example payload; byte 0 inside the length
    intercept[IllegalArgumentException](TfRecord.parseFile(corrupt(20)))
    intercept[IllegalArgumentException](TfRecord.parseFile(corrupt(0)))
    intercept[IllegalArgumentException](
      TfRecord.parseFile(file.dropRight(3)))
  }
}
