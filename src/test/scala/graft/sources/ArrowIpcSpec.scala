package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Arrow IPC tier laws: byte-exact round trips on hostile content,
  * native null ≠ empty through validity bitmaps, the ARROW1 magic
  * framing, and loud failure on truncation/corruption.
  */
class ArrowIpcSpec extends AnyFunSuite {
  import ArrowIpc.Doc

  private val hostile = Seq(
    Doc(1L, "en", "s1", "plain words"),
    Doc(2L, "en", "s1", "comma, separated, values"),
    Doc(3L, "en", "s2", "quotes \" and \"\" doubled \" mixed"),
    Doc(4L, "en", "s2", "line\nbreak\r\nand\ttab"),
    Doc(5L, "zh", "s3", "中文混排 with ascii"),
    Doc(6L, "und", "s3", "emoji 😀 and  control"),
    Doc(7L, "en", "s3", ""),
    Doc(8L, "en", "s3", "\"fully quoted\""))

  test("round trip is exact on hostile content incl. empty string") {
    val back = ArrowIpc.decodeFile(ArrowIpc.encodeFile(hostile))
    assert(back == hostile)
  }

  test("null and empty are distinct via validity bitmaps") {
    val rows = Seq(Doc(1L, "en", "s1", null), Doc(2L, "en", "s1", ""))
    val back = ArrowIpc.decodeFile(ArrowIpc.encodeFile(rows))
    assert(back.map(d => Option(d.text)) == Seq(None, Some("")))
  }

  test("the file carries the ARROW1 magic at both ends") {
    val bytes = ArrowIpc.encodeFile(hostile.take(2))
    val magic = "ARROW1".getBytes
    assert(bytes.take(6).sameElements(magic))
    assert(bytes.takeRight(6).sameElements(magic))
  }

  test("truncation and footer corruption fail loudly") {
    val bytes = ArrowIpc.encodeFile(hostile)
    intercept[Exception] {
      ArrowIpc.decodeFile(bytes.take(bytes.length / 2))
    }
    // the random-access layout is read FROM THE FOOTER (that is what
    // makes batch seeks O(1)), so the trailing magic is the integrity
    // anchor — corrupt it and the reader refuses the file
    val tail = bytes.clone()
    tail(tail.length - 3) = 'X'.toByte
    intercept[Exception] { ArrowIpc.decodeFile(tail) }
  }

  test("documented trade vs TFRecord: no per-batch CRC — body bit-rot " +
      "is NOT self-detected (the identity oracle is what catches it)") {
    val bytes = ArrowIpc.encodeFile(hostile)
    // leading magic is never consulted by the footer-seeking reader
    val head = "NOTARROW".getBytes ++ bytes.drop(8)
    assert(ArrowIpc.decodeFile(head) == hostile)
    // a flipped byte INSIDE a value buffer decodes WITHOUT error to
    // different rows — exactly why src_arrow's driver oracle is the
    // full identity check
    val off = bytes.indexOfSlice("plain words".getBytes)
    assert(off > 0, "payload bytes must be locatable in the buffer")
    val c = bytes.clone(); c(off) = 'X'.toByte
    assert(ArrowIpc.decodeFile(c) != hostile)
  }

  test("empty shard round-trips as an empty file") {
    assert(ArrowIpc.decodeFile(ArrowIpc.encodeFile(Nil)).isEmpty)
  }
}
