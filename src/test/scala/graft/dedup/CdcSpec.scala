package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Dedup.cdcChunks laws: the chunks PARTITION the text (reassembly is
  * byte-identical), boundaries sit exactly at mask-hit gram ends, and
  * the content-defined locality that makes CDC a dedup primitive — a
  * prefix insertion leaves the suffix chunks' identities intact.
  */
class CdcSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private def fnv(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  private val genText: Gen[String] =
    Gen.choose(0, 600).flatMap(n => Gen.listOfN(n,
      Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.const(' ')))
      .map(_.mkString))

  test("chunks partition the text: lengths sum, hashes match slices") {
    check(Prop.forAll(genText) { t =>
      val cs = Dedup.cdcChunks(t)
      val lens = cs.map(_._2)
      lens.sum == t.length && lens.forall(_ > 0) && {
        var off = 0
        cs.forall { case (h, len) =>
          val ok = fnv(t.substring(off, off + len)) == h
          off += len; ok
        }
      }
    })
  }

  test("every internal boundary is a mask-hit gram end, and every " +
      "mask hit is a boundary") {
    check(Prop.forAll(genText) { t =>
      val cuts = Dedup.cdcChunks(t).map(_._2).scanLeft(0)(_ + _)
        .drop(1).dropRight(1).toSet // internal cut offsets (exclusive)
      val hits = (0 to t.length - 8).filter { i =>
        java.lang.Long.remainderUnsigned(fnv(t.substring(i, i + 8)),
          64L) == 0L
      }.map(_ + 8).filter(_ < t.length).toSet // a hit AT the end cuts
      cuts == hits                            // nothing internal
    })
  }

  test("locality: a prefix insertion preserves suffix chunk identities") {
    val body = (0 until 40).map(i => s"token$i word$i").mkString(" ")
    val a = Dedup.cdcChunks(body).map(_._1)
    val b = Dedup.cdcChunks("INSERTED-PREFIX-BYTES " + body).map(_._1)
    // all chunks after the first shared boundary coincide: the suffix
    // of a is a suffix of b
    val shared = a.reverse.zip(b.reverse).takeWhile(p => p._1 == p._2)
    assert(shared.nonEmpty,
      s"no shared suffix chunks: a=${a.size}, b=${b.size}")
    assert(shared.size >= a.size - 3, // only the head region re-chunks
      s"re-chunking spread too far: ${shared.size} of ${a.size} kept")
  }

  test("edge cases: empty, shorter than a gram, boundary at the end") {
    assert(Dedup.cdcChunks("").isEmpty)
    val tiny = Dedup.cdcChunks("abc")
    assert(tiny == Seq((fnv("abc"), 3)))
  }
}
