package graft.text

import graft.SparkSpec

/** TextAnalysis.entropy vs a driver-side replay of the exact
  * quantization (per-count StrictMath.log micro-nats, integer sum,
  * floor division), plus the closed forms the quantization preserves
  * exactly: a constant doc reads 0, an all-distinct doc reads
  * round(ln n · 1e6).
  */
class EntropySpec extends SparkSpec {
  import spark.implicits._

  private def lnq(x: Long): Long = math.round(StrictMath.log(x) * 1e6)

  private def naive(text: String): Option[(Long, Long, Long)] = {
    val toks = text.split(' ').filter(_.nonEmpty)
    if (toks.isEmpty) None
    else {
      val hist = toks.groupBy(identity).map(_._2.length.toLong)
      val n = hist.sum
      val s = hist.map(c => c * lnq(c)).sum
      Some((n, hist.size.toLong, lnq(n) - Math.floorDiv(s, n)))
    }
  }

  private def run(texts: Seq[String]): Map[Long, (Long, Long, Long)] =
    TextAnalysis.entropy(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("entropy equals the quantized replay on a varied corpus") {
    val rnd = new scala.util.Random(3)
    val texts = (0 until 60).map { _ =>
      (0 until rnd.nextInt(120)).map(_ => s"w${rnd.nextInt(12)}")
        .mkString(" ")
    } :+ "" :+ "  " :+ "solo"
    val got = run(texts)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got.get(i.toLong) === naive(t), s"doc $i: '$t'")
    }
  }

  test("closed forms: constant doc is exactly 0, distinct doc is ln n") {
    val got = run(Seq("x x x x x x x", "a b c d e f g h"))
    assert(got(0L) === ((7L, 1L, 0L)))
    assert(got(1L) === ((8L, 8L, lnq(8))))
  }
}
