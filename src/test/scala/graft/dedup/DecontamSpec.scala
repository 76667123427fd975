package graft.dedup

import graft.SparkSpec

class DecontamSpec extends SparkSpec {
  import spark.implicits._

  private val w13 = (1 to 13).map(i => s"t$i").mkString(" ")

  private def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("flags docs sharing a 13-gram with the benchmark, counts hits") {
    val bench = df(Seq((100L, s"$w13 tail words here")))
    val corpus = df(Seq(
      // contains the benchmark's first 13-gram once
      (1L, s"prefix $w13 suffix"),
      // clean doc — no shared window
      (2L, (1 to 20).map(i => s"u$i").mkString(" ")),
      // the full benchmark text ⇒ every benchmark window hits
      (3L, s"$w13 tail words here")))
    val out = Dedup.decontaminate(corpus, bench).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L)._1 == 1L && out(1L)._2 == 3L) // 15 toks → 3 windows
    assert(out(3L) == (4L, 4L)) // 16 toks → 4 windows, all contaminated
  }

  test("docs shorter than the window use the whole-doc hash") {
    val bench = df(Seq((100L, "short eval question")))
    val corpus = df(Seq(
      (1L, "short eval question"), // identical short doc → 1 hit
      (2L, "short eval"), // sub-span, different whole-doc hash → clean
      (3L, "")))
    val out = Dedup.decontaminate(corpus, bench).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L, 1L)))
  }

  test("multiplicity: a repeated contaminated window counts per occurrence") {
    val bench = df(Seq((100L, w13)))
    val corpus = df(Seq((1L, s"$w13 $w13")))
    val out = Dedup.decontaminate(corpus, bench).collect()
    // 26 toks → 14 windows; windows starting at 0 and 13 equal w13
    assert(out.head.getLong(1) == 2L && out.head.getLong(2) == 14L)
  }

  test("benchmark window-count guard refuses corpus-sized benchmarks") {
    val bench = df(Seq((100L, (1 to 30).map(i => s"b$i").mkString(" "))))
    val corpus = df(Seq((1L, "x")))
    intercept[IllegalArgumentException] {
      Dedup.decontaminate(corpus, bench, maxBenchWindows = 3).collect()
    }
  }

  test("result is independent of corpus partitioning") {
    val bench = df(Seq((100L, w13)))
    val rows = (1L to 40L).map(i =>
      (i, if (i % 5 == 0) s"pad $w13" else s"doc $i unique ${i * 7}"))
    val a = Dedup.decontaminate(df(rows).repartition(1), bench)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Dedup.decontaminate(df(rows).repartition(13), bench)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b && a.length == 8)
  }
}
