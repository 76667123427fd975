package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def table(ids: Seq[Long], n: Long => Int) =
    ids.map(id => (id, Multimodal.encodeWav(16000, n(id))))
      .toDF("doc_id", "media")

  /** Closed-form replay of the fingerprint from the sawtooth payload. */
  private def expected(n: Int, window: Int = 1024): (Long, Long) = {
    val nw = (n + window - 1) / window
    val en = new Array[Long](nw)
    for (i <- 0 until n) en(i / window) += math.abs((i % 4096) - 2048L)
    var fp = 0L
    for (k <- 1 until math.min(nw, 64)) if (en(k) > en(k - 1)) fp |= 1L << (k - 1)
    (nw.toLong, fp)
  }

  test("fingerprint matches the closed-form replay across lengths") {
    val lens = (0 until 11).map(k => 8000 + k * 1200)
    val out = Multimodal.audioFingerprint(table(lens.indices.map(_.toLong), id => lens(id.toInt)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((n, id) <- lens.zipWithIndex)
      assert(out(id.toLong) == expected(n), s"len $n")
  }

  test("bit-identical payloads fingerprint identically; lengths differ") {
    val out = Multimodal.audioFingerprint(
        table(Seq(1L, 12L, 23L, 4L), id => 8000 + (id % 11).toInt * 1200))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == out(12L) && out(12L) == out(23L),
      "doc_ids congruent mod 11 are twins")
    assert(out(4L) != out(1L), "different duration must differ")
  }

  test("non-audio rows are dropped, not errors") {
    val mixed = Seq(
      (0L, Multimodal.encodeBmp(64, 64)),
      (1L, Multimodal.encodeWav(16000, 9200)),
      (2L, Array[Byte](1, 2, 3))).toDF("doc_id", "media")
    val out = Multimodal.audioFingerprint(mixed).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("mm_audio_fp over the media table: one row per audio doc") {
    val df = graft.queries.DataQueries.mmAudioFp(spark, "/root/testdata/sf0.001")
      .collect()
    assert(df.nonEmpty)
    assert(df.forall(r => r.getLong(1) >= 8 && r.getLong(1) <= 20))
    // replay each row from the doc_id formula
    assert(df.forall { r =>
      val n = 8000 + (r.getLong(0) % 11).toInt * 1200
      (r.getLong(1), r.getLong(2)) == expected(n)
    })
  }
}
