package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** CSV tier laws: byte-identical text through the real file write/read
  * path on hostile content (embedded newlines/CRLF, commas, doubled
  * quotes, CJK, supplementary-plane emoji, EMPTY STRING — the
  * empty-vs-null trap), in-plan encode/parse ≡ file path, and the
  * documented non-splittability trade (quoted newlines make physical
  * lines exceed records).
  */
class CsvSpec extends SparkSpec {
  import spark.implicits._

  private val hostile = Seq(
    (1L, "en", "s1", "plain words"),
    (2L, "en", "s1", "comma, separated, values"),
    (3L, "en", "s2", "quotes \" and \"\" doubled \" mixed"),
    (4L, "en", "s2", "line\nbreak\r\nand\ttab"),
    (5L, "zh", "s3", "中文混排 with ascii"),
    (6L, "und", "s3", "emoji 😀 and  control"),
    (7L, "en", "s3", ""),
    (8L, "en", "s3", "\"fully quoted\""))

  test("file round trip is exact on hostile content incl. empty string") {
    val dir = Files.createTempDirectory("csv").toString + "/shards"
    val docs = hostile.toDF("doc_id", "lang", "source", "text")
    Csv.writeShards(docs, dir)
    val back = Csv.readShards(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(back == hostile.toSet)
  }

  test("in-plan encode/parse equals the file path") {
    val docs = hostile.toDF("doc_id", "lang", "source", "text")
    val inPlan = Csv.parseLines(Csv.encodeLines(docs))
      .collect().map(_.toSeq).toSet
    assert(inPlan == docs.collect().map(_.toSeq).toSet)
  }

  test("quoted newlines mean shards are NOT line-splittable (the " +
      "documented trade vs JSONL)") {
    val dir = Files.createTempDirectory("csv2").toString + "/shards"
    Csv.writeShards(hostile.toDF("doc_id", "lang", "source", "text"), dir)
    val physical = spark.read.text(dir).count()
    // header lines + records + extra physical lines from doc 4's \n\r\n
    assert(physical > hostile.length.toLong)
  }

  test("null text survives via the sentinel, distinct from empty") {
    val dir = Files.createTempDirectory("csv3").toString + "/shards"
    val docs = Seq((1L, "en", "s1", null: String), (2L, "en", "s1", ""))
      .toDF("doc_id", "lang", "source", "text")
    Csv.writeShards(docs, dir)
    val back = Csv.readShards(spark, dir).orderBy("doc_id")
      .collect().map(r => Option(r.getString(3)))
    assert(back.toSeq == Seq(None, Some("")))
  }
}
