package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** JSONL tier laws: byte-identical text through the real file
  * write/read path, hostile content (newlines, quotes, backslashes,
  * control chars, CJK, supplementary-plane emoji, empty string), one
  * JSON object per physical line, and FAILFAST on corrupt input.
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val hostile = Seq(
    (1L, "en", "s1", "plain words"),
    (2L, "en", "s1", "line\nbreak\r\nand\ttab"),
    (3L, "en", "s2", "quotes \" and \\ backslash \\\" mixed"),
    (4L, "zh", "s2", "中文混排 with ascii"),
    (5L, "und", "s3", "emoji 😀 and  control"),
    (6L, "en", "s3", ""),
    (7L, "en", "s3", "{\"looks\":\"like json\"}"))

  test("file round trip is exact on hostile content") {
    val dir = Files.createTempDirectory("jsonl").toString + "/shards"
    val docs = hostile.toDF("doc_id", "lang", "source", "text")
    Jsonl.writeShards(docs, dir)
    val back = Jsonl.readShards(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(back == hostile.toSet)
  }

  test("one object per physical line even with embedded newlines in text") {
    val dir = Files.createTempDirectory("jsonl2").toString + "/shards"
    Jsonl.writeShards(hostile.toDF("doc_id", "lang", "source", "text"), dir)
    val lines = spark.read.text(dir).count()
    assert(lines == hostile.length.toLong)
  }

  test("in-plan encode/parse equals the file path") {
    val docs = hostile.toDF("doc_id", "lang", "source", "text")
    val inPlan = Jsonl.parseLines(Jsonl.encodeLines(docs))
      .collect().map(_.toSeq).toSet
    assert(inPlan == docs.collect().map(_.toSeq).toSet)
  }

  test("FAILFAST: corrupt line is a loud error, not a null row") {
    val bad = Seq("{\"doc_id\": 1, \"lang\": \"en\"", "not json at all")
      .toDF("line")
    val ex = intercept[Exception] {
      Jsonl.parseLines(bad).collect()
    }
    assert(ex.getMessage != null)
  }
}
