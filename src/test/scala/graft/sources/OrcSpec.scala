package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** ORC tier laws: byte-identical text through the real file write/read
  * path on hostile content, native null ≠ empty (no sentinel needed —
  * the CSV trap absent by construction), and the two scale guarantees
  * stated as PLAN facts, not folklore: a narrow projection reads a
  * narrow file schema (column pruning) and filters reach the scan
  * (predicate pushdown).
  */
class OrcSpec extends SparkSpec {
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
    val dir = Files.createTempDirectory("orc").toString + "/shards"
    Orc.writeShards(hostile.toDF("doc_id", "lang", "source", "text"), dir)
    val back = Orc.readShards(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(back == hostile.toSet)
  }

  test("null and empty are distinct natively — no sentinel discipline") {
    val dir = Files.createTempDirectory("orc2").toString + "/shards"
    Orc.writeShards(Seq((1L, "en", "s1", null: String), (2L, "en", "s1", ""))
      .toDF("doc_id", "lang", "source", "text"), dir)
    val back = Orc.readShards(spark, dir).orderBy("doc_id")
      .collect().map(r => Option(r.getString(3)))
    assert(back.toSeq == Seq(None, Some("")))
  }

  test("column pruning: a 1-column projection reads a 1-column schema") {
    val dir = Files.createTempDirectory("orc3").toString + "/shards"
    Orc.writeShards(hostile.toDF("doc_id", "lang", "source", "text"), dir)
    val plan = Orc.readShards(spark, dir).select("doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"text column must not be read for a doc_id projection:\n$plan")
  }

  test("predicate pushdown: the filter reaches the ORC scan") {
    val dir = Files.createTempDirectory("orc4").toString + "/shards"
    Orc.writeShards(hostile.toDF("doc_id", "lang", "source", "text"), dir)
    val plan = Orc.readShards(spark, dir)
      .filter($"doc_id" === 5L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,5)]"),
      s"doc_id = 5 must be pushed to the scan:\n$plan")
  }
}
