package graft.cli

import graft.SparkSpec

/** Round-3 CLI commands: curate (funnel) and search (ANN top-k). Runs
  * inside the shared test session (the CLI reuses an active session and
  * must not tear it down).
  */
class CliDataSpec extends SparkSpec {

  private def captureOut(body: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos))(body)
    bos.toString("UTF-8")
  }

  test("curate prints the four funnel stages in order") {
    val out = captureOut(Main.main(Array("curate", "/root/testdata/sf0.001")))
    val stages = out.linesIterator.map(_.takeWhile(_ != ':')).toSeq
    assert(stages == Seq("raw", "quality", "exact_dedup", "near_dedup"))
    assert(out.contains("raw: docs="))
  }

  test("search prints k ranked neighbors") {
    val out = captureOut(Main.main(Array("search", "/root/testdata/sf0.001", "0", "3")))
    val lines = out.linesIterator.toSeq
    assert(lines.length == 3)
    assert(lines.head.startsWith("rank=1 vec="))
    assert(lines.forall(_.contains("cos=")))
  }

  test("lines prints kept/dropped totals") {
    val out = captureOut(Main.main(Array("lines", "/root/testdata/sf0.001")))
    val m = "line dedup: kept=(\\d+) dropped=(\\d+)".r.findFirstMatchIn(out)
    assert(m.isDefined, out)
    assert(m.get.group(1).toLong > 0 && m.get.group(2).toLong > 0)
  }

  test("phash prints a pair count") {
    val out = captureOut(Main.main(Array("phash", "/root/testdata/sf0.001", "0")))
    assert("phash near-dup pairs \\(hamming<=0\\): \\d+".r
      .findFirstIn(out).isDefined, out)
  }

  test("kg-stream merges a directory of page batches into one graph") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    val pages = graft.pages.PageGen.pages(spark, "/root/testdata/sf0.001")
      .localCheckpoint()
    val src = Files.createTempDirectory("cli_kgstream_src").toString
    for (b <- 0 until 2) {
      val tmp = Files.createTempDirectory(s"cli_kgstream_s$b").toString
      pages.filter(col("doc_id") % 2 === b).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = Files.list(java.nio.file.Paths.get(tmp)).toArray
        .map(_.toString).filter(_.endsWith(".parquet")).head
      Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(src, s"b$b.parquet"))
    }
    val out = Files.createTempDirectory("cli_kgstream_out").toString
    val ckpt = Files.createTempDirectory("cli_kgstream_ckpt").toString
    val printed = captureOut(Main.main(Array("kg-stream", src, out, ckpt)))
    val m = "kg stream: head=(\\S+) triples=(\\d+)".r.findFirstMatchIn(printed)
    assert(m.isDefined, printed)
    assert(m.get.group(2).toLong > 0)
  }
}
