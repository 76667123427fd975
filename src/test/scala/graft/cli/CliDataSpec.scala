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
}
