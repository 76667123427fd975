package graft.plugins

import org.scalatest.funsuite.AnyFunSuite

/** The reference's hard-threshold micro-benchmarks
  * (`tests/plugins/test_plugin_performance.py`), mirrored on the JVM —
  * same budgets, warmed before timing (SURVEY §6 table).
  */
class PerfThresholdSpec extends AnyFunSuite {

  private def timeMs(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
  }

  /** Min of 3 reps — the suite runs in parallel with 32-thread Spark
    * suites, so any single rep can lose its core to a shuffle stage; the
    * fastest rep is the steady-state number the reference's thresholds
    * describe (same min-of-reps protocol as graft.Bench).
    */
  private def bestMs(body: => Unit): Double =
    (1 to 3).map(_ => timeMs(body)).min

  test("ID generation: 10,000 ids under 100 ms (test_plugin_performance.py:102-115)") {
    (0 until 1000).foreach(i => graft.ontology.Ids.entityId(s"warm:$i"))
    val ms = bestMs((0 until 10000).foreach(i =>
      graft.ontology.Ids.entityId(s"http://e.org/Entity$i")))
    assert(ms < 100, s"10k ids took $ms ms")
  }

  test("plugin extension lookup: < 0.1 ms avg (test_plugin_performance.py:55-96)") {
    val reg = PluginRegistry.default
    (0 until 1000).foreach(_ => reg.byExtension("x.ttl"))
    val n = 10000
    val ms = bestMs((0 until n).foreach { i =>
      reg.byExtension(if (i % 2 == 0) "a/b.ttl" else "c/d.model.json")
    })
    assert(ms / n < 0.1, s"avg ${ms / n} ms")
  }

  test("type-registry lookup: < 0.01 ms avg over 1000 mappings (150-170)") {
    val r = new TypeRegistry.Registry()
    (0 until 1000).foreach(i => r.registerMapping("fmt", s"type$i", "String"))
    (0 until 1000).foreach(i => r.getFabricType("fmt", s"type${i % 1000}"))
    val n = 100000
    val ms = bestMs((0 until n).foreach(i =>
      r.getFabricType("fmt", s"type${i % 1000}")))
    assert(ms / n < 0.01, s"avg ${ms / n} ms")
  }

  test("validation issue append: 1000 issues < 50 ms (117-136)") {
    val ms = bestMs {
      val buf = scala.collection.mutable.ArrayBuffer[graft.cdm.CdmValidator.CdmIssue]()
      (0 until 1000).foreach(i => buf += graft.cdm.CdmValidator.CdmIssue(
        "warning", "name_conflict", s"issue $i", Some(s"Entity: E$i")))
      assert(buf.size == 1000)
    }
    assert(ms < 50, s"1000 appends took $ms ms")
  }
}
