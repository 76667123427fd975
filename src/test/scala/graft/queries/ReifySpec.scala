package graft.queries

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** kg_reify laws: reified statements reconstruct the original weighted
  * edge table exactly (the round-trip that makes reification lossless),
  * statement ids are the deterministic FNV of the triple, and every
  * statement carries exactly the four reification properties.
  */
class ReifySpec extends SparkSpec {

  test("reification round-trips to the weighted pair table, ids are " +
      "the triple FNV, 4 properties per statement") {
    val src = "/root/testdata/sf0.001"
    val rows = KgQueries.kgReify(spark, src).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.nonEmpty && rows.length % 4 == 0)
    val byStmt = rows.groupBy(_._1)
    for ((stmt, ps) <- byStmt) {
      assert(ps.length == 4)
      val m = ps.map(p => p._2 -> p._3).toMap
      assert(m.keySet == Set("urn:rdf:subject", "urn:rdf:predicate",
        "urn:rdf:object", "urn:graft:nDocs"))
      assert(m("urn:rdf:predicate") == "urn:graft:coOccursWith")
      // id = FNV of s|p|o
      val key = s"${m("urn:rdf:subject")}|urn:graft:coOccursWith|" +
        m("urn:rdf:object")
      assert(stmt == "urn:stmt:" + graft.functions.FnvHash.hash(
        UTF8String.fromString(key)))
      assert(m("urn:graft:nDocs").toLong >= 1L)
    }
    // distinct subjects-object pairs == statements (lossless, no merges)
    val pairs = byStmt.values.map { ps =>
      val m = ps.map(p => p._2 -> p._3).toMap
      (m("urn:rdf:subject"), m("urn:rdf:object"))
    }.toSeq
    assert(pairs.distinct.size == byStmt.size)
  }
}
