package graft.kgql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Regression: closures over COMPOSITE path relations (the `(p|^p)`
  * self-union) with a seed restriction tripped Spark's
  * Union.rewriteConstraints (key-not-found on a reused attribute) at
  * real-pipeline scale — invisible on tiny fixtures. Fixed by the
  * localCheckpoint barrier on [[PropertyPath.boundedClosure]]'s edge
  * set; these tests run the exact failing shapes over the sf0.001
  * pipeline with default confs.
  */
class StarClosureRegressionSpec extends SparkSpec {
  import spark.implicits._
  import Bgp._

  private lazy val triples = {
    val pages = graft.pages.PageGen.pages(spark, "/root/testdata/sf0.001")
    val m = graft.extract.MentionScan.mentions(pages,
      graft.extract.Gazetteer(graft.extract.Gazetteer.DefaultEntities))
    graft.extract.MentionScan.mentionTriples(m)
      .union(graft.extract.MentionScan.coOccurrenceTriples(m)
        .select("s", "p", "o"))
      .localCheckpoint()
  }
  private val M = "urn:graft:mentions"

  test("seeded closure over a (p|^p) union relation") {
    val sources = Seq("urn:doc:0").toDF("src")
    val c = Bgp.rel(triples, Plus(PAlt(Pred(M), Inv(Pred(M))), 8),
      Some(sources))
    assert(c.count() > 0)
  }

  test("star (closure ∪ zero-length) over the real pipeline") {
    val out = graft.queries.KgQueries
      .kgPathStar(spark, "/root/testdata/sf0.001")
      .as[String].collect()
    assert(out.contains("urn:doc:0")) // zero-length self row
    assert(out.length > 1)            // plus actual reachability
  }
}
