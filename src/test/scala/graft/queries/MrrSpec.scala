package graft.queries

import graft.SparkSpec
import graft.extract.Gazetteer

/** KgQueries.mrrOf structural laws on synthetic triple sets — the
  * score-independent properties of the filtered ranking: an
  * all-entities subject leaves each triple only itself as candidate
  * (rank 1, MRR exactly 10^6), single-triple subjects rank within the
  * full vocabulary, and hits@k is monotone.
  */
class MrrSpec extends SparkSpec {
  import spark.implicits._

  private val ents = Gazetteer.DefaultEntities.sorted

  private def run(rows: Seq[(String, String)]): (Long, Long, Long, Long,
      Long, Long) = {
    val r = KgQueries.mrrOf(rows.toDF("s", "o")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))
  }

  test("filtered protocol closed form: a subject mentioning every " +
      "entity ranks each at 1 — MRR exactly 10^6") {
    val mt = ents.map(e => ("urn:doc:all", s"urn:ent:$e"))
    val (n, mrr, mean, h1, h3, h10) = run(mt)
    assert(n == ents.size.toLong)
    assert(mrr == 1000000L && mean == 1L)
    assert(h1 == n && h3 == n && h10 == n)
  }

  test("single-triple subjects rank within the 10-entity vocabulary; " +
      "hits@k monotone") {
    val mt = Seq(("urn:doc:1", s"urn:ent:${ents.head}"),
      ("urn:doc:2", s"urn:ent:${ents(3)}"),
      ("urn:doc:3", s"urn:ent:${ents(7)}"))
    val (n, mrr, mean, h1, h3, h10) = run(mt)
    assert(n == 3L)
    assert(mean >= 1L && mean <= ents.size.toLong)
    assert(mrr >= 1000000L / ents.size && mrr <= 1000000L)
    assert(h1 <= h3 && h3 <= h10 && h10 <= n)
    // full-vocabulary candidates: every rank <= 10 by construction
    assert(h10 == n)
  }
}
