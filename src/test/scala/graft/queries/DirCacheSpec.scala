package graft.queries

import graft.SparkSpec

/** Round-2 verdict #9: the per-dir extraction caches must be bounded —
  * size-1 LRU, clear-on-new-dir — so a long-lived service working through
  * many dirs doesn't accumulate checkpointed RDD blocks forever.
  * Round-3 advice: the session is part of the key, so a cache hit can
  * never hand a checkpointed DataFrame to a different (e.g. restarted)
  * session whose context no longer holds the blocks.
  */
class DirCacheSpec extends SparkSpec {

  test("size-1 LRU: hit on same dir, evict on new dir, rebuild on return") {
    val c = new DirCache[Int]
    var builds = 0
    def build(v: Int): Int = { builds += 1; v }

    assert(c.get(spark, "a")(build(1)) == 1)
    assert(c.get(spark, "a")(build(99)) == 1) // cached — builder not invoked
    assert(builds == 1)
    assert(c.cachedDir.contains("a"))

    assert(c.get(spark, "b")(build(2)) == 2) // new dir evicts the old entry
    assert(builds == 2)
    assert(c.cachedDir.contains("b"))

    // returning to the evicted dir rebuilds: nothing stale is retained
    assert(c.get(spark, "a")(build(3)) == 3)
    assert(builds == 3)
    assert(c.cachedDir.contains("a"))
  }

  test("a different session is a cache miss even for the same dir") {
    val c = new DirCache[Int]
    var builds = 0
    def build(v: Int): Int = { builds += 1; v }
    assert(c.get(spark, "a")(build(1)) == 1)
    val other = spark.newSession()
    assert(c.get(other, "a")(build(2)) == 2) // same dir, new session → rebuild
    assert(builds == 2)
    // and the old session's entry was evicted (size-1)
    assert(c.get(spark, "a")(build(3)) == 3)
    assert(builds == 3)
  }
}

/** Integration: switching sf-dirs through the onto query cache drops the
  * previous dir's checkpointed extraction (its RDD blocks become
  * unreachable for the ContextCleaner) while results stay correct.
  */
class OntoCacheEvictionSpec extends SparkSpec {

  test("extraction cache holds only the latest dir after a switch") {
    val d1 = "/root/testdata/sf0.001"
    val d2 = "/root/testdata/sf0.01"
    assume(new java.io.File(d1).isDirectory && new java.io.File(d2).isDirectory)

    val n1 = OntologyQueries.ontoClasses(spark, d1).count()
    assert(OntologyQueries.extractionCache.cachedDir.contains(d1))
    val n2 = OntologyQueries.ontoClasses(spark, d2).count()
    assert(OntologyQueries.extractionCache.cachedDir.contains(d2),
      "old dir's extraction must be evicted when a new dir is requested")
    // fixture schema is dir-independent: same class count both dirs
    assert(n1 == n2 && n1 > 0)
  }
}
