package graft.queries

/** Size-1 LRU keyed by sf-dir: the bench/verify drivers only ever work one
  * dir at a time, so holding checkpointed DataFrames for more than the
  * current dir is a leak in a long-lived service (round-2 verdict). When a
  * new dir arrives, the previous dir's entry is dropped so its
  * locally-checkpointed RDD blocks become unreachable and Spark's
  * ContextCleaner reclaims them.
  */
final class DirCache[V] {
  private var entry: Option[(String, V)] = None

  def get(dir: String)(build: => V): V = synchronized {
    entry match {
      case Some((d, v)) if d == dir => v
      case _ =>
        val v = build
        entry = Some((dir, v))
        v
    }
  }

  /** Currently-cached dir, for eviction tests. */
  def cachedDir: Option[String] = synchronized(entry.map(_._1))

  def clear(): Unit = synchronized { entry = None }
}
