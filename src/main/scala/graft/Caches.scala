package graft

import org.apache.spark.sql.{DataFrame, Dataset}

/** Query-scoped cache registry — the unpersist discipline for
  * operators whose plans read an intermediate more than once.
  *
  * Operators like MinHash signatures, the n-gram inverted index, the
  * unigram dictionary, or the Bloom key set cache an intermediate that
  * the RETURNED (lazy) plan still references — they cannot unpersist
  * before the caller's terminal action without recomputing the branch.
  * Left alone, an 80-query session accumulates never-released storage
  * memory that evicts useful cache at production scale. The contract:
  * operators register such caches here, and the serving layer
  * ([[Verify]], [[Bench]], any request handler) calls [[releaseAll]]
  * after each query's terminal action — the per-request arena the
  * reference gets from its request lifetime.
  */
object Caches {

  private val registered =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Cache `df` and register it for the next [[releaseAll]]. */
  def cache(df: DataFrame): DataFrame = {
    df.cache()
    registered.add(df)
    df
  }

  /** Unpersist every cache registered since the last release.
    * Non-blocking: the executors drop blocks asynchronously. */
  def releaseAll(): Unit = {
    var df = registered.poll()
    while (df != null) {
      df.unpersist(false)
      df = registered.poll()
    }
  }
}
