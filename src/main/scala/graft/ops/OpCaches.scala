package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for operator-internal persisted intermediates (shingle
  * tables, frequency aggregates, cell assignments).
  *
  * The dedup/similarity operators return LAZY DataFrames, so they cannot
  * unpersist their own intermediates — the caller has not run the action
  * yet when the operator returns. Left alone, those MEMORY_AND_DISK
  * entries are only LRU-evictable, and in a long-lived multi-query
  * session they squeeze the storage pool. Operators therefore persist
  * through [[persist]], and the session driver (Verify / Bench / a user
  * pipeline) calls [[releaseAll]] after each query's terminal action —
  * a `finally`-style caching scope without giving up operator laziness.
  *
  * Releasing early is always SAFE (caching is transparent; the plan
  * recomputes), so a caller that forgets costs only speed, never
  * correctness.
  */
object OpCaches {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK) and register it for scoped release. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    registered.add(p)
    p
  }

  /** Unpersist every registered intermediate (non-blocking) and empty
    * the registry. Call after a query's terminal action.
    */
  def releaseAll(): Unit = {
    var df = registered.poll()
    while (df != null) {
      df.unpersist(false)
      df = registered.poll()
    }
  }
}
