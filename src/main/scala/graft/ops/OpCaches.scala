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
  * correctness. Because release is safe, the registry is also
  * self-bounding: past `maxRegistered` entries the OLDEST registration
  * is unpersisted on the spot, so a library caller that never calls
  * [[releaseAll]] cannot leak DataFrame references (or storage) without
  * bound.
  *
  * Scope note: the registry is process-global and releaseAll is a
  * whole-registry drain — the model is ONE pipeline per process running
  * queries to completion (Verify, Bench, a batch job). Interleaving
  * releaseAll with a concurrently RUNNING query from another thread
  * only costs that query recomputation, but if that pattern matters,
  * release between queries, not mid-flight.
  */
object OpCaches {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val maxRegistered = 64

  /** Persist `df` (MEMORY_AND_DISK) and register it for scoped release. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    registered.add(p)
    while (registered.size > maxRegistered) {
      val oldest = registered.poll()
      if (oldest != null) oldest.unpersist(false)
    }
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
