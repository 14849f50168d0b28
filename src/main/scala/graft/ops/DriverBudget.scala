package graft.ops

/** Heap-derived budgets for the guarded driver walks (the
  * pageRank/kHop/clusters/median/kAnonymize choosers).
  *
  * Every walk collects a bounded relation onto the driver before
  * solving it in memory. The per-site edge/bin caps were MEASURED on a
  * ~28 GB driver (`MEASUREMENTS.md`), where e.g. a 2²¹-edge pageRank
  * probe materialises ~2 M boxed `GenericRow`s plus the walk's
  * per-iteration HashMaps — several hundred MB of transient heap, not
  * the ~60 MB its serialized size suggests. On a small driver that
  * constant OOMs; deriving the budget from the heap fixes the small
  * driver WITHOUT changing behaviour on the measured host:
  *
  *   budget = min(cap, maxHeap / HeapFraction / bytesPerEntry)
  *
  * i.e. the heap term only LOWERS the measured cap, never raises it —
  * raising would also grow the decline-path probe (`head(bound+1)`
  * boxes `bound` rows even when the walk then declines), so a bigger
  * heap must opt in through the explicit per-call override, which all
  * call sites keep.
  */
object DriverBudget {

  /** A walk may spend at most 1/16 of the driver heap — small enough
    * that a walk racing a broadcast build or a collect elsewhere in
    * the app still fits, large enough that a 28 GB driver keeps every
    * measured cap.
    */
  val HeapFraction: Long = 16L

  /** Conservative boxed cost of one collected graph edge: a
    * `GenericRow` over 2-3 boxed values (~120 B) plus HashMap entries
    * in the walk's adjacency/rank/degree maps (~2 × ~80 B).
    */
  val BytesPerGraphEdge: Long = 288L

  /** One `(Long, Long)` cluster edge: tuple (~48 B) plus up to two
    * union-find HashMap entries (~2 × ~80 B).
    */
  val BytesPerClusterEdge: Long = 208L

  /** One histogram bin / census class: boxed row (~120 B) plus one
    * walk map entry (~80 B).
    */
  val BytesPerBin: Long = 200L

  /** Entries of `bytesPerEntry` each that fit the walk's heap share,
    * clamped to `[2¹², cap]`. The floor keeps a pathological
    * `maxMemory` reading (container introspection quirks) from
    * disabling fixture-scale walks entirely — 2¹² entries is < 1 MB,
    * safe on any JVM that starts at all.
    */
  def derived(cap: Long, bytesPerEntry: Long,
              maxHeapBytes: Long = Runtime.getRuntime.maxMemory()): Long = {
    require(cap > 0 && bytesPerEntry > 0, "DriverBudget: cap and bytesPerEntry must be positive")
    val byHeap = maxHeapBytes / HeapFraction / bytesPerEntry
    math.max(1L << 12, math.min(cap, byHeap))
  }

  /** Graph-walk edge budget (pageRank / triangles / clustering / kHop). */
  def graphWalkEdges(cap: Long): Long = derived(cap, BytesPerGraphEdge)

  /** Union-find edge budget (`Dedup.clusters`). */
  def clusterEdges(cap: Long): Long = derived(cap, BytesPerClusterEdge)

  /** Histogram-bin / census-class budget (`RobustStats`, `Generalise`). */
  def bins(cap: Long): Long = derived(cap, BytesPerBin)
}
