package graft.functions

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitter sketch (Misra & Gries 1982) as a MERGEABLE
  * typed aggregate — the summaries-merge pattern every distributed
  * sketch (HLL, KLL, count-min) uses: bounded state per partition,
  * associative merge, one aggregate shuffle of sketch-sized rows.
  *
  * Buffer = up to `budget` (item → counter) pairs in a MUTABLE
  * java.util.HashMap (Kryo-encoded): an Aggregator may mutate and
  * return its buffer, and the per-row path must not rebuild an
  * immutable map per unseen token — on a large vocabulary nearly every
  * token misses the buffer, so an immutable rebuild is O(rows×budget)
  * allocation (the boxing cliff the repo's other Aggregators avoid).
  * Update: increment a tracked item, admit if space, else decrement
  * ALL counters in place (dropping zeros) — the classic frequent-items
  * step. Merge (Agarwal, Cormode et al., "Mergeable Summaries", PODS
  * 2012): sum counters pairwise, then subtract the (budget+1)-largest
  * counter from every entry and drop non-positives. The merged sketch
  * keeps the MG guarantee: every item with true frequency >
  * n/(budget+1) SURVIVES with estimate within n/(budget+1) of truth,
  * for any merge order and any data partitioning — which is what makes
  * a deterministic verdict query possible over a
  * nondeterministically-ordered cluster computation.
  *
  * finish() returns an immutable (item → lower-bound count) map.
  * Counter VALUES (and map iteration order) depend on merge order —
  * only the guarantee above is deterministic, so consumers must query
  * the map (membership, size), not compare it byte-for-byte.
  */
class MisraGriesAgg(budget: Int)
    extends Aggregator[String, java.util.HashMap[String, Long], Map[String, Long]] {

  override def zero: java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](budget * 2)

  override def reduce(buf: java.util.HashMap[String, Long], item: String): java.util.HashMap[String, Long] = {
    if (buf.containsKey(item)) buf.put(item, buf.get(item) + 1L)
    else if (buf.size < budget) buf.put(item, 1L)
    else {
      // decrement-all, in place; remove entries reaching zero
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long],
                     b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val bit = b.entrySet().iterator()
    while (bit.hasNext) {
      val e = bit.next()
      a.put(e.getKey, a.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (a.size > budget) {
      // subtract the (budget+1)-th largest counter, drop non-positives
      val vals = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (budget + 1)) // (budget+1)-th largest
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue - cut <= 0L) it.remove() else e.setValue(e.getValue - cut)
      }
    }
    a
  }

  override def finish(buf: java.util.HashMap[String, Long]): Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  override def bufferEncoder = Encoders.kryo[java.util.HashMap[String, Long]]
  override def outputEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object MisraGriesAgg {
  /** Column form over a string item column. */
  def column(itemCol: Column, budget: Int): Column =
    udaf(new MisraGriesAgg(budget), Encoders.STRING)(itemCol)
}
