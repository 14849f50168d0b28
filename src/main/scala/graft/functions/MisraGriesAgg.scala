package graft.functions

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitter sketch (Misra & Gries 1982) as a MERGEABLE
  * typed aggregate — the summaries-merge pattern every distributed
  * sketch (HLL, KLL, count-min) uses: bounded state per partition,
  * associative merge, one aggregate shuffle of sketch-sized rows.
  *
  * Buffer = up to `budget` (item → counter) pairs. Update: increment a
  * tracked item, admit if space, else decrement ALL counters (dropping
  * zeros) — the classic frequent-items step. Merge (Agarwal, Cormode
  * et al., "Mergeable Summaries", PODS 2012): sum counters pairwise,
  * then subtract the (budget+1)-largest counter from every entry and
  * drop non-positives. The merged sketch keeps the MG guarantee: every
  * item with true frequency > n/(budget+1) SURVIVES with estimate
  * within n/(budget+1) of truth, for any merge order and any data
  * partitioning — which is what makes a deterministic verdict query
  * possible over a nondeterministically-ordered cluster computation.
  *
  * finish() returns the raw (item → lower-bound count) map. Counter
  * VALUES (and map iteration order) depend on merge order — only the
  * guarantee above is deterministic, so consumers must query the map
  * (membership, size), not compare it byte-for-byte.
  */
class MisraGriesAgg(budget: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < budget => buf.updated(item, 1L)
      case None =>
        buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (summed.size <= budget) summed
    else {
      // subtract the (budget+1)-th largest counter, drop non-positives
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(budget)
      summed.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object MisraGriesAgg {
  /** Column form over a string item column. */
  def column(itemCol: Column, budget: Int): Column =
    udaf(new MisraGriesAgg(budget), Encoders.STRING)(itemCol)
}
