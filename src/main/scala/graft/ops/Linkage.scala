package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: match dirty records against a
  * clean reference without the all-pairs cross join.
  *
  * The classic three-stage shape (Fellegi & Sunter 1969; Christen's
  * "Data Matching"):
  *
  *  1. BLOCKING — candidate pairs come from a union of equi-joins on
  *     cheap block keys (phone prefix, name suffix, zip), one pass per
  *     key. Each pass is an ordinary shuffle-or-broadcast equi-join;
  *     nothing is ever compared all-against-all. Multi-pass matters
  *     because any single key can be corrupted in the dirty record —
  *     a record missed by the phone pass is caught by the name pass.
  *  2. SCORING — per-pair integer agreement weights over the full
  *     fields (exact match, bounded `levenshtein`, categorical
  *     agreement). Integer weights keep the score hash-exact across
  *     engines; `levenshtein` is the standard DP edit distance in both
  *     Spark and DuckDB, identical on ASCII.
  *  3. SELECTION — threshold, then best-match-per-record as ONE
  *     mergeable max-struct aggregate (the d15 recipe — never a
  *     per-record window), ties broken toward the smaller match id so
  *     selection is deterministic.
  *
  * Scale shape at 100 TB: K blocking passes = K equi-joins shuffling
  * on their block keys (broadcast when the reference side is small); a
  * hot block (everyone named "SMITH") skews exactly like any hot join
  * key and takes the same remedies (more selective/composite keys,
  * AQE skew split). Scoring is a narrow map over candidates; selection
  * is a partial+final aggregate. Candidate pairs produced by several
  * passes are scored more than once and collapsed by the final
  * aggregate — duplicate compute traded for not shuffling a distinct.
  */
object Linkage {

  /** Union of blocking passes: for each `(leftKey, rightKey)` pair of
    * key-column NAMES, an equi-join of `left` against `right`. The two
    * inputs must have disjoint column names (prefix one side). NULL
    * block keys never join (SQL equi-join semantics) — a record with a
    * missing field simply relies on the other passes.
    */
  def blockedCandidates(left: DataFrame, right: DataFrame,
                        passes: Seq[(String, String)]): DataFrame = {
    require(passes.nonEmpty, "blockedCandidates: at least one blocking pass")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "blockedCandidates: left/right column names must be disjoint")
    passes.map { case (lk, rk) => left.join(right, left(lk) === right(rk)) }
      .reduce(_ unionByName _)
  }

  /** [[blockedCandidates]] under a per-block-key candidate budget —
    * the linkage family's scale guard (Christen's "Data Matching"
    * §4.6.1, block-size filtering): a block key shared by `nd` dirty
    * and `nc` clean records contributes nd·nc candidates, so one
    * saturated key (everyone named "SMITH", a burned-in default phone,
    * er1's replica-aliased 7-digit prefixes at the sf100 decade) makes
    * the pass quadratic while adding near-zero linkage information —
    * an uninformative key by definition matches everything. Keys with
    * nd·nc > `maxPairs` are SKIPPED for that pass (the record still
    * links through its other passes — the same reasoning multi-pass
    * blocking already rests on); kept volume is ≤ maxPairs·#keys,
    * linear in keys however degenerate the key distribution. The
    * per-key counts are two mergeable aggregates at key scale and the
    * allowed-key set applies as one semi join per pass — never a
    * driver-side key list.
    */
  def cappedBlockedCandidates(left: DataFrame, right: DataFrame,
                              passes: Seq[(String, String)],
                              maxPairs: Long): DataFrame = {
    require(passes.nonEmpty, "cappedBlockedCandidates: at least one blocking pass")
    require(maxPairs >= 1, "cappedBlockedCandidates: maxPairs must be >= 1")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "cappedBlockedCandidates: left/right column names must be disjoint")
    passes.map { case (lk, rk) =>
      val allowed = left.groupBy(left(lk).as("__k")).agg(count(lit(1)).as("__nd"))
        .join(right.groupBy(right(rk).as("__k")).agg(count(lit(1)).as("__nc")), "__k")
        .filter(col("__nd") * col("__nc") <= maxPairs)
        .select("__k")
      val lf = left.join(allowed, left(lk) === col("__k"), "left_semi")
      lf.join(right, lf(lk) === right(rk))
    }.reduce(_ unionByName _)
  }

  /** Best match per left record: keep pairs scoring ≥ `minScore`, then
    * argmax score per `idCol` with ties to the SMALLEST `matchCol`.
    * One mergeable aggregate; duplicate candidates from overlapping
    * blocking passes collapse here for free.
    */
  def bestMatches(scored: DataFrame, idCol: String, matchCol: String,
                  scoreCol: String, minScore: Long): DataFrame =
    scored.filter(col(scoreCol) >= minScore)
      .groupBy(col(idCol))
      .agg(max(struct(col(scoreCol).as("s"),
        (-col(matchCol)).as("negm"))).as("best"))
      .select(col(idCol), (-col("best.negm")).as(matchCol),
        col("best.s").as(scoreCol))

  /** Integer agreement weight for a string field: `exact` when equal,
    * otherwise `exact − perEdit · levenshtein`, floored at zero.
    */
  def editWeight(l: Column, r: Column, exact: Long, perEdit: Long): Column =
    greatest(lit(exact) - lit(perEdit) * levenshtein(l, r), lit(0L))

  /** Per-field survivorship rule for [[goldenRecords]]. */
  sealed trait Survivorship
  object Survivorship {
    /** The non-null value from the most-trusted source wins —
      * smallest `priorityCol`, value as the deterministic tie-break.
      * All-null fields survive as NULL.
      */
    final case class FirstNonNull(priorityCol: String) extends Survivorship
    /** Largest value wins (e.g. the freshest balance/timestamp). */
    case object MaxValue extends Survivorship
    /** Smallest value wins. */
    case object MinValue extends Survivorship
  }

  /** GOLDEN-RECORD consolidation — the merge/survivorship stage after
    * matching: every cluster of records describing one entity collapses
    * to a single best record, field by field, under explicit
    * survivorship rules. `FirstNonNull` is a min over
    * `struct(priority, value)` guarded by non-nullness (aggregate
    * null-skip does the "first non-null" part for free), so the whole
    * consolidation is ONE mergeable partial+final aggregate per
    * cluster — never a per-cluster window, the d15 discipline. Output:
    * cluster key, one column per ruled field, and `n_records`.
    */
  def goldenRecords(records: DataFrame, clusterCol: String,
                    rules: Seq[(String, Survivorship)]): DataFrame = {
    require(rules.nonEmpty, "goldenRecords: at least one field rule")
    val aggs = rules.map {
      case (f, Survivorship.MaxValue) => max(col(f)).as(f)
      case (f, Survivorship.MinValue) => min(col(f)).as(f)
      case (f, Survivorship.FirstNonNull(p)) =>
        min(when(col(f).isNotNull,
          struct(col(p).as("p"), col(f).as("v")))).as(s"__fnn_$f")
    } :+ count(lit(1)).as("n_records")
    val grouped = records.groupBy(col(clusterCol))
      .agg(aggs.head, aggs.tail: _*)
    val outs = col(clusterCol) +: rules.map {
      case (f, Survivorship.FirstNonNull(_)) => col(s"__fnn_$f.v").as(f)
      case (f, _)                            => col(f)
    } :+ col("n_records")
    grouped.select(outs: _*)
  }
}
