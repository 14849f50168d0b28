package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range join without an equi key, made shuffle-joinable by
  * time-bucketing.
  *
  * Problem shape: count (or collect) right rows whose time falls in
  * `[leftTime, leftTime + window)` for every left row. Spark's only
  * native plan for a pure range predicate is a broadcast/cartesian
  * nested-loop join — O(|L|·|R|) comparisons. Bucketing by `window`-sized
  * epochs turns it into an equi join: a right row in bucket b can only
  * match left rows in buckets {b-1, b}, so each left row joins exactly
  * two buckets and the exact predicate filters the boundary spill. The
  * shuffle volume is |L|·2 + |R|, and the per-bucket fan-out is bounded
  * by the data's time density, not the table size.
  */
object RangeJoin {

  /** Per-left-row count of right rows in [leftTime, leftTime + windowSec).
    * Output: left row (all columns) + `n_in_range` (0 when none match).
    *
    * Two fan-out defences (both measured necessary at sf0.1, where the
    * naive form ran a 500M-row broadcast join on ONE task for ~2 min):
    *  - the right side is collapsed to one row per DISTINCT timestamp
    *    with its multiplicity before the join, so the join fan-out is
    *    bounded by distinct-times-per-bucket, not rows-per-bucket —
    *    time-series data repeats timestamps heavily (daily/hourly
    *    grain: 600k lineitems → 2.4k distinct ship days), and the worst
    *    case (all unique) costs one extra map-side-combined aggregate;
    *  - the left side is spread to full parallelism before the explode
    *    (the single-row-group fixture scan otherwise leaves the whole
    *    probe pipeline on one partition).
    * Timestamps are reduced to integer micros ONCE per side before the
    * join — the hot filter compares longs; the naive form paid an
    * NTZ→zoned conversion (an `Instant.atZone` allocation) per joined
    * row.
    */
  def countInRange(left: DataFrame, right: DataFrame,
                   leftTime: String, rightTime: String,
                   windowSec: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    val winMicros = windowSec * 1000000L
    // parquet NTZ timestamps: cast to session-zoned TIMESTAMP (identity
    // under the UTC session) so unix_micros applies
    val micros = (t: Column) => unix_micros(t.cast("timestamp"))
    // per-row id so duplicate left rows stay distinct outputs instead of
    // collapsing in the count aggregate (only needs uniqueness within
    // this one execution, which monotonically_increasing_id guarantees)
    val l = Partitioning.ensureParallelism(left)
      .withColumn("__rid", monotonically_increasing_id())
      .withColumn("__lm", micros(col(leftTime)))
      .withColumn("__lb", floor(col("__lm") / winMicros))
      .withColumn("__bucket", explode(array(col("__lb"), col("__lb") + 1)))
    val r = right
      .select(micros(col(rightTime)).as("__rm"))
      .groupBy("__rm").agg(count(lit(1)).as("__rn"))
      .withColumn("__bucket", floor(col("__rm") / winMicros))
    val matched = l.join(r, Seq("__bucket"), "left")
      .withColumn("__hits",
        when(col("__rm").isNotNull &&
          col("__rm") >= col("__lm") &&
          col("__rm") < col("__lm") + winMicros, col("__rn"))
          .otherwise(0L))
    // each matching right time is found via exactly one of the two
    // probed buckets (its own), so summing over both probe copies
    // counts every match once
    matched.groupBy((("__rid": String) +: leftCols).map(col): _*)
      .agg(sum(col("__hits")).as("n_in_range"))
      .drop("__rid")
  }
}
