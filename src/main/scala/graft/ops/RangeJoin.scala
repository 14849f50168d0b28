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
    */
  def countInRange(left: DataFrame, right: DataFrame,
                   leftTime: String, rightTime: String,
                   windowSec: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    // parquet NTZ timestamps: cast to session-zoned TIMESTAMP (identity
    // under the UTC session) so unix_micros applies
    val micros = (t: Column) => unix_micros(t.cast("timestamp"))
    val bucket = (t: Column) => floor(micros(t) / (windowSec * 1000000L))
    // per-row id so duplicate left rows stay distinct outputs instead of
    // collapsing in the count aggregate (only needs uniqueness within
    // this one execution, which monotonically_increasing_id guarantees)
    val l = left
      .withColumn("__rid", monotonically_increasing_id())
      .withColumn("__lb", bucket(col(leftTime)))
      .withColumn("__bucket", explode(array(col("__lb"), col("__lb") + 1)))
    val r = right.select(col(rightTime).as("__rt"))
      .withColumn("__bucket", bucket(col("__rt")))
    val matched = l.join(r, Seq("__bucket"), "left")
      .withColumn("__hit",
        when(col("__rt").isNotNull &&
          col("__rt") >= col(leftTime) &&
          micros(col("__rt")) < micros(col(leftTime)) + windowSec * 1000000L, 1L)
          .otherwise(0L))
    // each matching right row is found via exactly one of the two probed
    // buckets (its own), so summing hits over both probe copies counts
    // every match once
    matched.groupBy((("__rid": String) +: leftCols).map(col): _*)
      .agg(sum(col("__hit")).as("n_in_range"))
      .drop("__rid")
  }
}
