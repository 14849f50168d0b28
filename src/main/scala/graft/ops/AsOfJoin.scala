package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the most recent right row with the same
  * key whose time is ≤ the left row's time.
  *
  * Spark has no native as-of join; the naive formulation (range-condition
  * join + per-left-row max) degenerates to a near-cross-product per key.
  * This implementation uses the merged-stream window pattern instead:
  * union both inputs tagged by side, sort within each key by (time,
  * side), and carry the last seen right-side ROW forward with
  * `last(_, ignoreNulls)` over an unbounded-preceding window. The
  * payload travels inside a single-field struct, so presence is keyed
  * on the row, not on the payload's nullability — a matching right row
  * whose payload value is NULL carries that NULL (DuckDB/pandas ASOF
  * semantics), it does not fall through to an older row. Cost: ONE
  * shuffle on the key and a sort within partitions — the same shape as
  * any windowed aggregation.
  *
  * Skew note: window partitions are NOT split by AQE (skew-join
  * splitting applies to joins only) — one pathological key still lands
  * on one task. If an as-of ever runs on such a key distribution,
  * pre-partition by (key, coarse time bucket) and carry the last
  * payload across bucket boundaries in a second, bucket-level pass.
  *
  * Tie semantics: a right row at exactly the left row's time matches
  * (`>=`), implemented by ordering right-side rows before left-side rows
  * at equal timestamps.
  */
object AsOfJoin {

  /** Right-side rows should be unique per (key, time) — when several
    * right rows share both, which payload is carried is unspecified
    * (pre-aggregate the right side, as `GraftQueries.qAsofJoin` does).
    *
    * @param left       probe side (e.g. events)
    * @param right      reference side (e.g. orders)
    * @param leftKey    join key column name on `left`
    * @param rightKey   join key column name on `right`
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payload    right-side columns to carry onto each left row
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // single-field struct wrapper: the struct is null exactly when the
    // row is a left (probe) row, so last(ignoreNulls) tracks right-ROW
    // presence and a null payload VALUE on the matching row is carried
    // as null instead of skipped
    val structType = (p: String) =>
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", right.schema(p).dataType)))
    val nullPayload = payload.map(p =>
      lit(null).cast(structType(p)).as(s"__p_$p"))
    val l = left.select(
      (col(leftKey).as("__k") +: col(leftTime).as("__t") +: lit(0).as("__side") +:
        leftCols.map(col)) ++ nullPayload: _*)
    val r = right.select(
      (col(rightKey).as("__k") +: col(rightTime).as("__t") +: lit(1).as("__side") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        payload.map(p => struct(col(p).as("v")).as(s"__p_$p")): _*)
    // right rows first at equal time → `>=` as-of semantics
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payload.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(s"__c_$p", last(col(s"__p_$p"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 0)
      .select(leftCols.map(col) ++ payload.map(p => col(s"__c_$p").getField("v").as(p)): _*)
  }
}
