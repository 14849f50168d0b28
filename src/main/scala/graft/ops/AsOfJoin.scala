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
  * on one task. For such key distributions use `asOfBucketed`, which
  * pre-partitions by (key, coarse time bucket) and carries the last
  * payload across bucket boundaries in a second, bucket-level pass
  * (spec-asserted equal to this form).
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

  /** Skew-safe as-of join: identical semantics to `asOf`, but the
    * row-level window runs per (key, time bucket) instead of per key,
    * so one pathological key's rows spread over `#buckets` tasks
    * instead of one. A second, bucket-LEVEL pass (O(#buckets) rows per
    * key, not O(#rows)) carries the last right row of earlier buckets
    * into buckets whose probe rows precede any local right row.
    *
    * Use when a key's row count can exceed what one task should sort;
    * `bucketSeconds` should be coarse enough that buckets are few
    * (thousands) and fine enough that one bucket's rows fit a task.
    */
  def asOfBucketed(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   payload: Seq[String], bucketSeconds: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    val structType = (p: String) =>
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", right.schema(p).dataType)))
    val l = left.select(
      (col(leftKey).as("__k") +: col(leftTime).as("__t") +: lit(0).as("__side") +:
        leftCols.map(col)) ++
        payload.map(p => lit(null).cast(structType(p)).as(s"__p_$p")): _*)
    val r = right.select(
      (col(rightKey).as("__k") +: col(rightTime).as("__t") +: lit(1).as("__side") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        payload.map(p => struct(col(p).as("v")).as(s"__p_$p")): _*)
    val u = l.unionByName(r)
      .withColumn("__b", floor(unix_micros(col("__t")) / (bucketSeconds * 1000000L)))
    // pass 1: row-level carry within each (key, bucket) — the heavy,
    // now-parallel part
    val wLocal = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = payload.foldLeft(u) { (df, p) =>
      df.withColumn(s"__c_$p", last(col(s"__p_$p"), ignoreNulls = true).over(wLocal))
    }
    // pass 2: bucket-level carry-in — per (key, bucket), the last right
    // row of any EARLIER bucket. Metadata-scale rows (buckets, not rows).
    val blAggs = payload.map(p => max_by(col(s"__p_$p"), col("__t")).as(s"__bl_$p"))
    val bucketLast = u.filter(col("__side") === 1)
      .groupBy(col("__k"), col("__b"))
      .agg(blAggs.head, blAggs.drop(1): _*)
    val allBuckets = u.select(col("__k"), col("__b")).distinct()
      .join(bucketLast, Seq("__k", "__b"), "left")
    val wBuckets = Window.partitionBy(col("__k")).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = payload.foldLeft(allBuckets) { (df, p) =>
      df.withColumn(s"__ci_$p", last(col(s"__bl_$p"), ignoreNulls = true).over(wBuckets))
    }.select(col("__k") +: col("__b") +: payload.map(p => col(s"__ci_$p")): _*)
    local.join(carryIn, Seq("__k", "__b"))
      .filter(col("__side") === 0)
      .select(leftCols.map(col) ++ payload.map(p =>
        coalesce(col(s"__c_$p"), col(s"__ci_$p")).getField("v").as(p)): _*)
  }
}
