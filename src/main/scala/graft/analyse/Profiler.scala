package graft.analyse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the ANALYZE/data-audit pass a pipeline runs on a
  * new source before ingesting it: per column, row/null counts, exact
  * distinct cardinality, and min/max rendered as strings.
  *
  * Plan shape: ONE aggregate over one scan. The exact distinct counts
  * make Catalyst plan an Expand (each input row fans out once per
  * profiled column) — the standard multi-distinct plan; cost is
  * O(rows × profiled columns) with map-side partial aggregation, and
  * the scan reads only the profiled columns (pruning-friendly). For a
  * quick estimate at 100 TB swap `countDistinct` for
  * `approx_count_distinct` — kept exact here so the DuckDB oracle can
  * check it value-for-value.
  *
  * min/max cast to string AFTER aggregating in the native type (so
  * ordering is the column type's, not lexicographic). Profile bigint /
  * string / decimal columns for cross-engine string equality; raw
  * double rendering differs between engines.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c"))) :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`")
      .mkString(", ")
    row.selectExpr("__n",
        s"stack(${cols.size}, $stackArgs) AS (column, __nn, n_distinct, min_v, max_v)")
      .select(col("column"), col("__n").as("n_rows"),
        (col("__n") - col("__nn")).as("n_nulls"),
        col("n_distinct"), col("min_v"), col("max_v"))
  }

  /** Equi-width histogram of an INTEGER-valued column (callers quantise
    * money to cents etc. first) — the ANALYZE-histogram companion to
    * [[profile]]. Bin edges come from the data's own min/max; the bin
    * index `(c − mn) · bins div (mx − mn + 1)` is pure long arithmetic
    * (the +1 makes the max land in the last bin with no clamp), so
    * every count is engine-exact. Empty bins are absent by design —
    * zero-filling is a presentation concern.
    *
    * Scale shape: one min/max aggregate (mergeable, metadata-sized
    * result) broadcast back into a second mergeable count aggregate —
    * two narrow scans, two tiny shuffles, nothing data-dependent on
    * the driver.
    */
  def histogram(df: DataFrame, value: Column, bins: Int): DataFrame = {
    require(bins >= 1, "histogram: bins must be positive")
    val vals = df.select(value.cast("long").as("c"))
    val mm = vals.agg(min("c").as("mn"), max("c").as("mx"))
    vals.crossJoin(broadcast(mm))
      .select(expr(s"((c - mn) * $bins) DIV (mx - mn + 1)").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_rows"))
  }
}
