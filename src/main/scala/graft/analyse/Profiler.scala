package graft.analyse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.OpCaches

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
    // one aggregate subtree PER COLUMN, unioned into one action —
    // never the single multi-countDistinct aggregate: with k distinct
    // columns RewriteDistinctAggregates plans an Expand that replays
    // every row k+1 times through the shuffle (wide payload columns
    // ride each copy), where the per-column form shuffles each
    // column's own (pruned) values exactly once and the scheduler
    // overlaps the independent subtrees. Output rows, values and
    // column order are identical.
    cols.map { c =>
      df.select(col(c)).agg(
          count(lit(1)).as("__n"),
          count(col(c)).as("__nn"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_v"),
          max(col(c)).cast("string").as("max_v"))
        .select(lit(c).as("column"), col("__n").as("n_rows"),
          (col("__n") - col("__nn")).as("n_nulls"),
          col("n_distinct"), col("min_v"), col("max_v"))
    }.reduce(_ unionAll _)
  }

  /** DATA-MINIMISATION audit — the MINIMISER's "why are we even
    * storing this" report: per column, null saturation, distinct
    * cardinality and the modal value's share, with a `drop_candidate`
    * flag when a column is all-null, single-valued, or ≥ 99% one value
    * (storing it is all risk, no signal — the GDPR data-minimisation
    * principle turned into a mechanical check). Values audit through a
    * caller-supplied PORTABLE string rendering so the modal grouping
    * is engine-exact.
    *
    * Scale shape: one narrow `stack` unpivot, ONE shuffle keyed on
    * (column, rendered value) for the value counts, then a
    * column-keyed mergeable rollup — state is the value domain per
    * column, never the row count.
    */
  def minimisationAudit(df: DataFrame, tableName: String,
                        rendered: Seq[(String, Column)]): DataFrame = {
    require(rendered.nonEmpty, "minimisationAudit: no columns given")
    val stacked = df.select(explode(array(rendered.map { case (n, c) =>
      struct(lit(n).as("column_name"), c.cast("string").as("value"))
    }: _*)).as("kv")).select(col("kv.column_name"), col("kv.value"))
    val vc = stacked.groupBy("column_name", "value")
      .agg(count(lit(1)).as("c"))
    vc.groupBy("column_name")
      .agg(sum("c").as("n_rows"),
        sum(when(col("value").isNull, col("c")).otherwise(0L)).as("n_nulls"),
        count(when(col("value").isNotNull, lit(1))).as("n_distinct"),
        max(when(col("value").isNotNull, col("c")).otherwise(0L))
          .as("__top"))
      .select(lit(tableName).as("table_name"), col("column_name"),
        col("n_rows"), col("n_nulls"), col("n_distinct"),
        expr("(__top * 1000) DIV n_rows").as("top_share_pm"))
      .withColumn("drop_candidate",
        col("n_nulls") === col("n_rows") || col("n_distinct") <= 1 ||
          col("top_share_pm") >= 990)
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
  /** Benford expected first-digit frequencies, floor per-mille of
    * log10(1 + 1/d) — fixed constants, so no transcendental appears
    * in either engine.
    */
  val BenfordExpectedPm: Seq[(Int, Long)] = Seq(
    1 -> 301L, 2 -> 176L, 3 -> 124L, 4 -> 96L, 5 -> 79L,
    6 -> 66L, 7 -> 57L, 8 -> 51L, 9 -> 45L)

  /** Benford first-digit audit — the fraud / synthetic-data signal a
    * financial or generated column gets screened with: observed
    * first-significant-digit frequencies of a POSITIVE integer column
    * against Benford's law, deviations in integer per-mille with a
    * per-digit flag at 15‰. First digit comes from the decimal string
    * head (both engines render BIGINT identically), so no float log10
    * touches the data; the expected table is nine literals.
    *
    * Scale shape: one mergeable 9-group aggregate over the scan, the
    * total riding in as a broadcast single-row cross join, the
    * expected table a 9-row literal join — nothing data-dependent on
    * the driver.
    */
  def benford(df: DataFrame, value: Column): DataFrame = {
    val spark = df.sparkSession
    val counts = OpCaches.persist(
      df.select(value.as("__v")).filter(col("__v") > 0)
        .select(substring(col("__v").cast("string"), 1, 1)
          .cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_values")))
    val tot = broadcast(counts.agg(sum("n_values").as("n_total")))
    val expected = spark.createDataFrame(BenfordExpectedPm)
      .toDF("digit", "exp_pm")
    expected.join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n_values"))
      .crossJoin(tot)
      .withColumn("obs_pm",
        expr("CASE WHEN n_total > 0 THEN (n_values * 1000) DIV n_total END"))
      .withColumn("dev_pm", abs(col("obs_pm") - col("exp_pm")))
      .withColumn("flag_15", col("dev_pm") > 15)
      .select("digit", "n_values", "n_total", "obs_pm", "exp_pm",
        "dev_pm", "flag_15")
  }

  def histogram(df: DataFrame, value: Column, bins: Int): DataFrame = {
    require(bins >= 1, "histogram: bins must be positive")
    val vals = df.select(value.cast("long").as("c"))
    val mm = vals.agg(min("c").as("mn"), max("c").as("mx"))
    vals.crossJoin(broadcast(mm))
      .select(expr(s"((c - mn) * $bins) DIV (mx - mn + 1)").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_rows"))
  }
}
