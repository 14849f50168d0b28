package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned data layout: write a table hive-partitioned by a derived
  * date column so time-bounded queries prune whole DIRECTORIES before
  * any file is opened.
  *
  * This is the other half of the scan-reduction story next to
  * `Bucketing`: row-group predicate pushdown (asserted for o7) still
  * reads every file's footer; partition pruning never lists the
  * excluded directories at all. At 100 TB with daily partitions, a
  * 7-day query touches 7/N of the data by construction — the
  * partition filter is resolved in the driver against catalog
  * metadata, independent of data volume. The derived `p_date` column
  * stays IN the data as well (`partitionBy` moves it to the path), so
  * readers see the same schema either way.
  */
object Layout {

  /** Write `df` date-partitioned on `to_date(tsCol)` at `path`. */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("p_date")
      .parquet(path)

  /** Read a partitioned layout back (partition column inferred). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Morton/Z-order value of two non-negative dimension columns:
    * interleave the low `bits` bits of each (x in even positions, y in
    * odd). Sorting or range-bucketing by this single value co-locates
    * rows that are close in BOTH dimensions — the multi-dimensional
    * clustering step behind ZORDER-style layout optimisation, which
    * turns two-sided range predicates into contiguous scan ranges.
    * Pure codegen'd shift/mask arithmetic (2×`bits` terms), identical
    * in any engine with integer bit ops — hence oracle-able.
    */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftrightunsigned(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Size-targeted shard assignment: walk the corpus in `sortCols`
    * order and cut a new output shard every `target` size units —
    * `shard = start_offset div target`, the sequential bin-packing
    * every "write ~N-token/~N-byte training shards in a stable order"
    * job needs. A row whose interval straddles a boundary belongs to
    * the shard its START offset falls in, so shard ids are a pure
    * function of the running total — computed with the SAME distributed
    * prefix sum as `Sampling.tokenBudgetPrefix` (range partition +
    * per-partition sums + metadata-scale offsets), never a single-task
    * global window.
    *
    * Output: the input columns + `(running_total, shard)`.
    */
  def shardLayout(df: DataFrame, sortCols: Seq[Column], sizeCol: String,
                  target: Long): DataFrame = {
    require(target > 0, s"shard target must be positive, got $target")
    // DIV, not `/`+cast: integral division stays exact past 2^53
    graft.ops.Sampling.runningTotal(df, sortCols, sizeCol)
      .withColumn("shard",
        expr(s"(running_total - $sizeCol) DIV ${target}L"))
  }
}
