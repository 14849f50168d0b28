package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffle a table ONCE at write time so
  * every subsequent equi-join or aggregation on the bucket key runs
  * with no Exchange at all.
  *
  * This is the co-located-join primitive the 100 TB design leans on:
  * a fact table joined against the same key by N downstream queries
  * pays one bucketed write instead of N shuffles. Spark's native
  * parquet bucketing (hash(key) mod numBuckets, Hive-compatible
  * layout, no Hive dependency) records bucket metadata in the session
  * catalog; the optimizer then proves both sides of a same-key,
  * same-bucket-count join are co-partitioned and plans a zero-exchange
  * sort-merge join (`PlanSpec` asserts the Exchange-free plan).
  *
  * Sizing rule: pick numBuckets so one bucket ≈ one healthy task
  * (128-512 MB of parquet); at 100 TB that is O(100k) buckets, well
  * within catalog limits, and bucket-pruned point lookups get
  * O(1/numBuckets) scan reduction for free.
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted external parquet table
    * at `path`, registered as `table` in the session catalog.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCols: Seq[String], numBuckets: Int): Unit =
    df.write.format("parquet")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.drop(1): _*)
      .sortBy(bucketCols.head, bucketCols.drop(1): _*)
      .saveAsTable(table)

  /** The registered bucketed table, bucket metadata intact. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
