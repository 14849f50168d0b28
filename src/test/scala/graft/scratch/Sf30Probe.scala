package graft.scratch

import org.apache.spark.sql.SparkSession

/** Output/candidate attribution for the sf10→sf30 anchor step: counts
  * d2's true near-dup pair set and er1's candidate volume (block-key
  * pair count) at a given fixture, so an over-3× wall ratio can be
  * pinned to true-output growth vs plan defect (the D5Sf10Probe
  * discipline at the third anchor).
  */
object Sf30Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf30")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val d2 = graft.GraftQueries.all("d2_minhash_lsh")(spark, dir).count()
    val er1 = graft.GraftQueries.all("er1_record_linkage")(spark, dir).count()
    // er1's TRUE candidate volume per blocking pass (dirty×clean rows
    // sharing the block key — the join's output before survivorship),
    // measured on the query's OWN keyed relations (`er1Keyed` — so the
    // dirty feed's 9→0 phone typos and 5→S name typos shape the key
    // space exactly as the join sees it) as Σ_k cnt_dirty(k)·cnt_clean(k)
    val (dirty, clean) = graft.GraftQueries.er1Keyed(spark, dir)
    def candVol(dk: String, ck: String): Double = {
      val d = dirty.groupBy(col(dk).as("k"))
        .agg(count(lit(1)).as("nd"))
      val c = clean.groupBy(col(ck).as("k"))
        .agg(count(lit(1)).as("nc"))
      d.join(c, "k")
        .agg(coalesce(sum(col("nd") * col("nc")), lit(0L)).cast("double"))
        .head().getDouble(0)
    }
    val phoneCand = candVol("d_blk_phone", "c_blk_phone")
    val nameCand = candVol("d_blk_name", "c_blk_name")
    println(f"[sf30probe] dir=$dir d2_pairs=$d2 er1_rows=$er1 " +
      f"er1_name_cands=$nameCand%.0f er1_phone_cands=$phoneCand%.0f")
    spark.stop()
  }
}
