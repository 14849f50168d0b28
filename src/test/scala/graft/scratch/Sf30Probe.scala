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
    // with the exact key recipes the query uses: phones are injective
    // per custkey, but the NAME block (nation : name digits 13..18)
    // collides across ScaleGen's per-copy digit permutations — Σ cnt²
    // over the shared key space measures that growth
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    def sumSq(keyed: org.apache.spark.sql.DataFrame): Double =
      keyed.groupBy("k").count()
        .agg(sum(col("count") * col("count")).cast("double")).head().getDouble(0)
    val nameCand = sumSq(cust.select(concat(col("c_nationkey").cast("string"),
      lit(":"), substring(col("c_name"), 13, 6)).as("k")))
    val digits = lpad((col("c_custkey") * 7919L % 10000000000L).cast("string"), 10, "0")
    val phoneCand = sumSq(cust.select(concat(col("c_nationkey").cast("string"),
      lit(":"), substring(digits, 1, 3), lit("-"), substring(digits, 4, 3),
      lit("-"), substring(digits, 7, 2)).as("k")))
    println(f"[sf30probe] dir=$dir d2_pairs=$d2 er1_rows=$er1 " +
      f"er1_name_cands=$nameCand%.0f er1_phone_cands=$phoneCand%.0f")
    spark.stop()
  }
}
