package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** df distribution head of the d4 shingle relation at a given SF —
  * is the count-join's candidate volume concentrated in a few shingle
  * keys (one SMJ task per key = straggler wall-clock)?
  */
object D4SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = graft.ops.Dedup.withShingles(docs, "doc_id", "text", 3)
    val freq = sh.select(explode(col("sh")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
      .withColumn("cand", col("df") * (col("df") - 1) / 2)
    freq.orderBy(col("df").desc).limit(20).show(20, false)
    freq.agg(sum("cand").as("total_cand"), max("df").as("max_df"),
        count(lit(1)).as("n_shingles")).show(false)
    val top = freq.orderBy(col("cand").desc).limit(100)
      .agg(sum("cand")).first().getDouble(0)
    println(s"[d4skew] top-100 shingles carry $top candidates")
    spark.stop()
  }
}
