package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Single-execution sf10 measurement of d5's exact cosine-threshold
  * join, with its true-output size: at τ = 0.45 and d = 64 the
  * random-pair match rate (~1e-5) makes the TRUE pair set grow ~n², so
  * the exact contract is output-bound at scale — this probe pins the
  * number the SCALING table's attribution rests on.
  */
object D5Sf10Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf10")
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
    val nVec = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val t0 = System.nanoTime()
    val out = graft.GraftQueries.all("d5_embedding_dups")(spark, dir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[d5probe] dir=$dir nVec=$nVec truePairs=$out time=$dt%.1fs")
    spark.stop()
  }
}
