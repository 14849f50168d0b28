package graft.scratch

import org.apache.spark.sql.SparkSession
import graft.ops.Similarity

/** Scratch probe: isolate d5 (blocked IVF-cell pair join) stage timing
  * from bench-order effects.
  */
object D5Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    for (iter <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = Similarity.cosineNearDupPairs(emb, threshold = 0.45).count()
      System.err.println(f"[d5] iter=$iter blocked rows=$n time=${(System.nanoTime()-t0)/1e9}%.2fs")
      val t1 = System.nanoTime()
      val n2 = Similarity.cosineNearDupPairsBroadcast(emb, threshold = 0.45).count()
      System.err.println(f"[d5] iter=$iter broadcast rows=$n2 time=${(System.nanoTime()-t1)/1e9}%.2fs")
    }
    spark.stop()
  }
}
