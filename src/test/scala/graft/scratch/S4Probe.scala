package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Scratch probe: PQ recall@10 vs brute force across (m, bits) settings. */
object S4Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val q = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(emb, q, k = 10).select("query_id", "neighbor_id")
      for ((m, bits) <- Seq((8, 4), (8, 6), (16, 4), (16, 6))) {
        val ann = Similarity.pqTopK(emb, q, k = 10, m = m, codebookBits = bits)
          .select("query_id", "neighbor_id")
        val hits = ann.join(exact, Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("h"))
        val rec = q.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"), coalesce(col("h"), lit(0L)).as("h"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
        println(s"$sf m=$m bits=$bits recalls@10: " +
          rec.map { case (qq, h) => s"$qq:${h / 10.0}" }.mkString(" "))
      }
    }
    spark.stop()
  }
}
