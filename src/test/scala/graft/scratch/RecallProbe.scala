package graft.scratch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Scratch probe: measured recall@10 for every approximate ANN catalog
  * entry, at all three fixture SFs — used to raise each query's verdict
  * floor from the trivially-satisfied 0.2 to measured-minus-margin
  * (round-9 advice item; numbers recorded in MEASUREMENTS.md).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def recalls(name: String, ann: DataFrame, exact: DataFrame, q: DataFrame): Unit = {
      val hits = ann.join(exact, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("h"))
      val rs = q.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(coalesce(col("h"), lit(0L)).cast("double") / 10.0)
        .collect().map(_.getDouble(0))
      println(f"$name%-16s min=${rs.min}%.2f mean=${rs.sum / rs.length}%.2f")
      graft.ops.OpCaches.releaseAll()
    }

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      println(s"== $sf ==")
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val q = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(emb, q, k = 10)
        .select("query_id", "neighbor_id")

      recalls("s2_lsh", Similarity.lshTopK(emb, q, k = 10, bits = 4, probes = 8)
        .select("query_id", "neighbor_id"), exact, q)
      recalls("s4_pq", Similarity.pqTopK(emb, q, k = 10, m = 16, codebookBits = 6)
        .select("query_id", "neighbor_id"), exact, q)
      recalls("s7_ivfpq", Similarity.ivfPqTopK(emb, q, k = 10, nlist = 8, nprobe = 4,
        m = 16, codebookBits = 6).select("query_id", "neighbor_id"), exact, q)
      // round-10 headroom candidates (advice item 5): +nprobe / +table
      recalls("s7_ivfpq_p6", Similarity.ivfPqTopK(emb, q, k = 10, nlist = 8, nprobe = 6,
        m = 16, codebookBits = 6).select("query_id", "neighbor_id"), exact, q)
      recalls("s7_ivfpq_p7", Similarity.ivfPqTopK(emb, q, k = 10, nlist = 8, nprobe = 7,
        m = 16, codebookBits = 6).select("query_id", "neighbor_id"), exact, q)
      recalls("s7_ivfpq_m8", Similarity.ivfPqTopK(emb, q, k = 10, nlist = 8, nprobe = 6,
        m = 8, codebookBits = 8).select("query_id", "neighbor_id"), exact, q)
      recalls("s7_ivfpq_p7m8", Similarity.ivfPqTopK(emb, q, k = 10, nlist = 8, nprobe = 7,
        m = 8, codebookBits = 8).select("query_id", "neighbor_id"), exact, q)
      recalls("s17_graph_t4", Similarity.knnGraph(emb, k = 10, bits = 3, tables = 4)
        .select(col("src").as("query_id"), col("dst").as("neighbor_id")), exact, q)
      recalls("s9_rerank", Similarity.pqRerankTopK(emb, q, k = 10, shortlist = 50,
        m = 16, codebookBits = 6).select("query_id", "neighbor_id"), exact, q)
      recalls("s12_sq8", Similarity.sq8TopK(emb, q, k = 10)
        .select("query_id", "neighbor_id"), exact, q)
      recalls("s17_graph", Similarity.knnGraph(emb, k = 10, bits = 3, tables = 3)
        .select(col("src").as("query_id"), col("dst").as("neighbor_id")), exact, q)

      val idx = java.nio.file.Files.createTempDirectory("recall_ivf").toString
      graft.ops.VectorIndex.buildIvf(emb, idx, nlist = 64)
      recalls("s8_ivf64p8", graft.ops.VectorIndex.queryIvf(spark, idx, q, k = 10, nprobe = 8)
        .select("query_id", "neighbor_id"), exact, q)
      val idx2 = java.nio.file.Files.createTempDirectory("recall_ivf_inc").toString
      graft.ops.VectorIndex.buildIvf(
        emb.filter(pmod(col("vec_id"), lit(5)) =!= 0), idx2, nlist = 64)
      graft.ops.VectorIndex.appendIvf(
        spark, idx2, emb.filter(pmod(col("vec_id"), lit(5)) === 0))
      recalls("s11_append", graft.ops.VectorIndex.queryIvf(spark, idx2, q, k = 10, nprobe = 8)
        .select("query_id", "neighbor_id"), exact, q)
      recalls("s11_append_p16", graft.ops.VectorIndex.queryIvf(spark, idx2, q, k = 10, nprobe = 16)
        .select("query_id", "neighbor_id"), exact, q)
    }
    spark.stop()
  }
}
