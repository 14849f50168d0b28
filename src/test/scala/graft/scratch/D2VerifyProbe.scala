package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: isolate the verify stage of d2 (candidates → exact
  * Jaccard) to explain the full-vs-candidates gap seen in the bench.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.scratch.D2VerifyProbe"
  */
object D2VerifyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[d2v] $label rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val docs = graft.sources.ParquetSource.normalizeNanoTimestamps(
      spark.read.parquet(s"$sfDir/documents.parquet"))

    for (iter <- 1 to 3) {
      System.err.println(s"[d2v] --- iter $iter ---")
      // mirror minhashNearDups stage by stage, same persist
      val sh = graft.ops.OpCaches.persist(
        docs.select(col("doc_id").as("id"), col("text").as("t"))
          .repartition(spark.sparkContext.defaultParallelism, col("id"))
          .select(col("id"), graft.ops.Dedup.shingles(col("t"), 3).as("sh"))
          .filter(size(col("sh")) > 0))
      time("persist_sh")(sh.count())
      val cands = graft.ops.Dedup.minhashCandidates(sh, 64, 4)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("candidates")(cands.count())
      val ver = cands
        .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
        .filter(col("jaccard") >= 0.8)
        .select("id_a", "id_b", "jaccard")
      time("verify_only")(ver.count())
      time("full_fresh")(
        graft.ops.Dedup.minhashNearDups(docs, "doc_id", "text", 0.8).count())
      cands.unpersist()
      graft.ops.OpCaches.releaseAll()
    }
    spark.stop()
  }
}
