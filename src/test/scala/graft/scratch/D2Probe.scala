package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: stage-by-stage timing of the d2 minhash-LSH pipeline
  * to find where the ~5s at sf0.1 goes.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.scratch.D2Probe"
  */
object D2Probe {
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
      System.err.println(f"[d2] $label rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val docs = graft.sources.ParquetSource.normalizeNanoTimestamps(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    for (iter <- 1 to 2) {
      System.err.println(s"[d2] --- iter $iter ---")
      // mirror of Dedup.withShingles (private there)
      val sh = docs.select(col("doc_id").as("id"), col("text").as("t"))
        .repartition(spark.sparkContext.defaultParallelism, col("id"))
        .select(col("id"), graft.ops.Dedup.shingles(col("t"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      time("shingles")(sh.count())
      val exploded = sh.select(col("id"), explode(col("sh")).as("s"))
        .select(col("id"), xxhash64(col("s")).as("h"))
      time("explode+hash")(exploded.count())
      val bands = exploded.groupBy("id")
        .agg(graft.functions.MinHashBandsAgg(64, 4)(col("h")).as("bands"))
      time("minhash-agg")(bands.count())
      val cands = graft.ops.Dedup.minhashCandidates(sh, 64, 4)
      time("candidates")(cands.count())
      time("full")(graft.ops.Dedup.minhashNearDups(docs, "doc_id", "text", 0.8).count())
    }
    spark.stop()
  }
}
