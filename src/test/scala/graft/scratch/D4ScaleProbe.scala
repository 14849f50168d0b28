package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for SCALING.md: why d4_ngram_jaccard scales 13.9× on
  * the 10×-replicated sf1 fixture — true-pair growth vs plan failure.
  * Prints the output pair count and the chooser inputs (Σ df(df−1)/2
  * candidate volume) at both SFs, plus the prefix plan's time for
  * comparison.
  */
object D4ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.1", "/root/repo/target/sf1")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val sh = graft.ops.Dedup.withShingles(docs, "doc_id", "text", 3)
      val freq = sh.select(col("id"), explode(col("sh")).as("s"))
        .groupBy("s").agg(count(lit(1)).as("df_s"))
      val stats = freq.agg(
        count(lit(1)).as("distinct_sh"),
        sum(col("df_s")).as("occ"),
        sum(col("df_s").cast("double") * (col("df_s") - 1).cast("double") / 2.0).as("cand"))
        .first()
      println(s"$dir distinct=${stats.getLong(0)} occ=${stats.getLong(1)} " +
        f"count_plan_candidates=${stats.getDouble(2)}%.3g")
      def time(tag: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag pairs=$n time=${(System.nanoTime() - t0) / 1e9}%.1fs")
        graft.ops.OpCaches.releaseAll()
      }
      time("auto  ") { graft.ops.Dedup.ngramJaccardPairsAuto(
        docs, "doc_id", "text", threshold = 0.5).count() }
      time("prefix") { graft.ops.Dedup.ngramJaccardPairsPrefix(
        docs, "doc_id", "text", threshold = 0.5).count() }
    }
    spark.stop()
  }
}
