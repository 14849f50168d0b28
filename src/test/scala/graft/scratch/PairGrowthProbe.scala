package graft.scratch

import org.apache.spark.sql.SparkSession

/** Recipe validation for [[ScaleGen]]: true pair-output counts of the
  * pair-producing families at sf0.1 vs the replicated fixture. With
  * content-distinct copies the count must grow ≈ linearly with the
  * copy count (cross-copy pairs ≈ 0); the old prefix-salt recipe grew
  * them quadratically (duplication artifact, round-9/10 probes).
  */
object PairGrowthProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.1", "/root/repo/target/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val keys = Seq("d5_embedding_dups", "d2_minhash_lsh", "d18_containment",
      "er1_record_linkage", "d4_ngram_jaccard", "mm10_ahash64", "d7_dup_clusters")
    for (k <- keys) {
      val counts = dirs.map { d =>
        val t0 = System.nanoTime()
        val n = graft.GraftQueries.all(k)(spark, d).count()
        graft.ops.OpCaches.releaseAll()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      val line = counts.map { case (n, t) => f"$n%d rows ($t%.1fs)" }.mkString("  vs  ")
      println(s"[pairgrowth] $k: $line")
    }
    spark.stop()
  }
}
