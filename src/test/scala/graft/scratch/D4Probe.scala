package graft.scratch

import org.apache.spark.sql.SparkSession

/** Head-to-head timing: naive vs PPJoin-prefix n-gram Jaccard join. */
object D4Probe {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val nRows = f
      System.err.println(f"[d4] $label rows=$nRows time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    for (iter <- 1 to 2) {
      System.err.println(s"[d4] --- iter $iter ---")
      time("naive ")(graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5).count())
      // prefix pipeline, stage by stage (mirror of ngramJaccardPairsPrefix)
      val sh = docs.select(col("doc_id").as("id"), col("text").as("t"))
        .repartition(spark.sparkContext.defaultParallelism, col("id"))
        .select(col("id"), graft.ops.Dedup.shingles(col("t"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ex = sh.select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("s"))
      time("explode")(ex.count())
      val freq = ex.groupBy("s").agg(count(lit(1)).as("df_s"))
      time("freq   ")(freq.count())
      val ranked = ex.join(freq, "s")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("df_s"), col("s"))))
        .filter(col("rn") <= col("sz") - ceil(lit(0.5) * col("sz")) + lit(1))
        .select(col("id"), col("s"))
      time("ranked ")(ranked.count())
      val cands = ranked.as("a").join(ranked.as("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      time("cands  ")(cands.count())
      time("full   ")(graft.ops.Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 0.5).count())
      sh.unpersist()
    }
    spark.stop()
  }
}
