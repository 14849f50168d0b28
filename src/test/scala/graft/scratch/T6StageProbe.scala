package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: break t6_repetition into stages to find where the
  * 2-3.6s goes — the whole input is 5000 docs x ~300 chars at sf0.1,
  * so the honest cost should be well under a second.
  */
object T6StageProbe {
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
    import graft.ops.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[t6stage] $tag rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    for (iter <- 1 to 3) {
      System.err.println(s"--- iter $iter ---")
      time("scan_only")(docs.select("doc_id", "text").count())
      val base = docs.select(col("doc_id").as("id"), col("text").as("t"))
        .repartition(32, col("id"))
      time("repartition")(base.count())
      time("tokens_explode")(
        base.select(col("id"), explode(TextAnalysis.tokens(col("t"))).as("tok")).count())
      def tagged(n: Int) =
        transform(TextAnalysis.orderedShingles(col("t"), n),
          g => struct(lit(n).as("n"), g.as("g")))
      time("explode_tagged_123")(
        base.select(col("id"), explode(concat(tagged(1), tagged(2), tagged(3))).as("gr")).count())
      time("gram_agg")(
        base.select(col("id"), explode(concat(tagged(1), tagged(2), tagged(3))).as("gr"))
          .groupBy(col("id"), col("gr.n").as("n"), col("gr.g").as("g"))
          .agg(count(lit(1)).as("c")).count())
      time("full_t6")(TextAnalysis.gopherRepetition(docs).count())
    }
    spark.stop()
  }
}
