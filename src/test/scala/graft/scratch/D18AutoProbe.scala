package graft.scratch
import org.apache.spark.sql.SparkSession

/** Scratch measurement tool (round 10): demonstrates WHICH branch the
  * d18 containment chooser (`Dedup.ngramContainmentPairsAuto`, budget
  * 1024 candidates/doc) takes per fixture, plus the measured candidate
  * volume behind the decision and the timed effect of the screen at
  * the sf1 step. Regenerate target/sf1 with `Test/runMain
  * graft.scratch.Sf1Gen` first.
  */
object D18AutoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
                    "/root/repo/target/sf1")) {
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        println(s"$dir: MISSING (run Sf1Gen)")
      } else {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val nDocs = docs.count()
        val sh = docs.select(col("doc_id"),
          graft.ops.Dedup.shingles(col("text"), 3).as("sh"))
          .filter(size(col("sh")) > 0)
        val cand = sh.select(explode(col("sh")).as("s"))
          .groupBy("s").agg(count(lit(1)).as("df"))
          .agg(sum(col("df").cast("double") * (col("df") - 1) / 2.0)).first().getDouble(0)
        val exceeds = graft.ops.Dedup.containmentExceedsBudget(
          docs, "doc_id", "text", 3, 1024)
        val t0 = System.nanoTime()
        val n = graft.ops.Dedup.ngramContainmentPairsAuto(
          docs, "doc_id", "text", 0.8).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"$dir: docs=$nDocs cand=$cand%.0f (${cand / nDocs}%.0f/doc) " +
          f"branch=${if (exceeds) "SCREEN" else "EXACT"} pairs=$n time=$secs%.1fs")
        graft.ops.OpCaches.releaseAll()
      }
    }
    spark.stop()
  }
}
