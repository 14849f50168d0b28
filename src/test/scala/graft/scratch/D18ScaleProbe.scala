package graft.scratch
import org.apache.spark.sql.SparkSession
object D18ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.1", "/root/repo/target/sf1")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = graft.ops.Dedup.ngramContainmentPairs(docs, "doc_id", "text", 0.8).count()
      println(s"$dir d18 true pairs = $n")
      graft.ops.OpCaches.releaseAll()
    }
    spark.stop()
  }
}
