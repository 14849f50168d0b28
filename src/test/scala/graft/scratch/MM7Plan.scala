package graft.scratch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Multimodal
object MM7Plan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val sc = Multimodal.sceneChanges(Multimodal.videoAssetsFromDocuments(docs), 72L)
    println(sc.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
