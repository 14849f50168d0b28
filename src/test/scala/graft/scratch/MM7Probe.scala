package graft.scratch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Scratch probe behind the round-9 ImageIO finding (MEASUREMENTS.md):
  * cold-path times for the mm7 scene-change chain and mm6 near-dup
  * pairs. With ImageIO's default disk-cached streams these swung 4-8s
  * per run (one temp FILE per encode/decode); with in-memory streams
  * (`Multimodal.imageIoMemInit`) they settle at ~0.7s / ~0.6s warm.
  */
object MM7Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(tag: String)(f: => Long): Unit = {
      for (i <- 1 to 4) {
        val t0 = System.nanoTime(); val n = f
        println(f"$tag run$i n=$n ${(System.nanoTime()-t0)/1e9}%.2fs")
      }
    }
    t("scenes ")(Multimodal.sceneChanges(
      Multimodal.videoAssetsFromDocuments(docs), 72L).count())
    t("mm6    ")(Multimodal.imageNearDups16(
      Multimodal.imageAssetsFromDocuments(docs)).count())
    spark.stop()
  }
}
