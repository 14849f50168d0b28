package graft.scratch

import org.apache.spark.sql.SparkSession

/** Timing probe: d7 dup clusters end-to-end at the bench SF. */
object D7Probe {
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
    for (iter <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.GraftQueries.all("d7_dup_clusters")(spark, sfDir).count()
      System.err.println(f"[d7] iter$iter rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
