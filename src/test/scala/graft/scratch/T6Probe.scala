package graft.scratch

import org.apache.spark.sql.SparkSession

/** Scratch probe: t6_repetition and d3_simhash isolated timing. */
object T6Probe {
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
    for (iter <- 1 to 3) {
      var t0 = System.nanoTime()
      val n1 = graft.GraftQueries.all("t6_repetition")(spark, "/root/testdata/sf0.1").count()
      System.err.println(f"[t6] iter=$iter rows=$n1 time=${(System.nanoTime()-t0)/1e9}%.2fs")
      t0 = System.nanoTime()
      val n2 = graft.GraftQueries.all("d3_simhash")(spark, "/root/testdata/sf0.1").count()
      System.err.println(f"[d3] iter=$iter rows=$n2 time=${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
