package graft.scratch

import org.apache.spark.sql.SparkSession

/** Dump d13/d14 executed plans for shuffle-shape review. */
object D13PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("d13_dup_spans", "d14_span_strip")) {
      val df = graft.GraftQueries.all(q)(spark, "/root/testdata/sf0.001")
      System.err.println(s"=== $q ===")
      System.err.println(df.queryExecution.executedPlan.toString.take(9000))
    }
    spark.stop()
  }
}
