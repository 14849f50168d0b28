package graft.scratch

import org.apache.spark.sql.SparkSession

/** Scratch probe: q_range_join at a given SF — count() (the bench
  * action) vs parquet write (the Verify action), with executed plans,
  * to explain the sf0.1 Verify hang.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.scratch.RangeJoinProbe"
  */
object RangeJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(f"[rj] $label time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val df = graft.GraftQueries.all("q_range_join")(spark, sfDir)
    System.err.println("[rj] ---- executed plan (count path) ----")
    time("count")(System.err.println(s"[rj] n=${df.count()}"))
    System.err.println(df.queryExecution.executedPlan.toString.take(4000))
    val out = "/tmp/rj_probe_out"
    val df2 = graft.GraftQueries.all("q_range_join")(spark, sfDir)
    time("write")(df2.write.mode("overwrite").parquet(out))
    System.err.println(df2.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
