package graft.scratch

import org.apache.spark.sql.SparkSession

/** Scratch probe: time the anonymise-export pipeline repeatedly in one
  * JVM to separate inherent variance from order effects (GC, code cache).
  * Run: sbt "Test/runMain graft.scratch.ExportProbe"
  */
object ExportProbe {
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
    val nullOut = new java.io.Writer {
      override def write(cbuf: Array[Char], off: Int, len: Int): Unit = ()
      override def flush(): Unit = ()
      override def close(): Unit = ()
    }
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    for (i <- 1 to 5) {
      val gc0 = gcBeans.stream().mapToLong(_.getCollectionTime).sum()
      val t0 = System.nanoTime()
      val stats = graft.export.ExportPipeline.run(
        graft.sources.ParquetSource(spark, sfDir),
        graft.GraftQueries.exportConfig, graft.dialect.SqliteDialect, nullOut)
      val sec = (System.nanoTime() - t0) / 1e9
      val gcMs = gcBeans.stream().mapToLong(_.getCollectionTime).sum() - gc0
      System.err.println(f"[probe] iter=$i rows=${stats.rowsExported} time=$sec%.2fs gc=${gcMs}ms")
    }
    spark.stop()
  }
}
