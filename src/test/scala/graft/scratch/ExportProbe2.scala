package graft.scratch

import org.apache.spark.sql.SparkSession

/** o16 export tail attribution at sf0.1: distributed compute alone
  * (noop write of each table's rendered relation) vs the full
  * ExportPipeline.run (driver-funnelled toLocalIterator tail).
  */
object ExportProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[exp2] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    val src = graft.sources.ParquetSource(spark, dir)
    val cfg = graft.GraftQueries.exportConfig
    for (pass <- 1 to 4) {
      // compute-only: every table's retained+anonymised frame to noop
      t(s"p$pass compute-only noop") {
        for (p <- graft.export.ExportPipeline.plan(src, cfg)
             if !p.config.exists(_.truncate)) {
          val retained = src.scan(p.meta.name,
            p.config.map(_.retain).getOrElse(graft.config.RetainAll))
          val an = p.config.map(tc =>
            graft.anonymise.Anonymiser(retained, tc,
              graft.anonymise.Anonymiser.SeededDeterministic)).getOrElse(retained)
          an.write.format("noop").mode("overwrite").save()
        }
      }
      // full pipeline into a null sink
      t(s"p$pass full export") {
        val nullOut = new java.io.Writer {
          override def write(cbuf: Array[Char], off: Int, len: Int): Unit = ()
          override def flush(): Unit = ()
          override def close(): Unit = ()
        }
        graft.export.ExportPipeline.run(src, cfg,
          graft.dialect.SqliteDialect, nullOut,
          timestamp = () => "1970-01-01T00:00:00Z")
      }
      graft.ops.OpCaches.releaseAll()
    }
    spark.stop()
  }
}
