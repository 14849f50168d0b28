package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does g4_components spend its extra ~1.1s over g2 at sf0.1?
  * Times the affinity front end, the clusters edge build, the driver
  * union-find collect, and the final census separately.
  */
object G4Probe {
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
      println(f"[g4probe] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    val m = graft.GraftQueries.getClass.getDeclaredMethod(
      "affinityEdges", classOf[SparkSession], classOf[String])
    m.setAccessible(true)
    def edges = m.invoke(graft.GraftQueries, spark, dir)
      .asInstanceOf[org.apache.spark.sql.DataFrame]
    for (pass <- 1 to 4) {
      t(s"p$pass 1.affinity noop")(edges.write.format("noop").mode("overwrite").save())
      graft.ops.OpCaches.releaseAll()
      t(s"p$pass 2.clusters")(
        graft.ops.Dedup.clusters(edges, "src", "dst")
          .write.format("noop").mode("overwrite").save())
      graft.ops.OpCaches.releaseAll()
      t(s"p$pass 3.full g4")(
        graft.GraftQueries.g4Components(spark, dir)
          .write.format("noop").mode("overwrite").save())
      graft.ops.OpCaches.releaseAll()
    }
    spark.stop()
  }
}
