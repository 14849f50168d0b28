package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 11): time the PRODUCTION g1 path step by step at
  * bench settings. NOT shipped.
  */
object G1Probe3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[g1] $label: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    for (round <- 1 to 3) {
      println(s"[g1] --- round $round ---")
      val li = spark.read.parquet(s"$dir/lineitem.parquet").select("l_orderkey", "l_suppkey")
      val ords = spark.read.parquet(s"$dir/orders.parquet").select("o_orderkey", "o_custkey")
      val e0 = graft.ops.OpCaches.persist(
        li.join(ords, col("l_orderkey") === col("o_orderkey"))
          .groupBy((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
          .agg(count(lit(1)).as("w")))
      val edges = e0.select(col("a").as("src"), col("b").as("dst"), col("w"))
        .unionAll(e0.select(col("b").as("src"), col("a").as("dst"), col("w")))
      val e = graft.ops.OpCaches.persist(graft.ops.Partitioning.ensureParallelism(
        edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))))
      val cnts = t("agg 4 counts (cache build)")(
        e.agg(count(lit(1)), count(col("src")), count(col("dst")), count(col("w"))).head())
      import spark.implicits._
      val tup = t("typed collect")(
        e.select(col("src").cast("long"), col("dst").cast("long"), col("w"))
          .as[(Long, Long, Long)].collect())
      val probe = t("row collect")(e.collect())
      t("full pageRank via catalog") {
        graft.GraftQueries.g1SupplierRank(spark, dir).count()
      }
      println(s"[g1] n=${cnts.getLong(0)} tup=${tup.length} rows=${probe.length}")
      graft.ops.OpCaches.releaseAll()
    }
    spark.stop()
  }
}
