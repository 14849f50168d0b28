package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does g1_supplier_rank spend its time? NOT shipped. */
object G1Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet").select("l_orderkey", "l_suppkey")
    val ords = spark.read.parquet(s"$dir/orders.parquet").select("o_orderkey", "o_custkey")
    val e0 = li.join(ords, col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .agg(count(lit(1)).as("w"))
    t("e0 count")(println(e0.count()))
    val edges = e0.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionAll(e0.select(col("b").as("src"), col("a").as("dst"), col("w")))
    t("edges count")(println(edges.count()))
    val full = t("pageRank build")(graft.ops.Graph.pageRank(edges, iters = 3))
    t("pageRank run")(println(full.count()))
    t("pageRank run again")(println(full.count()))
    val out = full.filter(col("node").startsWith("s:"))
      .orderBy(col("rank_micro").desc, col("node")).limit(10)
    t("g1 full second action")(println(out.collect().length))
    t("g1 full third action")(println(out.collect().length))
    val one = graft.ops.Graph.pageRank(edges, iters = 1)
    t("1-iter run")(println(one.count()))
    graft.ops.OpCaches.releaseAll()
  }
}
