package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for g1_supplier_rank at sf0.1: fact join + pair
  * aggregate vs the walk's probe/collect vs total, plus the join plan
  * (is the orders side broadcast?). Round-12 task: g1 ≤ 1.5s.
  */
object G1Probe {
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
      println(f"[g1probe] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    def tbl(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    // warm-up: parquet footers + codegen baseline
    tbl("lineitem").count(); tbl("orders").count()
    for (pass <- 1 to 3) {
      val li = tbl("lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val ords = tbl("orders").select(col("o_orderkey"), col("o_custkey"))
      val joined = li.join(ords, col("l_orderkey") === col("o_orderkey"))
      if (pass == 1) {
        val plan = joined.queryExecution.executedPlan.toString
        println("[g1probe] join plan head:\n" +
          plan.linesIterator.take(12).mkString("\n"))
      }
      t(s"p$pass fact join count")(joined.count())
      val e0 = joined.groupBy((col("o_custkey") * 2).as("a"),
        (col("l_suppkey") * 2 + 1).as("b")).agg(count(lit(1)).as("w"))
      t(s"p$pass pair agg count")(e0.count())
      val e0p = graft.ops.OpCaches.persist(e0)
      t(s"p$pass persist build")(e0p.count())
      val edges = e0p.select(col("a").as("src"), col("b").as("dst"), col("w"))
        .unionAll(e0p.select(col("b").as("src"), col("a").as("dst"), col("w")))
      t(s"p$pass union agg (walk probe)")(
        edges.agg(count(lit(1)), count(col("src")), count(col("dst")), count(col("w"))).head())
      t(s"p$pass union collect")(edges.selectExpr("cast(src as long)",
        "cast(dst as long)", "w").collect())
      // variant: pin the agg's shuffle width so AQE can't coalesce the
      // 585k-group final agg onto one thread (map output is only ~14MB)
      val kv = li.join(broadcast(ords), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      val e0r = kv.repartition(32, col("a"), col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w"))
      t(s"p$pass pair agg PINNED32")(e0r.count())
      if (pass == 3) println("[g1probe] pinned plan:\n" +
        e0r.queryExecution.executedPlan.toString.linesIterator.take(14).mkString("\n"))
      graft.ops.OpCaches.releaseAll()
      t(s"p$pass g1 full")(
        graft.GraftQueries.all("g1_supplier_rank")(spark, dir).count())
      graft.ops.OpCaches.releaseAll()
    }
    spark.stop()
  }
}
