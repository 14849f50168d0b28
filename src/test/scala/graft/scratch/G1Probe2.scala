package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 11): g1 steady-state component breakdown at the
  * bench's local[32] settings. NOT shipped.
  */
object G1Probe2 {
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
      val n = t("count (cache build)")(e.count())
      val probe = t("collect")(e.collect())
      t("walk 3 iters") {
        val m = probe.length
        val index = new java.util.HashMap[Any, Integer](m * 2)
        val nodeVals = new scala.collection.mutable.ArrayBuffer[Any]
        def idxOf(a: Any): Int = {
          val got = index.get(a)
          if (got != null) got.intValue
          else { val i = nodeVals.length; index.put(a, i); nodeVals += a; i }
        }
        val srcI = new Array[Int](m); val dstI = new Array[Int](m); val w = new Array[Long](m)
        var p = 0
        while (p < m) { val r = probe(p); srcI(p) = idxOf(r.get(0)); dstI(p) = idxOf(r.get(1)); w(p) = r.getLong(2); p += 1 }
        val total = nodeVals.length
        val wsum = new Array[Long](total); var rank = new Array[Long](total)
        var i = 0
        while (i < m) { wsum(srcI(i)) += w(i); i += 1 }
        java.util.Arrays.fill(rank, 1000000L)
        for (_ <- 1 to 3) {
          val inflow = new Array[Long](total)
          var j = 0
          while (j < m) { inflow(dstI(j)) += rank(srcI(j)) * w(j) / wsum(srcI(j)); j += 1 }
          val next = new Array[Long](total)
          var k = 0
          while (k < total) { next(k) = 150000L + 85L * inflow(k) / 100L; k += 1 }
          rank = next
        }
        rank.length
      }
      println(s"[g1] edges=$n")
      graft.ops.OpCaches.releaseAll()
    }
    spark.stop()
  }
}
