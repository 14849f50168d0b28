package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate the driver-path probe cost in Dedup.clusters: the r12
  * head(bound+1) single pass vs the r13 count-then-collect gate, on the
  * d7-shaped pair pipeline (fresh persist per rep, as clusters sees it).
  */
object ClusterProbePerf {
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
    def tbl(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    tbl("lineitem").count()

    // d7-shaped pair relation: ~50k (a,b) long pairs
    def pairs0 = {
      val li = tbl("lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val ords = tbl("orders").select(col("o_orderkey"), col("o_custkey"))
      li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
        .filter(pmod(col("src") + col("dst"), lit(7L)) === 0)
    }

    val bound = 1 << 20
    for (pass <- 1 to 6) {
      var t0 = System.nanoTime()
      val ppA = graft.ops.OpCaches.persist(pairs0)
      val probe = ppA.head(bound + 1)
      val usedA = probe.length * 2L <= bound &&
        probe.forall(r => !r.isNullAt(0) && !r.isNullAt(1))
      println(f"[cprobe] p$pass head(bound+1)    ${(System.nanoTime() - t0) / 1e9}%.3fs rows=${probe.length} used=$usedA")
      graft.ops.OpCaches.releaseAll()

      t0 = System.nanoTime()
      val ppB = graft.ops.OpCaches.persist(pairs0)
      val cnt = ppB.count()
      val rows = if (cnt * 2 <= bound) ppB.collect() else Array.empty[org.apache.spark.sql.Row]
      println(f"[cprobe] p$pass count+collect   ${(System.nanoTime() - t0) / 1e9}%.3fs rows=${rows.length}")
      graft.ops.OpCaches.releaseAll()
    }
    spark.stop()
  }
}
