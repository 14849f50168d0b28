package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Commit-able plan evidence for the affinity top-3 restructure: the
  * graph-family FINALS are driver-walk LocalTableScans, so the
  * distributed front end's plan is dumped here directly — the r12
  * collect_list form vs the r13 bounded TopKByWeightAgg form, as
  * `plans/r13/affinity_edges_{before,after}.txt`.
  */
object AffinityPlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "plans/r13"
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
    val li = tbl("lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val ords = tbl("orders").select(col("o_orderkey"), col("o_custkey"))
    val cs = graft.ops.OpCaches.persist(
      li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sk")).distinct())
    val half = graft.ops.OpCaches.persist(
      cs.as("a").join(cs.as("b"),
          col("a.c") === col("b.c") && col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
        .agg(count(lit(1)).as("shared")))
    val shared = half.unionAll(
      half.select(col("v").as("u"), col("u").as("v"), col("shared")))

    val before = shared
      .groupBy(col("u"))
      .agg(slice(sort_array(collect_list(struct((-col("shared")).as("ns"),
        col("v")))), 1, 3).as("top"))
      .select(col("u").as("src"), explode(col("top")).as("t"))
      .select(col("src"), col("t.v").as("dst"))
    val top3 = graft.functions.TopKByWeightAgg(3)
    val after = shared
      .groupBy(col("u"))
      .agg(top3(col("shared"), col("v")).as("top"))
      .select(col("u").as("src"), explode(col("top")).as("dst"))

    new java.io.File(outDir).mkdirs()
    Files.writeString(Paths.get(s"$outDir/affinity_edges_before.txt"),
      before.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    Files.writeString(Paths.get(s"$outDir/affinity_edges_after.txt"),
      after.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    System.err.println("[affinityplan] wrote before/after")
    spark.stop()
  }
}
