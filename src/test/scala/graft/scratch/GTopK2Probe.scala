package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the affinity top-3 selection round 13: the r12 collect_list +
  * sort_array + slice aggregate (unbounded per-group state, every
  * candidate crosses the exchange) vs the bounded TopKByWeightAgg
  * (partial keeps ≤3 entries per (group, map task) BEFORE the exchange).
  * Checks result identity and prints both plans' aggregate modes.
  */
object GTopK2Probe {
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
      println(f"[gtopk2] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    def tbl(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    tbl("lineitem").count()

    for (pass <- 1 to 5) {
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
      half.count() // materialize caches outside the timed region
      val shared = half.unionAll(
        half.select(col("v").as("u"), col("u").as("v"), col("shared")))

      val listEdges = shared
        .groupBy(col("u"))
        .agg(slice(sort_array(collect_list(struct((-col("shared")).as("ns"),
          col("v")))), 1, 3).as("top"))
        .select(col("u").as("src"), explode(col("top")).as("t"))
        .select(col("src"), col("t.v").as("dst"))
      t(s"p$pass collect_list")(listEdges.write.format("noop").mode("overwrite").save())

      val top3 = graft.functions.TopKByWeightAgg(3)
      val boundedEdges = shared
        .groupBy(col("u"))
        .agg(top3(col("shared"), col("v")).as("top"))
        .select(col("u").as("src"), explode(col("top")).as("dst"))
      t(s"p$pass bounded_topk")(boundedEdges.write.format("noop").mode("overwrite").save())

      if (pass == 1) {
        val a = listEdges.orderBy("src", "dst").collect().map(_.toSeq).toSeq
        val b = boundedEdges.orderBy("src", "dst").collect().map(_.toSeq).toSeq
        println(s"[gtopk2] identical: ${a == b} (${a.size} rows)")
        boundedEdges.explain("formatted")
      }
      graft.ops.OpCaches.releaseAll()
    }
    spark.stop()
  }
}
