package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13: does the affinity front end lose time to the fixture's
  * single-partition scans? A/B the cs (customer,supplier) distinct and
  * the full edges pipeline with and without ensureParallelism on the
  * fact-join probe side.
  */
object GAffinityProbe4 {
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
      println(f"[gaff4] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def tbl(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    tbl("lineitem").count()

    def edges(par: Boolean): org.apache.spark.sql.DataFrame = {
      val li0 = tbl("lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val li = if (par) graft.ops.Partitioning.ensureParallelism(li0) else li0
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
      val top3 = graft.functions.TopKByWeightAgg(3)
      shared.groupBy(col("u"))
        .agg(top3(col("shared"), col("v")).as("top"))
        .select(col("u").as("src"), explode(col("top")).as("dst"))
    }

    for (pass <- 1 to 5) {
      t(s"p$pass edges 1-part scan")(noop(edges(par = false)))
      graft.ops.OpCaches.releaseAll()
      t(s"p$pass edges ensurePar  ")(noop(edges(par = true)))
      graft.ops.OpCaches.releaseAll()
      if (pass == 1) {
        val a = edges(false).orderBy("src", "dst").collect().map(_.toSeq).toSeq
        graft.ops.OpCaches.releaseAll()
        val b = edges(true).orderBy("src", "dst").collect().map(_.toSeq).toSeq
        graft.ops.OpCaches.releaseAll()
        println(s"[gaff4] identical: ${a == b} (${a.size} rows)")
      }
    }
    spark.stop()
  }
}
