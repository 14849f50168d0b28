package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fine stage attribution for affinityEdges at sf0.1: cs build alone,
  * pair join+aggregate alone (over persisted cs), window alone (over
  * persisted half). Steady-state mins over 5 passes.
  */
object GAffinityProbe3 {
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
    import org.apache.spark.sql.expressions.Window
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[gaff3] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    def tbl(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    tbl("lineitem").count(); tbl("orders").count()

    for (pass <- 1 to 5) {
      val li = tbl("lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val ords = tbl("orders").select(col("o_orderkey"), col("o_custkey"))
      val cs = graft.ops.OpCaches.persist(
        li.join(ords, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("sk")).distinct())
      t(s"p$pass 1.cs build+persist")(cs.write.format("noop").mode("overwrite").save())
      val half = graft.ops.OpCaches.persist(
        cs.as("a").join(cs.as("b"),
            col("a.c") === col("b.c") && col("a.sk") < col("b.sk"))
          .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
          .agg(count(lit(1)).as("shared")))
      t(s"p$pass 2.pair join+agg")(half.write.format("noop").mode("overwrite").save())
      val shared = half.unionAll(
        half.select(col("v").as("u"), col("u").as("v"), col("shared")))
      val top = Window.partitionBy(col("u"))
        .orderBy(col("shared").desc, col("v"))
      val edges = shared.withColumn("rn", row_number().over(top))
        .filter(col("rn") <= 3)
        .select(col("u").as("src"), col("v").as("dst"))
      t(s"p$pass 3.window top3")(edges.write.format("noop").mode("overwrite").save())
      if (pass == 1) {
        println("[gaff3] pair-join plan:")
        println(cs.as("a").join(cs.as("b"),
            col("a.c") === col("b.c") && col("a.sk") < col("b.sk"))
          .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
          .agg(count(lit(1)).as("shared"))
          .queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))
      }
      graft.ops.OpCaches.releaseAll()
    }
    spark.stop()
  }
}
