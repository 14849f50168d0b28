package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the current affinityEdges formulation against a parallelism-
  * fixed one: 32-way repartition of the single-row-group lineitem scan
  * before the orders join (broadcast), persist of the (c,sk) distinct
  * relation consumed by both self-join sides, same pair aggregate +
  * top-3 window. Checks result identity.
  */
object GAffinityProbe2 {
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
      println(f"[gaff2] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    def tbl(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    tbl("lineitem").count(); tbl("orders").count()

    def topEdges(half: org.apache.spark.sql.DataFrame) = {
      val h = graft.ops.OpCaches.persist(half)
      val shared = h.unionAll(
        h.select(col("v").as("u"), col("u").as("v"), col("shared")))
      val top = Window.partitionBy(col("u"))
        .orderBy(col("shared").desc, col("v"))
      shared.withColumn("rn", row_number().over(top)).filter(col("rn") <= 3)
        .select(col("u").as("src"), col("v").as("dst"))
    }

    def current = {
      val li = tbl("lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val ords = tbl("orders").select(col("o_orderkey"), col("o_custkey"))
      val cs = li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sk")).distinct()
      topEdges(cs.as("a").join(cs.as("b"),
          col("a.c") === col("b.c") && col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
        .agg(count(lit(1)).as("shared")))
    }

    def improved = {
      val li = graft.ops.Partitioning.ensureParallelism(
        tbl("lineitem").select(col("l_orderkey"), col("l_suppkey")))
      val ords = tbl("orders").select(col("o_orderkey"), col("o_custkey"))
      val cs = graft.ops.OpCaches.persist(
        li.join(broadcast(ords), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("sk")).distinct())
      topEdges(cs.as("a").join(cs.as("b"),
          col("a.c") === col("b.c") && col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
        .agg(count(lit(1)).as("shared")))
    }

    for (pass <- 1 to 7) {
      t(s"p$pass current")(current.write.format("noop").mode("overwrite").save())
      graft.ops.OpCaches.releaseAll()
      t(s"p$pass improved")(improved.write.format("noop").mode("overwrite").save())
      graft.ops.OpCaches.releaseAll()
      if (pass == 1) {
        val a = current.orderBy("src", "dst").collect().map(_.toSeq).toSeq
        graft.ops.OpCaches.releaseAll()
        val b = improved.orderBy("src", "dst").collect().map(_.toSeq).toSeq
        graft.ops.OpCaches.releaseAll()
        println(s"[gaff2] identical edges: ${a == b} (${a.size} rows)")
      }
    }
    spark.stop()
  }
}
