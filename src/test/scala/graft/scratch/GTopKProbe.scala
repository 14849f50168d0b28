package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the affinity top-3 selection: row_number window over the
  * mirrored pair relation vs a mergeable collect_list + sort_array +
  * slice aggregate (partial aggregation applies; no full sort of the
  * mirrored relation). Checks result identity.
  */
object GTopKProbe {
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
      println(f"[gtopk] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
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

      val top = Window.partitionBy(col("u"))
        .orderBy(col("shared").desc, col("v"))
      val winEdges = shared.withColumn("rn", row_number().over(top))
        .filter(col("rn") <= 3)
        .select(col("u").as("src"), col("v").as("dst"))
      t(s"p$pass window")(winEdges.write.format("noop").mode("overwrite").save())

      // aggregate form: sort key (shared desc, v asc) == ascending
      // struct(-shared, v); shared >= 1 so negation is safe
      val aggEdges = shared
        .groupBy(col("u"))
        .agg(slice(sort_array(collect_list(struct((-col("shared")).as("ns"),
          col("v")))), 1, 3).as("top"))
        .select(col("u").as("src"), explode(col("top")).as("t"))
        .select(col("src"), col("t.v").as("dst"))
      t(s"p$pass aggregate")(aggEdges.write.format("noop").mode("overwrite").save())

      if (pass == 1) {
        val a = winEdges.orderBy("src", "dst").collect().map(_.toSeq).toSeq
        val b = aggEdges.orderBy("src", "dst").collect().map(_.toSeq).toSeq
        println(s"[gtopk] identical: ${a == b} (${a.size} rows)")
      }
      graft.ops.OpCaches.releaseAll()
    }
    spark.stop()
  }
}
