package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for the g2/g3/g4/g5 shared front end
  * (GraftQueries.affinityEdges): where do ~3s per graph query go at
  * sf0.1 — the (c,sk) distinct, the customer self-join + pair
  * aggregate, or the top-3 window? Also A/Bs the self-join pair
  * generation against a collect_set + double-explode formulation
  * (one shuffle of the (c,sk) relation instead of two join sides).
  */
object GAffinityProbe {
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
      println(f"[gaff] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    def tbl(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    tbl("lineitem").count(); tbl("orders").count() // warm-up

    for (pass <- 1 to 3) {
      def cs = {
        val li = tbl("lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val ords = tbl("orders").select(col("o_orderkey"), col("o_custkey"))
        li.join(ords, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("sk")).distinct()
      }
      t(s"p$pass cs distinct count")(cs.count())

      // current: self-join pair aggregate
      val halfJoin = cs.as("a").join(cs.as("b"),
          col("a.c") === col("b.c") && col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
        .agg(count(lit(1)).as("shared"))
      t(s"p$pass half(join) agg")(halfJoin.write.format("noop").mode("overwrite").save())

      // alternative: collect per-customer sorted supplier sets, emit
      // ordered pairs with a double explode, aggregate
      val sets = cs.groupBy("c").agg(sort_array(collect_set(col("sk"))).as("sks"))
      val halfExpl = sets
        .select(posexplode(col("sks")).as(Seq("i", "u")), col("sks"))
        .select(col("u"), explode(expr("slice(sks, i + 2, size(sks))")).as("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("shared"))
      t(s"p$pass half(explode) agg")(halfExpl.write.format("noop").mode("overwrite").save())

      if (pass == 1) {
        val a = halfJoin.orderBy("u", "v").collect().map(_.toSeq).toSeq
        val b = halfExpl.orderBy("u", "v").collect().map(_.toSeq).toSeq
        println(s"[gaff] identical half relations: ${a == b} (${a.size} rows)")
      }

      // full current plan: persist half, mirror, window
      val half = graft.ops.OpCaches.persist(halfJoin)
      val shared = half.unionAll(
        half.select(col("v").as("u"), col("u").as("v"), col("shared")))
      val top = Window.partitionBy(col("u"))
        .orderBy(col("shared").desc, col("v"))
      val edges = shared.withColumn("rn", row_number().over(top))
        .filter(col("rn") <= 3)
        .select(col("u").as("src"), col("v").as("dst"))
      t(s"p$pass full edges (join form)")(edges.write.format("noop").mode("overwrite").save())
      graft.ops.OpCaches.releaseAll()
    }
    spark.stop()
  }
}
