package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for the d4 count-branch at sf0.1: shingle
  * build+persist, chooser pre-pass (freq agg + candidate sum + doc
  * count), main count-join, and the capPairsPerDoc tail. Where do
  * 3.0-3.5s go?
  */
object D4StageProbe {
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
      println(f"[d4probe] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    def tbl(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    tbl("documents").count()

    for (pass <- 1 to 4) {
      // mirror ngramJaccardPairsAuto's internals step by step
      val docs = tbl("documents")
      val parallelism = spark.sparkContext.defaultParallelism
      val sh = graft.ops.OpCaches.persist(
        docs.select(col("doc_id").as("id"), col("text").as("t"))
          .repartition(parallelism, col("id"))
          .select(col("id"), graft.ops.Dedup.shingles(col("t"), 3).as("sh"))
          .filter(size(col("sh")) > 0))
      t(s"p$pass 1.shingles persist")(sh.write.format("noop").mode("overwrite").save())
      val freq = graft.ops.OpCaches.persist(
        sh.select(col("id"), explode(col("sh")).as("s"))
          .groupBy("s").agg(count(lit(1)).as("df_s")))
      var cands = 0.0
      t(s"p$pass 2.freq+candSum") {
        val candRow = freq.agg(
          sum(col("df_s").cast("double") * (col("df_s") - 1).cast("double") / 2.0).as("c"))
          .first()
        cands = if (candRow.isNullAt(0)) 0.0 else candRow.getDouble(0)
      }
      var nDocs = 0L
      t(s"p$pass 3.shCount") { nDocs = sh.count() }
      // main count join (the branch taken at this SF)
      val ex = sh.select(col("id"), explode(col("sh")).as("s"))
      val perTask = 1.5e6
      val np = math.min(4096.0, math.max(parallelism.toDouble,
        math.ceil(cands / perTask))).toInt
      val exJ = ex.repartition(np, col("s"))
      val inter = exJ.as("a").join(exJ.as("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("i"))
      val sizes = sh.select(col("id"), size(col("sh")).as("n"))
      val out = inter
        .join(sizes.select(col("id").as("id_a"), col("n").as("na")), "id_a")
        .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
        .withColumn("jaccard",
          col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double"))
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
      t(s"p$pass 4.count-join main")(out.write.format("noop").mode("overwrite").save())
      if (pass == 1) println(s"[d4probe] cands=$cands nDocs=$nDocs np=$np")
      graft.ops.OpCaches.releaseAll()
    }
    spark.stop()
  }
}
