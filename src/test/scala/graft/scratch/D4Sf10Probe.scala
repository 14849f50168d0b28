package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level cost split of d4's count-join at sf10: shingle
  * materialisation, the chooser's df aggregate, and the pair join —
  * which of them carries the 10× step past linear.
  */
object D4Sf10Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d4probe] $label ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = graft.ops.OpCaches.persist(
      graft.ops.Dedup.withShingles(docs, "doc_id", "text", 3))
    val nDocs = t("shingles+persist+count")(sh.count())
    val ex = sh.select(col("id"), explode(col("sh")).as("s"))
    val exN = t("exploded count")(ex.count())
    val freq = ex.groupBy("s").agg(count(lit(1)).as("df_s"))
    val cand = t("df agg + cand sum")(
      freq.agg(sum(col("df_s") * (col("df_s") - 1) / 2)).first().getDouble(0))
    println(s"[d4probe] nDocs=$nDocs exploded=$exN candidates=$cand")
    val inter = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("i"))
    val nPairs = t("pair join+agg")(inter.count())
    println(s"[d4probe] candidate pair groups=$nPairs")
    spark.stop()
  }
}
