package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the ANN pair path's pooled recall and wall time per
  * (tables, probes) setting at one SF — the evidence behind
  * `cosineNearDupPairsAnn`'s multi-probe default. Recall contract
  * mirrors the d5_embedding_ann verdict: exact pairs touching the 50
  * probe docs via broadcast range search (linear), pooled recall of
  * the ANN relation over them. Usage:
  *   Test/runMain graft.scratch.D5AnnProbe <sfDir> [t:p t:p ...]
  */
object D5AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val settings: Seq[(Int, Int)] =
      (if (args.length > 1) args.drop(1).toSeq else Seq("8:0", "8:2"))
        .map { s => val Array(t, p) = s.split(":"); (t.toInt, p.toInt) }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val probes = emb.filter(col("vec_id") < 50)
    val exact = graft.ops.Similarity.rangeSearch(emb, probes, threshold = 0.35)
      .select(least(col("query_id"), col("neighbor_id")).as("id_a"),
        greatest(col("query_id"), col("neighbor_id")).as("id_b"))
      .distinct().cache()
    val nExact = exact.count()
    for ((t, p) <- settings; pass <- 0 to 1) {
      val t0 = System.nanoTime()
      val ann = graft.ops.Similarity.cosineNearDupPairsAnn(
        emb, threshold = 0.35, tables = t, probes = p)
      val nPairs = ann.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val found = exact.join(ann.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_semi").count()
      println(f"[d5ann] dir=$dir n=$n tables=$t probes=$p pass=$pass " +
        f"pairs=$nPairs recall=${found.toDouble / math.max(1, nExact)}%.3f " +
        f"(found=$found/exact=$nExact) time=$dt%.1fs")
    }
    spark.stop()
  }
}
