package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for d3_simhash. */
object D3Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[d3] $label rows=$n time=${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    for (iter <- 1 to 2) {
      System.err.println(s"[d3] --- iter $iter ---")
      val sh = docs.select(col("doc_id").as("id"),
          graft.ops.Dedup.shingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .repartition(32, col("id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("shingle+persist")(sh.count())
      val sigs = graft.ops.Dedup.simhashSignatures(sh)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("signatures     ")(sigs.count())
      val pieceCols = (0 until 4).map(p =>
        shiftrightunsigned(col("sig"), p * 16).bitwiseAND(lit(0xffffL)))
      val pieces = sigs.select(col("id"), col("sig"),
        posexplode(array(pieceCols: _*)).as(Seq("piece_idx", "piece")))
      val cands = pieces.as("a").join(pieces.as("b"),
          col("a.piece_idx") === col("b.piece_idx") &&
          col("a.piece") === col("b.piece") &&
          col("a.id") < col("b.id"))
        .filter(bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) <= 3)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
      time("cands          ")(cands.count())
      time("full query     ")(graft.GraftQueries.all("d3_simhash")(spark, "/root/testdata/sf0.1").count())
      sh.unpersist(); sigs.unpersist()
    }
    spark.stop()
  }
}
