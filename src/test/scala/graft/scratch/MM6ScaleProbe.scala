package graft.scratch
import org.apache.spark.sql.SparkSession

/** Scratch measurement tool (round 10): root-causes mm6's sf1 ratio —
  * counts TRUE hamming-≤2 pairs of the 16-bin perceptual hash at both
  * SFs, plus the distinct-code count showing the 2^16 code space
  * saturating, and the mm10 64-bit aHash pair count on the same corpus
  * staying flat (the documented scale path).
  */
object MM6ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.ops.Multimodal
    for (dir <- Seq("/root/testdata/sf0.1", "/root/repo/target/sf1")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val assets = Multimodal.imageAssetsFromDocuments(docs)
      val n = docs.count()
      val ph16 = Multimodal.imagePerceptualHash(assets).persist()
      val codes16 = ph16.select("phash").distinct().count()
      val pairs16 = Multimodal.imageNearDups16(assets, maxDist = 2).count()
      val h64 = Multimodal.imageAHash64(assets).persist()
      val codes64 = h64.select("ahash64").distinct().count()
      // exact hamming-<=2 pairs on the 64-bit hash via 3-band
      // pigeonhole — DISJOINT bands (21/21/22 bits at shifts 0/21/42,
      // same as production imageNearDups64): overlapping bands would
      // let a pair differing exactly at a shared bit corrupt all three
      // bands and slip the count
      val bands = h64.select(col("asset_id"), col("ahash64"),
        explode(array((0 until 3).map { b =>
          val lo = b * 64 / 3
          val hi = (b + 1) * 64 / 3
          struct(lit(b).as("band"),
            shiftrightunsigned(col("ahash64"), lo)
              .bitwiseAND(lit((1L << (hi - lo)) - 1)).as("bv"))
        }: _*)).as("bd"))
        .select(col("asset_id"), col("ahash64"),
          col("bd.band").as("band"), col("bd.bv").as("bv"))
      val pairs64 = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
            col("x.asset_id") < col("y.asset_id"))
        .select(col("x.asset_id").as("a"), col("y.asset_id").as("b"),
          col("x.ahash64").as("ha"), col("y.ahash64").as("hb")).distinct()
        .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 2).count()
      println(s"$dir: docs=$n hash16[codes=$codes16 pairs<=2=$pairs16] " +
        s"hash64[codes=$codes64 pairs<=2=$pairs64]")
      ph16.unpersist(); h64.unpersist()
      graft.ops.OpCaches.releaseAll()
    }
    spark.stop()
  }
}
