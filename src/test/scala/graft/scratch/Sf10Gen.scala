package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch fixture generator for the SECOND-decade rehearsal (round 11,
  * `SCALING.md`): an ~sf10 dataset — 100× the read-only sf0.1 fixture,
  * 10× the round-9 sf1 rehearsal — so the scaling story rests on two
  * measured decades instead of one. Same recipe as [[Sf1Gen]]: 100
  * re-keyed copies with id offsets of 10⁹ per copy (FK edges stay
  * within their copy — referential integrity by construction),
  * per-copy text salt prefixes (replicas are DISTINCT documents, so
  * the dedup family times the scaling case, not the pathological
  * 100×-duplicated corpus), embeddings byte-identical across copies
  * (noted in SCALING.md: ANN buckets denser than a real 100× corpus).
  *
  * Output is scratch-only (target/sf10, ~1.8 GB), never committed.
  */
object Sf10Gen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/target/sf10")
    val src = "/root/testdata/sf0.1"
    val copies = 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val OFF = 1000000000L

    def replicate(name: String, keyCols: Seq[String], saltText: Boolean = false,
                  perturbVec: Boolean = false): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val all = (0 until copies).map { i =>
        val shifted0 = keyCols.foldLeft(base)((d, c) => d.withColumn(c, col(c) + lit(i * OFF)))
        // per-copy embedding perturbation (round 11): byte-identical
        // copies give every vector 99 EXACT duplicates at 100×, so any
        // pair/bucket query times the duplication artifact, not the
        // scaling case (cosine is scale-invariant — a multiplicative
        // nudge would change nothing, hence the per-(copy, dim)
        // additive shift)
        val shifted = if (perturbVec && i > 0)
          shifted0.withColumn("embedding",
            transform(col("embedding"), (x, j) =>
              x + ((lit(i * 37) + j * 11) % 19 - lit(9)).cast("float") * lit(2e-4f)))
        else shifted0
        if (saltText && i > 0)
          shifted.withColumn("text", concat(lit(s"r$i "), col("text")))
            .withColumn("n_chars", length(col("text")).cast("long"))
        else shifted
      }
      all.reduce(_.unionByName(_))
        .repartition(64)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      System.err.println(s"[sf10gen] $name done")
    }

    for (t <- Seq("region", "nation"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate("documents", Seq("doc_id"), saltText = true)
    replicate("embeddings", Seq("vec_id"), perturbVec = true)
    spark.stop()
  }
}
