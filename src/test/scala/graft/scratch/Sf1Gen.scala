package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch fixture generator for the 100×-rehearsal (SCALING.md): an
  * ~sf1 dataset built by replicating the read-only sf0.1 fixture 10×
  * with re-keyed ids (offset 10⁹ per copy keeps every FK edge intact
  * within a copy and disjoint across copies — referential integrity by
  * construction). Document text gets a per-copy salt prefix (and a
  * recomputed n_chars) so the replicas are DISTINCT documents — exact
  * replication would hand the dedup family a 10×-duplicated corpus and
  * time the pathological case instead of the scaling case. Embedding
  * copies get a small per-(copy, dim) additive perturbation (round 11):
  * byte-identical copies hand every vector (copies−1) exact duplicates,
  * which would time the duplication artifact, not the scaling case.
  *
  * Output is scratch-only (target/sf1), never committed; seed recipe
  * per TESTDATA.md — the source fixture is read-only and untouched.
  */
object Sf1Gen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/target/sf1")
    val src = "/root/testdata/sf0.1"
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
      val copies = (0 until 10).map { i =>
        val shifted0 = keyCols.foldLeft(base)((d, c) => d.withColumn(c, col(c) + lit(i * OFF)))
        // per-copy embedding perturbation (round 11, matching Sf10Gen):
        // byte-identical copies hand every vector (copies-1) EXACT
        // duplicates, so pair/bucket queries time the duplication
        // artifact; the additive per-(copy, dim) shift keeps copies
        // distinct (cosine is scale-invariant, multiplicative won't do)
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
      copies.reduce(_.unionByName(_))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      System.err.println(s"[sf1gen] $name done")
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
