package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - `bruteForceTopK`: exact top-k cosine for a (small, broadcast) query
  *    set against the full corpus — the scan side never shuffles
  *    (queries are broadcast, top-k is a per-query window).
  *  - `lshTopK`: random-hyperplane LSH (Charikar 2002) — bucket by the
  *    sign-bit signature and only score within matching (multi-probed)
  *    buckets. The scale path: candidate scoring cost drops by ~2^bits;
  *    approximate by design (recall measured against brute force in the
  *    test suite).
  *
  * Kernel note: scoring avoids `zip_with`/`aggregate` higher-order
  * folds (interpreted, ~100ns/element with boxing — dominates at
  * millions of pairs × 64 dims). The Column path uses the codegen'd
  * native expression `graft.functions.CosineSimilarity`; the pair-join
  * path uses a broadcast + per-partition JVM kernel. All fold
  * left-to-right in double — the evaluation order a SQL engine's
  * list_cosine_similarity uses — so results are bit-reproducible
  * cross-engine and across paths.
  */
object Similarity {

  /** Left-to-right double-precision cosine over float vectors.
    * Primitive-array parameters: a `Seq[Float]` UDF signature makes the
    * converter box every element (measured GC-bound at millions of
    * pairs); `Array[Float]` deserialises via `toFloatArray` unboxed.
    */
  def cosineKernel(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column form: the native codegen'd Catalyst expression
    * (`graft.functions.CosineSimilarity`) — bit-identical to
    * `cosineKernel` by construction.
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShims._
    toColumn(graft.functions.CosineSimilarity(toExpression(a), toExpression(b)))
  }

  /** Exact top-k neighbours for the query rows against the corpus.
    * Queries are broadcast (small by contract); ranking uses a window
    * partitioned by query with a deterministic (sim DESC, id) order.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"))
  }

  /** Deterministic pseudo-random hyperplanes: component [i][d] from a
    * splitmix64 stream — reproducible with no stored model.
    */
  def hyperplanes(bits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(bits, dim) { (i, d) =>
      val h = graft.anonymise.Faker.mix64(i.toLong * 1000003L + d + 1)
      h.toDouble / Long.MaxValue.toDouble
    }

  /** Sign-bit signature of a vector against precomputed hyperplanes. */
  def signatureKernel(planes: Array[Array[Double]])(v: Array[Float]): Long = {
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      var s = 0.0; var d = 0
      val n = math.min(p.length, v.length)
      while (d < n) { s += v(d) * p(d); d += 1 }
      if (s >= 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** ANN top-k: score only within the query's LSH bucket (plus Hamming-1
    * multi-probe buckets for recall). Approximate: candidates sharing no
    * probed bucket are missed — the price of dropping the cross join.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bits: Int = 12, probes: Int = 1, dim: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val planes = hyperplanes(bits, dim)
    val sigUdf = udf(signatureKernel(planes) _)
    val c = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .withColumn("bucket", sigUdf(col("cv")))
    // multi-probe: original bucket + Hamming-1 flips (probes ≤ bits)
    val probeBuckets = (sig: Column) =>
      concat(array(sig), transform(sequence(lit(0), lit(probes - 1)),
        i => sig.bitwiseXOR(call_function("shiftleft", lit(1L), i.cast("int")))))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket", explode(probeBuckets(sigUdf(col("qv")))))
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"))
  }

  /** IVF (inverted-file) ANN top-k: a coarse k-means quantizer assigns
    * every corpus vector to its nearest centroid cell; a query scores
    * only the vectors in its `nprobe` nearest cells. The other classic
    * ANN scale path next to LSH — better cell balance when the data IS
    * clustered, degrades gracefully to brute force as nprobe → nlist.
    * Composes Spark MLlib's KMeans (no custom training loop needed).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.ml.linalg.Vectors
    val toVec = udf((a: Array[Float]) =>
      Vectors.dense(a.map(_.toDouble)))
    val featured = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .withColumn("features", toVec(col("cv")))
    // Train the coarse quantizer on a bounded sample (the standard IVF
    // recipe: ~256 vectors per cell suffice) — k-means at maxIter=10
    // over the FULL corpus would be 10 extra whole-corpus passes at
    // 100 TB. Assignment below still covers every corpus vector.
    val trainSample = featured.select("features").limit(math.max(nlist * 256, 4096))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(nlist).setSeed(42L).setMaxIter(10)
      .fit(trainSample)
    val centroids = model.clusterCenters.map(_.toArray.map(_.toFloat))
    val assigned = model.transform(featured)
      .select(col("neighbor_id"), col("cv"), col("prediction").as("cell"))
    // query → its nprobe nearest cells by centroid cosine
    val probeCells = udf((qv: Array[Float]) =>
      centroids.zipWithIndex
        .map { case (c, i) => (i, cosineKernel(qv, c)) }
        .sortBy(-_._2).take(nprobe).map(_._1))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("cell", explode(probeCells(col("qv"))))
    val scored = assigned.join(broadcast(q), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"))
  }

  /** Exact cosine near-dup pairs (threshold join), for a corpus whose
    * (id, vector, norm) fits in executor memory: broadcast the corpus
    * once, stream the rows, and run the O(n²/2) scoring as a tight
    * per-partition loop with precomputed norms — zero allocation per
    * scored pair. (The DataFrame BNLJ form of this join deserialises
    * both arrays per pair and GC-thrashes at millions of pairs.)
    *
    * Beyond broadcastable size, use the LSH bucketing above as the
    * candidate generator with this same verify kernel.
    */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parallelism = spark.sparkContext.defaultParallelism
    val vecs = df.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
    val corpus = vecs.collect().sortBy(_._1)
    val norms = corpus.map { case (_, v) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((corpus, norms))
    vecs.repartition(parallelism).flatMap { case (ida, va) =>
      val (corp, ns) = bc.value
      var na = 0.0
      var i = 0
      while (i < va.length) { na += va(i).toDouble * va(i).toDouble; i += 1 }
      val sqna = math.sqrt(na)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var j = 0
      while (j < corp.length) {
        val (idb, vb) = corp(j)
        if (idb > ida) {
          var dot = 0.0
          var d = 0
          val n = math.min(va.length, vb.length)
          while (d < n) { dot += va(d).toDouble * vb(d).toDouble; d += 1 }
          val sim = dot / (sqna * ns(j))
          if (sim >= threshold) out += ((ida, idb, sim))
        }
        j += 1
      }
      out
    }.toDF("id_a", "id_b", "sim")
  }
}
