package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means as the iterative-aggregate training loop —
  * Lloyd's algorithm lowered the same way pagerank and the perceptron
  * are: each round is ONE mergeable aggregate over the data (per-
  * cluster element-wise coordinate sums + counts), the k×dim centroid
  * table updates on the driver (k-bounded state), and the next round's
  * assignment embeds the new centroids as literals.
  *
  * Everything is INTEGER: features are integer vectors, distances are
  * exact integer sums of squares, assignment ties break by centroid
  * id, and the centroid update is the TRUNCATED integer mean
  * (`sum div count`, the quantise-once discipline) — so the entire
  * clustering trajectory is bit-reproducible under any partitioning
  * and a SQL twin replays it round for round. A cluster that loses all
  * members keeps its previous centroid (the standard carry-over
  * policy), identically in both engines.
  *
  * This complements `Similarity.lloyd` (driver-side, double-precision,
  * used to train IVF coarse quantizers on bounded samples): here the
  * DATA is the training set and the loop is distributed.
  */
object Clustering {

  /** Run `rounds` Lloyd iterations over integer feature vectors.
    *
    * `feats`: `(idCol, vecCol array<long>)`, all vectors the same
    * dimension. Initial centroids are the feature vectors of the `k`
    * LOWEST ids (deterministic seeding). Output, long format:
    * `(round, cid, dim, value)` — dims `0..d-1` carry the post-round
    * centroid coordinates, dim `-1` carries the cluster's member
    * count that round.
    */
  def kmeansInt(feats: DataFrame, k: Int, rounds: Int, dim: Int,
                idCol: String = "doc_id", vecCol: String = "fv"): DataFrame = {
    require(k >= 1 && rounds >= 1 && dim >= 1)
    val spark = feats.sparkSession
    val f = OpCaches.persist(Partitioning.ensureParallelism(
      feats.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))))
    // deterministic seeding: k lowest ids (k-bounded collect)
    val seed = f.orderBy("id").limit(k).collect()
      .map(r => r.getSeq[Long](1).toArray)
    require(seed.length == k, s"kmeansInt: need at least $k vectors")
    var cents: Array[Array[Long]] = seed
    val out = Seq.newBuilder[(Int, Int, Int, Long)]
    for (r <- 1 to rounds) {
      // assignment: exact integer distance to each centroid literal;
      // least over (dist, cid) structs = argmin with cid tiebreak
      val distStructs = cents.zipWithIndex.map { case (c, ci) =>
        val d2 = (0 until dim).map { i =>
          val diff = element_at(col("v"), i + 1) - lit(c(i))
          diff * diff
        }.reduce(_ + _)
        struct(d2.as("d"), lit(ci).as("cid"))
      }
      val assigned = f.withColumn("cid", least(distStructs: _*).getField("cid"))
      // one mergeable aggregate: per-cluster coordinate sums + count
      val aggCols = (0 until dim)
        .map(i => sum(element_at(col("v"), i + 1)).as(s"s$i")) :+
        count(lit(1)).as("n")
      val rows = assigned.groupBy("cid").agg(aggCols.head, aggCols.tail: _*)
        .collect() // k-bounded
      val byCid = rows.map(r0 => r0.getInt(0) -> r0).toMap
      cents = cents.zipWithIndex.map { case (old, ci) =>
        byCid.get(ci) match {
          case Some(row) =>
            val n = row.getLong(dim + 1)
            // floorDiv matches SQL's // for negative coordinate sums
            Array.tabulate(dim)(i => Math.floorDiv(row.getLong(i + 1), n))
          case None => old // empty cluster keeps its centroid
        }
      }
      for (ci <- 0 until k) {
        val n = byCid.get(ci).map(_.getLong(dim + 1)).getOrElse(0L)
        out += ((r, ci, -1, n))
        for (i <- 0 until dim) out += ((r, ci, i, cents(ci)(i)))
      }
    }
    import spark.implicits._
    spark.createDataset(out.result())
      .toDF("round", "cid", "dim", "value").coalesce(1)
  }
}
