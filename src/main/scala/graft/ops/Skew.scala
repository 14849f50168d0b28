package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation by salting: split each hot key across
  * `numSalts` sub-keys, aggregate partially per (key, salt), then
  * combine per key. Identical results to a direct groupBy for any
  * decomposable aggregate (counts/sums here); the first shuffle's
  * largest partition shrinks by ~numSalts.
  *
  * Spark's map-side partial aggregation already handles *moderate* skew;
  * explicit salting is for keys so hot that even one reducer's final
  * merge is the straggler (and is what AQE's skew-join mitigation does
  * for joins, expressed here for aggregations).
  */
object Skew {

  final case class SumSpec(column: String, as: String)

  /** Two-phase salted count+sums per key. The salt is derived from a
    * stable hash of the whole row (not a random), keeping the pipeline
    * deterministic.
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], sums: Seq[SumSpec],
                numSalts: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(numSalts))
    val phase1 = df.withColumn("__salt", salt)
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__cnt"),
        sums.map(s => sum(col(s.column)).as(s"__s_${s.as}")): _*)
    phase1.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__cnt")).as("n_rows"),
        sums.map(s => sum(col(s"__s_${s.as}")).as(s.as)): _*)
  }
}
