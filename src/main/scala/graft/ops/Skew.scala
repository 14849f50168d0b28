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
    val salt = pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(numSalts))
    val phase1 = df.withColumn("__salt", salt)
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__cnt"),
        sums.map(s => sum(col(s.column)).as(s"__s_${s.as}")): _*)
    phase1.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__cnt")).as("n_rows"),
        sums.map(s => sum(col(s"__s_${s.as}")).as(s.as)): _*)
  }

  /** Skew-safe equi-join by differentiated salting (the classic manual
    * skew-join, for when the right side is too big to broadcast and AQE's
    * skew splitting can't apply — e.g. the join feeds an operator that
    * pins the partitioning): rows of the left (fact) side whose key is
    * HOT get a salt derived from a stable whole-row hash; the right
    * (dim) side replicates ONLY its hot-key rows across all salts. Cold
    * keys join exactly as before (salt 0 both sides), so the extra data
    * movement is `numSalts × hot-key dim rows` — tiny by construction —
    * while the hottest reducer shrinks by ~numSalts.
    *
    * Hot keys are found with one aggregate on the fact side, capped at
    * `maxHotKeys` by descending frequency (deterministic tiebreak on the
    * key), and attached to both sides as a broadcast-joined flag — the
    * hot set never leaves the cluster (no collect, no 10k-branch literal
    * `In` predicate in the plan; the broadcast is bounded by maxHotKeys
    * rows, and exchange reuse makes the two flag joins share one
    * broadcast). Inner join only; output equals the plain join
    * row-for-row (spec-asserted) because salting never changes which
    * (left, right) key pairs meet.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 numSalts: Int = 16, hotKeyThreshold: Long = 100000,
                 maxHotKeys: Int = 10000): DataFrame = {
    val hotKeys = broadcast(
      left.groupBy(col(key)).agg(count(lit(1)).as("__n"))
        .filter(col("__n") >= hotKeyThreshold)
        .orderBy(col("__n").desc, col(key))
        .limit(maxHotKeys)
        .select(col(key).as("__hot_key")))
    // left-outer against the distinct hot-key relation: no duplication,
    // __hot_key is null exactly when the key is cold
    def flagHot(df: DataFrame): DataFrame =
      df.join(hotKeys, col(key) === col("__hot_key"), "left_outer")
        .withColumn("__hot", col("__hot_key").isNotNull)
        .drop("__hot_key")
    val salted = flagHot(left).withColumn("__salt",
      when(col("__hot"), pmod(xxhash64(left.columns.toIndexedSeq.map(col): _*), lit(numSalts)))
        .otherwise(lit(0L)))
      .drop("__hot")
    val replicated = flagHot(right).withColumn("__salt",
      explode(when(col("__hot"), sequence(lit(0L), lit(numSalts - 1L)))
        .otherwise(array(lit(0L)))))
      .drop("__hot")
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
