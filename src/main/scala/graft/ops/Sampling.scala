package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * The sampling decision is a pure function of the row's id (the
  * portable md5-bucket recipe also used by `q_train_split`), never of
  * partitioning, row order, or an RNG — so a re-run, a different
  * cluster size, or a different engine (the DuckDB oracle) selects the
  * IDENTICAL sample. `df.sample()` cannot promise any of that.
  */
object Sampling {

  /** Portable bucket (0 until modulus) of an id column: uniform,
    * engine-independent (md5 prefix, 15 hex chars < 2^63 so no sign
    * issues), stable across runs. THE single definition of the recipe —
    * q_train_split, d8's eval set, and p1's split all route through it
    * so the assignments can never drift apart (DuckDB twin:
    * `CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15)) AS BIGINT)
    * % modulus`).
    */
  def bucket(id: Column, modulus: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(modulus.toLong))

  /** Portable per-mille bucket (0–999) of an id column. */
  def bucketPerMille(id: Column): Column = bucket(id, 1000)

  /** Tag each row with whether the stratified sample keeps it: a row of
    * stratum `s` is kept iff bucket(id) < fractionsPerMille(s) —
    * integer per-mille fractions, so both engines compare exactly (a
    * double fraction × 1000 would round differently: Spark's cast
    * truncates, DuckDB's rounds).
    *
    * Scale shape: a narrow codegen'd CASE over the stratum column —
    * no shuffle, no RNG state, trivially parallel. For stratum maps too
    * large for a CASE (thousands of strata), join a broadcast
    * fractions table on the stratum column instead — same semantics.
    */
  def withSampleFlag(df: DataFrame, idCol: String, stratumCol: String,
                     fractionsPerMille: Map[String, Int],
                     defaultPerMille: Int = 0): DataFrame = {
    val frac = fractionsPerMille.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPerMille)) { case (acc, (k, f)) =>
        when(col(stratumCol) === k, lit(f)).otherwise(acc)
      }
    df.withColumn("sampled", bucketPerMille(col(idCol)) < frac.cast("long"))
  }

  /** The rows the stratified sample keeps. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractionsPerMille: Map[String, Int],
                       defaultPerMille: Int = 0): DataFrame =
    withSampleFlag(df, idCol, stratumCol, fractionsPerMille, defaultPerMille)
      .filter(col("sampled")).drop("sampled")

  /** Weighted sample WITHOUT replacement of exactly `k` rows —
    * Efraimidis–Spirakis A-ES (Inf. Process. Lett. 97(5), 2006): each
    * row draws key u^(1/w) with u uniform in (0,1) and the k largest
    * keys win, which selects each row with probability proportional to
    * its weight. The training-mix primitive: upweight quality-scored
    * documents without hard thresholds.
    *
    * Cross-engine caveat: the micro-unit quantisation makes the key
    * integral, but it is computed from `Math.log`, so bit-identity with
    * another engine (DuckDB's libm) rests on both libms agreeing to the
    * last ulp before `floor` — a 1-ulp difference exactly at a
    * quantisation boundary could flip one key and change the selected
    * set. Within Spark the result is fully deterministic (same libm);
    * the oracle fixture is green, but the quantisation itself does not
    * *guarantee* it for adversarial weights.
    *
    * Determinism: u derives from the portable md5 bucket of the id
    * (never an RNG), and the key is ranked as ln(u)/w quantised to
    * integer micro-units with the id as tiebreak — so the selected set
    * is identical across runs, partitionings, and engines (same recipe
    * as t9's integer micro-bits). Requires w > 0.
    *
    * Scale shape: a narrow codegen'd projection then a distributed
    * top-k (`TakeOrderedAndProject` — per-partition heaps, no global
    * sort, no shuffle of the losers). k must fit driver memory, which
    * a sample by definition does.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    val u = (bucket(col(idCol), 1000000000).cast("double") + lit(0.5)) / lit(1e9)
    // ln(u) < 0, so ln(u)/w is monotone in u^(1/w): rank DESC on it
    val key = floor(log(u) / col(weightCol) * lit(1000000L)).cast("long")
    df.withColumn("__wkey", key)
      .orderBy(col("__wkey").desc, col(idCol))
      .limit(k)
      .drop("__wkey")
  }
}
