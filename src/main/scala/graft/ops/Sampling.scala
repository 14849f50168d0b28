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

  /** Deterministic weight-based UPSAMPLING — the pretraining-mix epoch
    * recipe (per-source sampling proportions with fractional epochs): a
    * row of group g with per-mille weight w appears ⌊w/1000⌋ times,
    * plus one more iff its portable per-mille bucket falls below
    * w mod 1000 — so each group's realised multiplicity averages
    * exactly w/1000 epochs, weights below 1000 downsample (the
    * stratified-sample special case), and the repeated multiset is a
    * pure function of (id, weight): no RNG state, identical across
    * engines, runs and input layouts. `copyCol` (1-based) disambiguates
    * repeats for downstream keyed ops (e.g. sequence packing).
    *
    * Scale shape: a narrow codegen'd CASE + `explode(sequence(...))` —
    * zero shuffle, trivially parallel. For group maps too large for a
    * CASE, join a broadcast weights table instead — same semantics.
    */
  def upsampleByWeight(df: DataFrame, idCol: String, groupCol: String,
                       weightsPerMille: Map[String, Int],
                       defaultPerMille: Int = 1000,
                       copyCol: String = "copy"): DataFrame = {
    require(weightsPerMille.values.forall(_ >= 0) && defaultPerMille >= 0,
      "weights are per-mille multiplicities and cannot be negative")
    val w = weightsPerMille.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPerMille)) { case (acc, (k, v)) =>
        when(col(groupCol) === k, lit(v)).otherwise(acc)
      }
    val copies = (w.cast("long") / 1000L).cast("int") +
      when(bucketPerMille(col(idCol)) < pmod(w.cast("long"), lit(1000L)), 1).otherwise(0)
    df.withColumn("__n_copies", copies)
      .filter(col("__n_copies") > 0)
      .withColumn(copyCol, explode(sequence(lit(1), col("__n_copies"))))
      .drop("__n_copies")
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

  /** Per-domain document cap (the C4/web-crawl recipe: no single host
    * dominates the training mix): keep at most `k` rows per domain,
    * chosen by the portable md5 order of the id (a deterministic
    * uniform draw — NOT "first k seen", which would depend on scan
    * order) with the id itself as tiebreak. The selected set is
    * identical across runs, partitionings, and engines.
    *
    * Scale shape — per-key top-k is where a naive window dies on web
    * data: `row_number() OVER (PARTITION BY domain)` puts an entire hot
    * domain (a crawl can be 10% one host) into ONE task. Instead,
    * two-phase with a salt: phase 1 ranks within (domain, salt-bucket)
    * — ≤ saltBuckets tasks share a hot domain — and keeps ≤ k per
    * bucket; phase 2 ranks the ≤ k·saltBuckets survivors per domain.
    * Any row in a domain's global top-k is in its salt bucket's top-k
    * (a subset has no extra smaller keys), so the two-phase result is
    * exactly the one-phase result — asserted in `OpsSpec`, and the
    * final partition is bounded by k·saltBuckets rows regardless of
    * domain skew. The salt derives from the id (portable bucket), not
    * an RNG, so phase 1 is itself deterministic.
    */
  def domainCap(df: DataFrame, idCol: String, domainCol: String, k: Int,
                saltBuckets: Int = 32): DataFrame = {
    require(k > 0 && saltBuckets > 0, "domainCap: k and saltBuckets must be positive")
    import org.apache.spark.sql.expressions.Window
    val orderKey = md5(col(idCol).cast("string"))
    val local = Window.partitionBy(col(domainCol), bucket(col(idCol), saltBuckets))
      .orderBy(orderKey, col(idCol))
    val global = Window.partitionBy(col(domainCol)).orderBy(orderKey, col(idCol))
    df.withColumn("__rn", row_number().over(local)).filter(col("__rn") <= k)
      .withColumn("__rn", row_number().over(global)).filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Water-filling rebalance to a target training mix: the LARGEST
    * subsample whose group proportions exactly hit `targets` (up to
    * floor rounding), selected deterministically. The binding group is
    * kept whole(-ish); every other group is downsampled by the portable
    * md5 order to `floor(scale · target_g)` rows, where
    * `scale = min_g(count_g / target_g)` — the classic water-fill. A
    * target group absent from the data drives scale to 0 (an empty mix
    * is the honest answer to "40% of a language we have none of").
    *
    * Scale shape: the only driver-side data is one (group, count) pair
    * per TARGET group — the mix spec's own cardinality (a handful of
    * languages / sources), never the data's; the count aggregation is
    * map-side-combined and filtered to target groups before collecting.
    * Row selection reuses the salted two-phase top-k of [[domainCap]]
    * (per-group limit instead of a constant k), so a hot group spreads
    * across `saltBuckets` tasks and the final per-group partition is
    * bounded. Groups without a target are dropped (inner join with the
    * broadcast limit table), which is the contract: the mix defines the
    * output.
    */
  /** Append an inclusive `running_total` of `valueCol` over the total
    * order given by `sortCols` — THE distributed prefix sum, shared by
    * `tokenBudgetPrefix` and `Layout.shardLayout`.
    *
    * A bare `sum over (ORDER BY …)` window has no PARTITION BY, so
    * Spark moves the corpus through ONE task. Instead: range-partition
    * on the sort key (the same sampled-boundary Exchange a global sort
    * uses — partition p holds keys strictly before partition p+1),
    * compute per-partition running sums, and close the gap with
    * per-partition OFFSETS: the (#partitions)-row per-partition totals
    * collect to the driver, prefix-sum there, and broadcast-join back.
    * Driver state is metadata-scale; the output is partitioning-
    * INDEPENDENT because `sortCols` must be a total order — where the
    * range cuts fall can never change any row's running total.
    */
  def runningTotal(df: DataFrame, sortCols: Seq[Column],
                   valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val parallelism = spark.sparkContext.defaultParallelism
    val outCols = df.columns.map(col).toIndexedSeq
    val ranked = OpCaches.persist(
      df.repartitionByRange(parallelism, sortCols: _*)
        .withColumn("__pid", spark_partition_id()))
    // exclusive prefix offsets over the ≤ `parallelism` partition totals
    val totals = ranked.groupBy("__pid")
      .agg(sum(col(valueCol)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) =>
      (pid, acc + t)
    }.init.zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = spark.createDataFrame(offsets.toSeq)
      .toDF("__pid", "__offset")
    val w = Window.partitionBy("__pid")
      .orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.join(broadcast(offDf), Seq("__pid"))
      .withColumn("running_total",
        sum(col(valueCol)).over(w) + col("__offset"))
      .select(outCols :+ col("running_total"): _*)
  }

  /** Largest quality-ranked prefix of the corpus fitting a token
    * budget: order docs by `(rankCol DESC, idCol ASC)` and keep every
    * doc whose INCLUSIVE running token total stays ≤ `budget` — the
    * "best docs until the budget is spent" selection every
    * fixed-token-count training run needs. Distributed prefix sum via
    * `runningTotal`; output `(id, rank, tokens, running_total)`.
    */
  def tokenBudgetPrefix(df: DataFrame, idCol: String, rankCol: String,
                        tokensCol: String, budget: Long): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(rankCol).as("rank"),
      col(tokensCol).cast("long").as("tokens"))
    runningTotal(base, Seq(col("rank").desc, col("id")), "tokens")
      .filter(col("running_total") <= budget)
  }

  def mixRebalance(df: DataFrame, idCol: String, groupCol: String,
                   targets: Map[String, Double],
                   saltBuckets: Int = 32): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0.0),
      "mixRebalance: targets must be non-empty with positive weights")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val groups = targets.keys.toSeq
    val counts = df.filter(col(groupCol).isin(groups: _*))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // same double shapes as the SQL twin: n/w per group, min, scale·w
    val scale = targets.map { case (g, w) => counts.getOrElse(g, 0L).toDouble / w }.min
    val limits = targets.toSeq.map { case (g, w) => (g, math.floor(scale * w).toLong) }
    val limDf = broadcast(limits.toDF(groupCol, "__lim"))
    val orderKey = md5(col(idCol).cast("string"))
    val local = Window.partitionBy(col(groupCol), bucket(col(idCol), saltBuckets))
      .orderBy(orderKey, col(idCol))
    val global = Window.partitionBy(col(groupCol)).orderBy(orderKey, col(idCol))
    df.join(limDf, Seq(groupCol))
      .withColumn("__rn", row_number().over(local)).filter(col("__rn") <= col("__lim"))
      .withColumn("__rn", row_number().over(global)).filter(col("__rn") <= col("__lim"))
      .drop("__rn", "__lim")
  }
}
