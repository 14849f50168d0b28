package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join reduction: before a shuffle join, probe-side
  * rows whose key cannot exist on the build side are dropped AT THE SCAN,
  * so they never enter the join's Exchange.
  *
  * This is the classic big-data runtime-filter technique (Bloom 1970;
  * the same idea AQE's InjectRuntimeFilter rule applies automatically
  * when statistics allow): build a compact bit-sketch of the build
  * side's join keys with one distributed `treeAggregate` pass
  * (`DataFrameStatFunctions.bloomFilter`), broadcast it (the sketch is
  * `-n·ln(fpp)/ln²2` BITS — ~1.2 MB per million keys at 1% fpp, metadata
  * relative to the probe table), and filter the probe side with a
  * might-contain test. No false negatives, so the subsequent real join
  * sees every matching row; false positives are eliminated by the join
  * itself — output is row-identical to the plain join (spec-asserted).
  *
  * When it pays: the build side is too LARGE to broadcast as a hash-join
  * relation (rows with payload columns) but its KEY SET still sketches
  * small, and the probe side is much bigger than the post-filter
  * survivor set — the shuffle then moves only survivors. At 100 TB:
  * a 50M-key build side sketches to ~60 MB at 1% fpp (broadcastable);
  * beyond ~10⁸ keys raise `fpp` (the filter still pays at 10% fpp if
  * the probe's hit rate is low) or fall back to AQE's subquery-based
  * runtime filter. The probe-side reduction factor ≈ its true match
  * fraction + fpp.
  *
  * The might-contain test is a Scala UDF — a justified JVM kernel:
  * `BloomFilter.mightContainLong` is two xxhash probes into a broadcast
  * bitset with no per-row allocation, and Spark exposes no public
  * codegen expression for it (`BloomFilterMightContain` is internal to
  * the runtime-filter rule).
  */
object BloomJoin {

  /** Build a Bloom filter of `keyCol`'s values (long or string) with one
    * distributed pass. `expectedKeys <= 0` sizes the filter from a
    * single `approx_count_distinct` aggregate (±5%, metadata-scale).
    */
  def keyFilter(build: DataFrame, keyCol: String, fpp: Double = 0.01,
                expectedKeys: Long = -1L): BloomFilter = {
    val n = if (expectedKeys > 0) expectedKeys
    else math.max(64L,
      build.agg(approx_count_distinct(col(keyCol))).head().getLong(0))
    buildFilter(build, keyCol, n, fpp)
  }

  /** THE bloom constructor (d11 and `keyFilter` both route here): one
    * `treeAggregate` pass with an explicit zero sketch, because the
    * built-in `stat.bloomFilter` aggregate returns a null buffer on an
    * empty relation (NPE) — and an empty build side (first ingest, a
    * filter that matched nothing) is a legitimate input whose correct
    * answer is a filter that contains nothing. NULL keys are skipped,
    * matching `stat.bloomFilter`.
    */
  def buildFilter(build: DataFrame, keyCol: String,
                  expectedKeys: Long, fpp: Double): BloomFilter = {
    val zero = BloomFilter.create(math.max(expectedKeys, 64L), fpp)
    val keys = build.select(col(keyCol))
    val seqOp: (BloomFilter, org.apache.spark.sql.Row) => BloomFilter =
      keys.schema.head.dataType match {
        case LongType   => (bf, r) => { if (!r.isNullAt(0)) bf.putLong(r.getLong(0)); bf }
        case StringType => (bf, r) => { if (!r.isNullAt(0)) bf.putString(r.getString(0)); bf }
        case other => throw new IllegalArgumentException(
          s"bloom key must be long or string, got ${other.simpleString}")
      }
    keys.rdd.treeAggregate(zero)(seqOp, (a, b) => { a.mergeInPlace(b); a })
  }

  /** Inner equi-join with the probe side pre-filtered by a Bloom sketch
    * of the build side's keys. Row-identical to
    * `probe.join(build, probe(probeKey) === build(buildKey))`: the
    * filter admits every true match (no false negatives) and the join
    * removes the false positives. NULL probe keys are dropped by the
    * filter — the inner join would drop them anyway.
    *
    * `joinHint` (e.g. "merge") applies to the build side AT THE JOIN
    * ONLY — the sketch-building aggregates stay hint-free (a join hint
    * on a non-join subtree is a planner warning and a no-op).
    */
  def bloomFilteredJoin(probe: DataFrame, build: DataFrame,
                        probeKey: String, buildKey: String,
                        fpp: Double = 0.01,
                        joinHint: Option[String] = None): DataFrame = {
    val bf = keyFilter(build, buildKey, fpp)
    val buildSide = joinHint.fold(build)(build.hint(_))
    probe.filter(mightContain(probe, probeKey, bf))
      .join(buildSide, probe(probeKey) === buildSide(buildKey))
  }

  /** A `might contain` predicate Column over `keyCol`, keyed by type.
    * The broadcast rides the closure: Spark serialises the filter once
    * per executor, not per task (UDF closures are broadcast internally).
    */
  def mightContain(df: DataFrame, keyCol: String, bf: BloomFilter): org.apache.spark.sql.Column =
    df.schema(keyCol).dataType match {
      case LongType =>
        udf((k: java.lang.Long) => k != null && bf.mightContainLong(k))
          .apply(col(keyCol))
      case StringType =>
        udf((k: String) => k != null && bf.mightContainString(k))
          .apply(col(keyCol))
      case other =>
        throw new IllegalArgumentException(
          s"bloom key must be long or string, got ${other.simpleString}")
    }
}
