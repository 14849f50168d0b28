package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** PERSISTED incremental ingest-screen index: the maintained-artifact
  * form of `Dedup.bloomScreenNew`'s sketch. d11 rebuilds its bloom from
  * a history SCAN on every call; at 100 TB the right artifact is a
  * bloom that lives on disk and absorbs each accepted ingest
  * incrementally — history is then scanned ZERO times per batch
  * (it was scanned once, ever, at seeding).
  *
  * Contract: `screen(batch)` emits the batch rows whose normalised-text
  * fingerprint CERTAINLY has no match in everything ingested so far
  * (bloom miss ⇒ definitely new — a bloom has no false negatives), one
  * canonical row (min id) per batch fingerprint. A false POSITIVE
  * wrongly screens out a truly-new doc at rate ≤ fpp — the documented
  * trade for never touching history; route suspects to
  * `Dedup.minhashNearDupsIncremental` / `bloomScreenNew` when exactness
  * is required. `ingest(batch)` = screen + fold the EMITTED docs'
  * fingerprints into the sketch + rename-committed save.
  *
  * Layout under `dir`: `_META` (expectedItems, fpp — fixed at creation
  * because `BloomFilter.mergeInPlace` requires identical geometry) and
  * `bloom` (the sketch bytes, written to a hidden temp file and
  * RENAMED into place — the o24/KeyedTable commit pattern; single
  * maintenance writer assumed, like `KeyedTable.compact`).
  *
  * Scale: the sketch is `-n·ln(fpp)/ln²2` bits (~1.2 GB per 10⁹ docs at
  * 1% fpp) — driver + broadcast sized, not cluster-table sized. Batch
  * probes are a narrow filter (no join, no shuffle); the only shuffle
  * is the batch-sized canonical aggregate (the d15 min-struct recipe,
  * never a fingerprint window).
  */
final class ScreenIndex(spark: SparkSession, dir: String,
                        expectedItems: Long = 1L << 20,
                        fpp: Double = 0.01) {
  private val root = new Path(dir)
  private val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val metaPath = new Path(root, "_META")
  private val bloomPath = new Path(root, "bloom")

  /** (expectedItems, fpp) the index was CREATED with — later opens must
    * build merge-compatible batch sketches, so creation params win.
    */
  private def meta(): (Long, Double) =
    if (!fs.exists(metaPath)) (expectedItems, fpp)
    else {
      val in = fs.open(metaPath)
      val s = try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
      val Array(n, p) = s.trim.split(' ')
      (n.toLong, p.toDouble)
    }

  private def load(): Option[BloomFilter] =
    if (!fs.exists(bloomPath)) None
    else {
      val in = fs.open(bloomPath)
      try Some(BloomFilter.readFrom(in)) finally in.close()
    }

  private def commit(bf: BloomFilter): Unit = {
    fs.mkdirs(root)
    if (!fs.exists(metaPath)) {
      val (n, p) = meta()
      val out = fs.create(metaPath, true)
      try out.write(s"$n $p".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    val tmp = new Path(root, s".tmp-bloom-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try bf.writeTo(out) finally out.close()
    // single-writer update: the delete+rename window can lose a
    // concurrent reader's load (it reloads and finds the new sketch) but
    // never yields a torn file — the rename lands whole or not at all
    if (fs.exists(bloomPath)) fs.delete(bloomPath, false)
    if (!fs.rename(tmp, bloomPath)) {
      fs.delete(tmp, false)
      sys.error(s"ScreenIndex at $dir: failed to commit sketch")
    }
  }

  private def withFp(batch: DataFrame, textCol: String): DataFrame =
    Partitioning.ensureParallelism(batch)
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("__fph", xxhash64(col("__fp")))

  /** Certainly-new batch rows (bloom miss), one canonical (min id) row
    * per batch fingerprint — PURE: the index is not modified. An index
    * with no sketch yet screens nothing out (everything is new).
    */
  def screen(batch: DataFrame, idCol: String, textCol: String): DataFrame = {
    val outCols = batch.columns.map(col).toIndexedSeq
    val probed = withFp(batch, textCol)
    val fresh = load() match {
      case Some(bf) => probed.filter(!BloomJoin.mightContain(probed, "__fph", bf))
      case None     => probed
    }
    Dedup.exactCanonicalRows(fresh.drop("__fph"), idCol, col("__fp"))
      .select(outCols: _*)
  }

  /** Screen, then fold the emitted docs' fingerprints into the sketch
    * and commit it. EAGER (the sketch fold is an action); returns the
    * emitted rows (already computed — reading them again costs a
    * re-scan of the batch only).
    */
  def ingest(batch: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (n, p) = meta()
    val emitted = OpCaches.persist(screen(batch, idCol, textCol))
    val add = BloomJoin.buildFilter(
      emitted.select(xxhash64(TextAnalysis.fingerprint(col(textCol))).as("h")),
      "h", n, p)
    val merged = load() match {
      case Some(bf) => bf.mergeInPlace(add); bf
      case None     => add
    }
    commit(merged)
    emitted
  }
}
