package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read keyed parquet table — the maintained-state SINK for a
  * streaming CDC upsert (the missing half of `Cdc.applyChangelog`:
  * that op merges a bounded changelog once; this table absorbs an
  * unbounded stream of them).
  *
  * Layout under `dir`:
  *  - `base-<gen>/`    parquet snapshot; committed generations carry a
  *    `_COMMITTED` marker, and the LIVE base is the max committed
  *    generation — commit is one atomic file CREATE, so there is no
  *    pointer-swap window and no dependence on rename-overwrite
  *    semantics (which Hadoop filesystems don't guarantee)
  *  - `delta=<batchId>/` one parquet dir per committed upsert batch
  *
  * Write protocol (single writer — the streaming query):
  *  - `upsert(df, batchId)` stages to a hidden temp dir, then RENAMES to
  *    `delta=<batchId>` — the rename is the commit point (the o24 dump
  *    sink's two-phase pattern). A replayed batch (restart from an old
  *    checkpoint) finds its delta already present and becomes a no-op:
  *    at-least-once delivery turns exactly-once by construction.
  *  - `compact()` folds the live base + the deltas it LISTED into
  *    `base-<gen+1>` (stamped with `_MAX_BATCH`, the highest batchId it
  *    contains), committed via the generation marker.
  *    Compaction deletes NOTHING: old generations and consumed deltas
  *    are immutable history, which is what makes `readAsOf` (time
  *    travel) possible. `vacuum()` is the explicit GC — it drops every
  *    generation except the live one and every delta the live base
  *    already contains, after which as-of reads below the compaction
  *    watermark fail loudly (the Delta VACUUM trade).
  *
  * Read protocol: `read()` = live base ∪ all deltas → latest row per
  * key, resolved by the LEXICOGRAPHIC MAX of `versionCols` (which must
  * totally order each key's rows — e.g. `(ts_us, event_id)`; base rows
  * carry a version below any live event, e.g. -1). Max-resolution makes
  * the merge IDEMPOTENT and COMMUTATIVE: re-applying any delta, in any
  * order, cannot change the result — which is what makes the crash
  * windows above (lingering consumed deltas, replayed batches) safe
  * without a transaction log. One hash shuffle on the key, no sort.
  *
  * Scale: reads shuffle base+deltas once on the key — at 100 TB the
  * base dominates, which is why `compact()` exists (run it when
  * #deltas grows, exactly Delta/Iceberg's minor-compaction cadence).
  * Object-store caveat: dir rename is not atomic on S3-style stores;
  * there the rename-commit needs an atomic-rename layer (HDFS, ABFS,
  * or a commit service), same as every rename-committed Spark sink.
  */
final class KeyedTable(spark: SparkSession, dir: String,
                       keyCols: Seq[String], versionCols: Seq[String]) {
  require(keyCols.nonEmpty && versionCols.nonEmpty)

  private val root = new Path(dir)
  private val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The live base: the max-generation dir carrying `_COMMITTED`. An
    * uncommitted generation (compaction crashed mid-write) is invisible
    * garbage, never a torn read.
    */
  private def liveBase(): Option[Path] = {
    val committed = listBases().filter(p => fs.exists(new Path(p, "_COMMITTED")))
    if (committed.isEmpty) None
    else Some(committed.maxBy(_.getName.stripPrefix("base-").toLong))
  }

  /** Commit a generation: one atomic marker CREATE — readers switch the
    * instant the marker exists.
    */
  private def commitGeneration(base: Path): Unit =
    fs.create(new Path(base, "_COMMITTED"), true).close()

  private def listDeltas(): Seq[Path] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("delta="))
      .sortBy(p => p.getName.stripPrefix("delta=").toLong)

  private def deltaId(p: Path): Long = p.getName.stripPrefix("delta=").toLong

  private def listBases(): Seq[Path] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("base-"))
      .sortBy(_.getName.stripPrefix("base-").toLong)

  /** Highest batchId folded into a base generation (-1: none). Written
    * INSIDE the generation dir before its `_COMMITTED` marker, so a
    * generation is never live without its watermark.
    */
  private def maxBatchOf(base: Path): Long = {
    val f = new Path(base, "_MAX_BATCH")
    if (!fs.exists(f)) -1L
    else {
      val in = fs.open(f)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  /** Multi-path parquet read with SCHEMA MERGING: an upsert batch may
    * carry columns the base generation predates (the lakehouse
    * schema-evolution path) — merging resolves the union schema, old
    * files surface added columns as NULL, and incompatible TYPE changes
    * fail loudly at read. Resolution is unaffected: versions lead the
    * max-struct, so NULL payload fields never decide a winner.
    */
  private def readMerged(paths: Seq[Path]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths.map(_.toString): _*)

  private def writeMaxBatch(base: Path, id: Long): Unit = {
    val out = fs.create(new Path(base, "_MAX_BATCH"), true)
    try out.write(id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Seed the table: write the initial snapshot as generation 0. */
  def initBase(df: DataFrame): Unit = {
    fs.mkdirs(root)
    val gen = "base-0"
    df.write.mode("overwrite").parquet(new Path(root, gen).toString)
    writeMaxBatch(new Path(root, gen), -1L)
    commitGeneration(new Path(root, gen))
  }

  /** Commit one upsert batch. Returns false (no-op) when `batchId` is
    * already committed — the streaming-restart replay path — or when it
    * sits at-or-below the live base's compaction watermark.
    *
    * The watermark case encodes the MONOTONIC-BATCHID contract: ids at
    * or below `_MAX_BATCH` were folded into the base (their deltas may
    * since be vacuumed), so under the contract such a call can only be
    * a replay, and a replay is a no-op. Writing the delta anyway would
    * create a directory `read()` permanently ignores while returning
    * true — silent row loss for a writer that (wrongly) reuses low ids
    * for NEW data, e.g. a stream restarted with a FRESH checkpoint
    * against an existing table, whose foreachBatch ids restart at 0.
    * Returning false tells that writer its rows were NOT applied.
    */
  def upsert(df: DataFrame, batchId: Long): Boolean = {
    require(!df.columns.contains(KeyedTable.TombstoneCol),
      s"${KeyedTable.TombstoneCol} is reserved — use delete()")
    commitDelta(df, batchId)
  }

  /** Commit a DELETE batch: `df` carries the key and version columns of
    * the rows to remove (payload columns, if present, are ignored). A
    * delete is just a write that must WIN the per-key version race —
    * the merge stays an idempotent/commutative last-writer-wins CRDT,
    * deletes included: a delete versioned below a concurrent upsert
    * loses, exactly like a stale upsert would.
    *
    * Tombstones are RETAINED through compaction (the Cassandra lesson:
    * folding a tombstone away too early lets a later lower-versioned
    * write resurrect the row), so post-compaction out-of-order writes
    * still lose to the tombstone's version. They drop out of reads in
    * [[resolve]]; their storage cost is bounded by the deleted-key
    * count and is reclaimed only when a future GC can prove no older
    * writer remains.
    */
  def delete(df: DataFrame, batchId: Long): Boolean = {
    val need = keyCols ++ versionCols
    require(need.forall(df.columns.contains),
      s"delete batch must carry ${need.mkString(", ")}")
    commitDelta(
      df.select(need.map(col): _*)
        .withColumn(KeyedTable.TombstoneCol, lit(true)), batchId)
  }

  private def commitDelta(df: DataFrame, batchId: Long): Boolean = {
    // `delta` is the commit layout's partition-encoding name and
    // `batch_id` the change feed's stamp: a payload column with either
    // name would silently corrupt partition discovery / feed reads —
    // reject at the write, where the mistake is fixable
    Seq("delta", "batch_id").foreach(c =>
      require(!df.columns.contains(c),
        s"column name '$c' is reserved by the KeyedTable commit layout"))
    val target = new Path(root, s"delta=$batchId")
    if (fs.exists(target)) return false
    if (batchId <= liveBase().map(maxBatchOf).getOrElse(-1L)) return false
    val tmp = new Path(root, s".tmp-delta-$batchId")
    if (fs.exists(tmp)) fs.delete(tmp, true) // leftover from a crashed attempt
    df.write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, true)
      sys.error(s"KeyedTable: failed to commit delta $batchId")
    }
    true
  }

  /** Streaming replication tail — the MAINTAINED form of
    * [[applyChanges]]: a `foreachBatch` sink over the PRIMARY's
    * [[changesStream]] applying each micro-batch's feed slice to THIS
    * table. A feed batch refused by the compaction watermark with no
    * matching delta on disk (`ApplyResult.divergent`) FAILS the stream
    * loudly — silent divergence is the one outcome a replication tail
    * must never allow. Replays (delta already present) are no-ops, so
    * the tail is safe under stream restarts and checkpoint loss alike:
    * idempotence comes from the commit layout, not the checkpoint.
    *
    * Caller runs the returned query (`processAllAvailable` for
    * catch-up, or leave it running for continuous replication).
    */
  def replicationStream(primary: KeyedTable,
                        payloadSchema: org.apache.spark.sql.types.StructType,
                        checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // a file stream reads a FIXED schema, but delete batches carry the
    // reserved tombstone column the payload schema predates — read the
    // union (upsert batches surface it as NULL, which never wins a
    // resolution), or every replicated delete resurrects as a live row
    val withTombstone =
      if (payloadSchema.fieldNames.contains(KeyedTable.TombstoneCol)) payloadSchema
      else payloadSchema.add(KeyedTable.TombstoneCol,
        org.apache.spark.sql.types.BooleanType)
    primary.changesStream(withTombstone).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (feed: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val res = applyChanges(feed)
        if (res.divergent)
          sys.error(s"KeyedTable replication at $dir: feed batches " +
            s"${res.watermarkSkipped.mkString(",")} were refused by the " +
            "compaction watermark without a matching delta — replica " +
            "diverged from the primary")
      }
      .start()
  }

  /** Latest row per key over base ∪ deltas — one key-shuffle, resolved
    * by max(struct(version..., payload...)). Version uniqueness per key
    * means payload fields never decide the max.
    */
  def read(): DataFrame = {
    val base = liveBase()
    require(base.nonEmpty, s"KeyedTable at $dir is empty — initBase first")
    // deltas at-or-below the base's watermark are already folded in;
    // re-reading them would be harmless (max-merge) but wasted IO
    val wm = base.map(maxBatchOf).getOrElse(-1L)
    val paths = base.toSeq ++ listDeltas().filter(deltaId(_) > wm)
    resolve(readMerged(paths))
  }

  /** The parquet inputs whose union resolves to the table as of
    * `batchId`: the newest committed generation at or below the
    * watermark plus the deltas in (watermark, batchId]. Fails loudly
    * when `vacuum()` has dropped the needed history.
    */
  private def asOfInputs(batchId: Long): Seq[Path] = {
    val candidates = listBases()
      .filter(p => fs.exists(new Path(p, "_COMMITTED")))
      .map(p => (p, maxBatchOf(p)))
      .filter(_._2 <= batchId)
    require(candidates.nonEmpty,
      s"KeyedTable at $dir: history before batch $batchId was vacuumed")
    val (base, wm) = candidates.maxBy(_._2)
    base +: listDeltas().filter(p => deltaId(p) > wm && deltaId(p) <= batchId)
  }

  /** Time travel: the table as of `batchId`. */
  def readAsOf(batchId: Long): DataFrame =
    resolve(readMerged(asOfInputs(batchId)))

  /** CDC between two as-of versions — the incremental-view-maintenance
    * primitive (the shape of Delta's `table_changes`, re-derived from
    * the rename-committed layout alone): one row per key whose RESOLVED
    * state differs between `readAsOf(fromBatchId)` and
    * `readAsOf(toBatchId)`, with `op` = 'I' (key absent at `from`) or
    * 'U' (state changed) and the post-image payload. Keys whose touched
    * deltas all LOSE the version race (a replayed or out-of-order batch
    * that changes nothing) are dropped — the diff is of states, not of
    * writes. 'D' cannot occur on this upsert-only table (as-of inputs
    * grow monotonically); the classification branch exists so a future
    * tombstone convention fails visible, not silent.
    *
    * Scale shape: the candidate keys are exactly the keys TOUCHED by
    * the deltas in (from, to] — delta-scale, not table-scale. Both
    * as-of unions are semi-joined down to those keys BEFORE the
    * group-by resolution, so the 100 TB base is scanned but only
    * touched-key rows ever shuffle; the old/new comparison join is
    * touched-key-scale on both sides.
    */
  def diff(fromBatchId: Long, toBatchId: Long): DataFrame = {
    require(fromBatchId < toBatchId,
      s"diff needs fromBatchId < toBatchId, got $fromBatchId >= $toBatchId")
    val oldInputs = asOfInputs(fromBatchId)
    val newInputs = asOfInputs(toBatchId)
    val touched = listDeltas()
      .filter(p => deltaId(p) > fromBatchId && deltaId(p) <= toBatchId)
    val template = readMerged(newInputs)
    val payload = template.columns
      .filterNot(keyCols.contains).filterNot(_ == KeyedTable.TombstoneCol).toSeq
    val outSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("op",
        org.apache.spark.sql.types.StringType, nullable = false) +:
        template.schema.fields.toIndexedSeq
          .filterNot(_.name == KeyedTable.TombstoneCol))
    if (touched.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    val keys = readMerged(touched)
      .select(keyCols.map(col): _*).distinct()
    def stateFor(paths: Seq[Path]): DataFrame = resolve(
      readMerged(paths)
        .join(broadcast(keys), keyCols, "left_semi"))
    val o = stateFor(oldInputs)
      .select(keyCols.map(col) ++ payload.map(c => col(c).as(s"__o_$c")): _*)
      .withColumn("__o_present", lit(true))
    val n = stateFor(newInputs)
      .select(keyCols.map(col) ++ payload.map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__n_present", lit(true))
    val oldStruct = struct(payload.map(c => col(s"__o_$c")): _*)
    val newStruct = struct(payload.map(c => col(s"__n_$c")): _*)
    o.join(n, keyCols, "full_outer")
      .filter(!(coalesce(col("__o_present"), lit(false)) &&
        coalesce(col("__n_present"), lit(false)) && (oldStruct <=> newStruct)))
      .select(
        when(col("__o_present").isNull, "I")
          .when(col("__n_present").isNull, "D")
          .otherwise("U").as("op") +:
          (keyCols.map(col) ++ payload.map(c => col(s"__n_$c").as(c))): _*)
  }

  /** The raw change feed (CDF): every committed delta row, stamped
    * with its `batch_id` — the other incremental primitive next to
    * [[diff]]. `diff` answers "how did resolved STATE change between
    * two versions"; `changes` hands a downstream incremental consumer
    * the WRITES themselves (the shape of Delta's change-data-feed
    * reads), which is what a derived aggregate or a replication tail
    * actually consumes.
    *
    * The batch id needs no extra column in the data: the commit layout
    * (`delta=<id>/`) IS a partition encoding, so partition discovery
    * against the table root recovers it for free — and a `batch_id`
    * predicate prunes whole delta directories at planning time, which
    * is exactly how an incremental consumer reads "only batches after
    * my cursor" without touching consumed history.
    *
    * History note: `compact()` keeps consumed deltas (time travel), so
    * the feed spans all history until `vacuum()` reclaims it; after a
    * vacuum the feed starts above the live base's watermark.
    */
  def changes(): DataFrame = {
    val deltas = listDeltas()
    require(deltas.nonEmpty, s"KeyedTable at $dir has no committed deltas")
    spark.read
      .option("basePath", root.toString)
      .option("mergeSchema", "true")
      .parquet(deltas.map(_.toString): _*)
      .withColumnRenamed("delta", "batch_id")
      // partition-type inference may size the id as int; pin the API
      // to long so batch and streaming feeds agree
      .withColumn("batch_id", col("batch_id").cast("long"))
  }

  /** Re-apply a change feed (the shape [[changes]] produces) to THIS
    * table — the replication tail: each distinct `batch_id` in the
    * feed commits as the same delta batch here, TOMBSTONES INCLUDED
    * (feed rows legitimately carry the reserved column, which is why
    * this path exists next to the guarded `upsert`). Same-id batches
    * are replay no-ops, so re-applying an overlapping feed slice is
    * safe — replication inherits the table's idempotence.
    *
    * The batch-id listing is a metadata-scale collect (one long per
    * committed batch); each batch's rows filter from the feed by a
    * `batch_id` predicate, which prunes to that one delta directory
    * when the feed comes straight from [[changes]].
    */
  def applyChanges(feed: DataFrame): KeyedTable.ApplyResult = {
    require(feed.columns.contains("batch_id"),
      "applyChanges expects a change feed (missing batch_id)")
    val ids = feed.select("batch_id").distinct()
      .collect().map(_.getLong(0)).sorted
    // commitDelta's Boolean conflates "delta already here" (safe
    // replay) with "below the compaction watermark" (possible silent
    // row loss); the result classifies each skip so a replication
    // tail can tell the two apart instead of diverging quietly
    val applied = Seq.newBuilder[Long]
    val replayed = Seq.newBuilder[Long]
    val skipped = Seq.newBuilder[Long]
    ids.foreach { b =>
      if (commitDelta(feed.filter(col("batch_id") === b).drop("batch_id"), b))
        applied += b
      else if (fs.exists(new Path(root, s"delta=$b")))
        replayed += b
      else
        skipped += b
    }
    KeyedTable.ApplyResult(applied.result(), replayed.result(), skipped.result())
  }

  /** Streaming twin of [[changes]]: a file-source stream over the
    * delta directories. The rename-commit protocol makes every delta
    * dir appear ATOMICALLY, so the source never lists a half-written
    * batch — the same property that makes the layout crash-safe makes
    * it stream-safe. `payloadSchema` is the delta row schema (file
    * streams require one up front); the `delta=<id>` partition column
    * surfaces as `batch_id`, exactly as in the batch feed.
    */
  def changesStream(payloadSchema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream
      .schema(payloadSchema.add("delta", org.apache.spark.sql.types.LongType))
      .option("basePath", root.toString)
      .parquet(new Path(root, "delta=*").toString)
      .withColumnRenamed("delta", "batch_id")

  /** Latest-per-key resolution INCLUDING winning tombstones — what
    * compaction folds into the next generation (a tombstone must keep
    * outversioning stragglers after the fold).
    */
  private def resolveFull(all: DataFrame): DataFrame = {
    val payload = all.columns.filterNot(keyCols.contains).toSeq
    require(versionCols.forall(payload.contains),
      "versionCols must be non-key columns")
    // versions lead the struct so they alone decide the lexicographic max
    val packed = versionCols ++ payload.filterNot(versionCols.contains)
    all.groupBy(keyCols.map(col): _*)
      .agg(max(struct(packed.map(col): _*)).as("__m"))
      .select(all.columns.toIndexedSeq.map(c =>
        if (keyCols.contains(c)) col(c) else col(s"__m.$c")): _*)
  }

  /** The READ view: resolution with tombstoned keys removed and the
    * tombstone column hidden.
    */
  private def resolve(all: DataFrame): DataFrame = {
    val r = resolveFull(all)
    if (!r.columns.contains(KeyedTable.TombstoneCol)) r
    else r.filter(!coalesce(col(KeyedTable.TombstoneCol), lit(false)))
      .drop(KeyedTable.TombstoneCol)
  }

  /** Fold the live base and the deltas present NOW into a new base
    * generation; the commit is the generation's `_COMMITTED` marker.
    * History is kept — `vacuum()` is the explicit GC.
    *
    * Compaction is designed SINGLE-WRITER; a best-effort writer lease
    * makes a second concurrent compactor FAIL LOUDLY instead of
    * silently racing the generation commit (two compactors computing
    * the same target generation could tear each other's staging dir).
    * The lease is `.compact-claim-<gen>` at the table root, taken by
    * RENAMING a token file into place (atomic-exclusive on HDFS-like
    * stores; last-wins on plain POSIX) and re-verified by token before
    * the commit steps. Even where the lease itself can
    * race (no atomic create-no-overwrite), the snapshot is staged in a
    * claimant-unique dir and RENAMED onto `base-<gen>` — at most one
    * rename lands, so a lost race is always a loud abort, never a torn
    * generation. A claimant that died leaves a stale lease, evicted
    * once older than `leaseTtlMs`.
    */
  def compact(leaseTtlMs: Long = 600000L): Unit = {
    val basePath = liveBase()
    val wm = basePath.map(maxBatchOf).getOrElse(-1L)
    val deltas = listDeltas().filter(deltaId(_) > wm)
    if (deltas.isEmpty) return
    val consumed = basePath.toSeq ++ deltas
    val gen = basePath
      .map(_.getName.stripPrefix("base-").toLong + 1).getOrElse(0L)
    val claim = new Path(root, s".compact-claim-$gen")
    val token = java.util.UUID.randomUUID().toString
    if (fs.exists(claim)) {
      val age = System.currentTimeMillis() - fs.getFileStatus(claim).getModificationTime
      if (age <= leaseTtlMs)
        sys.error(s"KeyedTable at $dir: another compactor holds generation $gen " +
          s"(lease age ${age}ms <= ttl ${leaseTtlMs}ms) — refusing to race it")
      fs.delete(claim, false) // dead claimant: evict the stale lease
    }
    // claim by RENAME, not create-no-overwrite: a failed exclusive
    // create is not side-effect-free everywhere (local ChecksumFileSystem
    // truncates the .crc sidecar before the data-stream create throws,
    // corrupting the winner's claim reads), while a rename either lands
    // whole or leaves no trace. HDFS rename-to-existing fails → clean
    // loss; a POSIX rename last-wins → the ownership re-reads below
    // arbitrate to a single winner either way.
    locally {
      val tmp = new Path(root, s".claim-tmp-$token")
      val out = fs.create(tmp, true)
      try out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, claim)) {
        fs.delete(tmp, false)
        sys.error(s"KeyedTable at $dir: lost the compaction claim race for " +
          s"generation $gen")
      }
    }
    // ownership = our token is (still) the claim's content. A loser must
    // NEVER delete the winner's claim, so every release is guarded by an
    // ownership check (best-effort: check-then-delete, not atomic).
    def ownsClaim(): Boolean =
      try {
        val in = fs.open(claim)
        val tok = try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
        tok == token
      } catch { case _: java.io.IOException => false }
    if (!ownsClaim())
      sys.error(s"KeyedTable at $dir: compaction claim for generation $gen was " +
        "overwritten by a concurrent compactor — aborting")
    try {
      val newBase = new Path(root, s"base-$gen")
      // a crashed predecessor may have renamed its snapshot into place
      // but died before committing: uncommitted → invisible to readers →
      // safe to clear under the lease
      if (fs.exists(newBase) && !fs.exists(new Path(newBase, "_COMMITTED")))
        fs.delete(newBase, true)
      // stage to a CLAIMANT-UNIQUE dir: even if the lease races on a
      // filesystem without atomic create-no-overwrite, two compactors
      // never write into the same directory, and the rename below is
      // the final arbiter — at most one rename onto base-<gen> can
      // succeed (rename-no-overwrite), so at most one generation lands
      val staging = new Path(root, s".tmp-base-$gen-$token")
      resolveFull(readMerged(consumed))
        .write.mode("overwrite").parquet(staging.toString)
      writeMaxBatch(staging, deltas.map(deltaId).max)
      if (!ownsClaim()) {
        fs.delete(staging, true)
        sys.error(s"KeyedTable at $dir: compaction claim for generation $gen " +
          "changed hands mid-write — aborting without committing")
      }
      if (!fs.rename(staging, newBase)) {
        fs.delete(staging, true)
        sys.error(s"KeyedTable at $dir: another compactor landed base-$gen " +
          "first — aborting")
      }
      commitGeneration(newBase)
    } finally if (ownsClaim()) fs.delete(claim, false)
  }

  /** GC all history the live base supersedes: every other generation
    * and every delta at-or-below the live watermark. After this,
    * `readAsOf` below the watermark fails (the Delta VACUUM trade).
    *
    * Also sweeps compactor debris no run can ever use again: orphaned
    * `.claim-tmp-*` token files, and staging dirs / leases whose target
    * generation is at-or-below the live one (the next compact targets
    * `live+1`, so those can never commit). Vacuum shares compaction's
    * single-maintenance-writer assumption.
    */
  def vacuum(): Unit = {
    val live = liveBase().getOrElse(
      sys.error(s"KeyedTable at $dir is empty — nothing to vacuum"))
    val wm = maxBatchOf(live)
    listBases().filter(_.getName != live.getName).foreach(p => fs.delete(p, true))
    listDeltas().filter(deltaId(_) <= wm).foreach(p => fs.delete(p, true))
    val liveGen = live.getName.stripPrefix("base-").toLong
    def gen(s: String): Option[Long] = {
      val digits = s.takeWhile(_.isDigit)
      if (digits.nonEmpty) Some(digits.toLong) else None
    }
    fs.listStatus(root).map(_.getPath).foreach { p =>
      val n = p.getName
      val dead =
        n.startsWith(".claim-tmp-") ||
        (n.startsWith(".tmp-base-") &&
          gen(n.stripPrefix(".tmp-base-")).exists(_ <= liveGen)) ||
        (n.startsWith(".compact-claim-") &&
          gen(n.stripPrefix(".compact-claim-")).exists(_ <= liveGen))
      if (dead) fs.delete(p, true)
    }
  }
}

object KeyedTable {
  /** Reserved delta column marking a row as a DELETE (last-writer-wins
    * like any other write); never visible through `read`/`readAsOf`.
    */
  val TombstoneCol = "__tombstone"

  /** What [[KeyedTable.applyChanges]] did with each feed batch:
    * `applied` committed fresh; `replayed` already existed here as a
    * delta directory (the safe idempotent-replay case);
    * `watermarkSkipped` were refused by the compaction watermark with
    * NO matching delta on disk — the batch's rows are absent from
    * this table, so the replica has diverged from the feed's source
    * (a replica seeded from a later snapshot, or a writer that reused
    * low batch ids). A replication tail must treat a non-empty
    * `watermarkSkipped` as an error unless it can prove the skipped
    * batches were folded into the base it was seeded from.
    */
  final case class ApplyResult(applied: Seq[Long], replayed: Seq[Long],
                               watermarkSkipped: Seq[Long]) {
    def divergent: Boolean = watermarkSkipped.nonEmpty
  }
}
