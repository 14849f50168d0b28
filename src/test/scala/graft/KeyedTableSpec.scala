package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.ParquetSource
import graft.streaming.{EventsStream, KeyedTable}

/** Merge-on-read KeyedTable (the streaming CDC upsert sink): rename-
  * committed deltas, replay idempotence, compaction, and the streaming
  * `foreachBatch` path agreeing with the batch latest-per-key twin.
  */
class KeyedTableSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_kt_$tag").toString

  private def mk(dir: String) =
    new KeyedTable(spark, dir, Seq("k"), Seq("v_ts", "v_seq"))

  private def rows(t: (Long, Long, Long, String)*): DataFrame =
    t.toSeq.toDF("k", "v_ts", "v_seq", "payload")

  private def state(t: KeyedTable): Set[(Long, Long, Long, String)] =
    t.read().as[(Long, Long, Long, String)].collect().toSet

  test("upsert merges latest-per-key over the base; version tuple decides") {
    val t = mk(tmpDir("basic"))
    t.initBase(rows((1L, -1L, -1L, "base1"), (2L, -1L, -1L, "base2")))
    assert(t.upsert(rows((1L, 10L, 1L, "d1"), (3L, 5L, 1L, "d3")), 0))
    // same ts, higher seq wins; lower version never regresses the row
    assert(t.upsert(rows((1L, 10L, 2L, "d1b"), (2L, -1L, -2L, "stale")), 1))
    assert(state(t) == Set(
      (1L, 10L, 2L, "d1b"), (2L, -1L, -1L, "base2"), (3L, 5L, 1L, "d3")))
  }

  test("replayed batchId is a committed no-op") {
    val t = mk(tmpDir("replay"))
    t.initBase(rows((1L, -1L, -1L, "base")))
    assert(t.upsert(rows((1L, 1L, 1L, "v1")), 0))
    val before = state(t)
    assert(!t.upsert(rows((1L, 99L, 99L, "would-corrupt")), 0))
    assert(state(t) == before)
  }

  test("compact folds deltas into a new generation; reads unchanged; history kept") {
    val dir = tmpDir("compact")
    val t = mk(dir)
    t.initBase(rows((1L, -1L, -1L, "base")))
    t.upsert(rows((1L, 1L, 1L, "v1"), (2L, 1L, 1L, "n2")), 0)
    t.upsert(rows((1L, 2L, 1L, "v2")), 1)
    val before = state(t)
    t.compact()
    assert(state(t) == before)
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    // compaction never destroys history — old generation + deltas stay
    assert(names.contains("base-1") && names.contains("base-0"))
    assert(names.contains("delta=0") && names.contains("delta=1"))
    // a delta landing after the compaction is visible immediately
    t.upsert(rows((2L, 5L, 1L, "n2b")), 2)
    assert(state(t) == Set(
      (1L, 2L, 1L, "v2"), (2L, 5L, 1L, "n2b")))
  }

  test("readAsOf reconstructs any batch watermark; vacuum trades history away") {
    val dir = tmpDir("asof")
    val t = mk(dir)
    t.initBase(rows((1L, -1L, -1L, "base")))
    t.upsert(rows((1L, 1L, 1L, "v1")), 0)
    t.upsert(rows((1L, 2L, 1L, "v2")), 1)
    t.compact() // base-1 watermark = 1
    t.upsert(rows((1L, 3L, 1L, "v3")), 2)
    assert(t.readAsOf(0).as[(Long, Long, Long, String)].collect().toSet ==
      Set((1L, 1L, 1L, "v1")))
    assert(t.readAsOf(1).as[(Long, Long, Long, String)].collect().toSet ==
      Set((1L, 2L, 1L, "v2")))
    assert(t.readAsOf(2).as[(Long, Long, Long, String)].collect().toSet ==
      Set((1L, 3L, 1L, "v3")))
    val before = state(t)
    t.vacuum() // drops base-0 and deltas <= 1; delta=2 survives
    assert(state(t) == before)
    assert(t.readAsOf(2).as[(Long, Long, Long, String)].collect().toSet ==
      Set((1L, 3L, 1L, "v3")))
    assertThrows[IllegalArgumentException](t.readAsOf(0))
    // post-vacuum replay of a consumed batch: its id sits below the
    // compaction watermark, so it is REFUSED (the rows already live in
    // the base) — no invisible delta, no silent "true"
    assert(!t.upsert(rows((1L, 1L, 1L, "v1")), 0))
    assert(state(t) == before)
    assert(!new java.io.File(dir, "delta=0").exists(),
      "a watermark-refused upsert must write nothing")
  }

  test("upsert below the compaction watermark is refused, not silently lost") {
    // a writer reusing low batchIds with NEW data (fresh checkpoint
    // against an existing table) must see false — the old behaviour
    // committed an invisible delta and reported success
    val dir = tmpDir("wm")
    val t = mk(dir)
    t.initBase(rows((1L, -1L, -1L, "base")))
    t.upsert(rows((1L, 1L, 1L, "v1")), 0)
    t.upsert(rows((1L, 2L, 1L, "v2")), 1)
    t.compact() // watermark = 1
    val before = state(t)
    assert(!t.upsert(rows((2L, 9L, 9L, "new-data-low-id")), 1))
    assert(!t.upsert(rows((2L, 9L, 9L, "new-data-low-id")), 0))
    assert(state(t) == before)
    assert(t.upsert(rows((2L, 9L, 9L, "fresh-id")), 2))
  }

  test("concurrent compaction: lease holder wins, intruder fails loudly") {
    val dir = tmpDir("lease")
    val t = mk(dir)
    t.initBase(rows((1L, -1L, -1L, "base")))
    t.upsert(rows((1L, 1L, 1L, "v1")), 0)
    // simulate a live peer compactor holding the generation-1 lease
    val claim = new java.io.File(dir, ".compact-claim-1")
    val w = new java.io.FileOutputStream(claim)
    w.write("peer-token".getBytes); w.close()
    val e = intercept[RuntimeException](t.compact())
    assert(e.getMessage.contains("another compactor"), e.getMessage)
    // the peer's claim survives our refused attempt; no generation landed
    assert(claim.exists())
    assert(!new java.io.File(dir, "base-1").exists())
    // peer dies: its lease goes stale and is evicted after the TTL
    assert(claim.setLastModified(System.currentTimeMillis() - 120000))
    t.compact(leaseTtlMs = 60000L)
    assert(new java.io.File(dir, "base-1/_COMMITTED").exists())
    assert(!claim.exists(), "winner must release the lease")
    assert(state(t) == Set((1L, 1L, 1L, "v1")))
  }

  test("compact recovers from a predecessor that died between rename and commit") {
    val dir = tmpDir("crash")
    val t = mk(dir)
    t.initBase(rows((1L, -1L, -1L, "base")))
    t.upsert(rows((1L, 1L, 1L, "v1")), 0)
    // simulate the crash window: base-1 renamed into place (with stale
    // content!) but never committed — invisible to readers, and it must
    // not block the next compaction
    val ghost = new java.io.File(dir, "base-1"); ghost.mkdirs()
    val w = new java.io.FileOutputStream(new java.io.File(ghost, "junk.parquet"))
    w.write("not parquet".getBytes); w.close()
    assert(state(t) == Set((1L, 1L, 1L, "v1")), "uncommitted ghost must be invisible")
    t.compact()
    assert(new java.io.File(dir, "base-1/_COMMITTED").exists())
    assert(!new java.io.File(dir, "base-1/junk.parquet").exists(),
      "ghost content must be cleared, not committed")
    assert(state(t) == Set((1L, 1L, 1L, "v1")))
  }

  test("vacuum sweeps dead compactor debris, never the live lease or future staging") {
    val dir = tmpDir("debris")
    val t = mk(dir)
    t.initBase(rows((1L, -1L, -1L, "base")))
    t.upsert(rows((1L, 1L, 1L, "v1")), 0)
    t.compact() // live = base-1
    t.upsert(rows((1L, 2L, 1L, "v2")), 1)
    // plant crashed-compactor leftovers: an orphan claim token, a dead
    // staging dir and lease for an already-committed generation — and a
    // staging dir + lease for the NEXT generation (a live compactor's)
    def touch(name: String): Unit = {
      val f = new java.io.File(dir, name)
      if (name.contains("tmp-base")) f.mkdirs()
      else { val w = new java.io.FileOutputStream(f); w.write("x".getBytes); w.close() }
    }
    Seq(".claim-tmp-deadbeef", ".tmp-base-1-olduuid", ".compact-claim-1",
      ".tmp-base-2-liveuuid", ".compact-claim-2").foreach(touch)
    val before = state(t)
    t.vacuum()
    assert(state(t) == before)
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!names.contains(".claim-tmp-deadbeef"))
    assert(!names.contains(".tmp-base-1-olduuid") && !names.contains(".compact-claim-1"))
    // generation-2 artifacts belong to a possible live compactor: kept
    assert(names.contains(".tmp-base-2-liveuuid") && names.contains(".compact-claim-2"))
    assert(names.contains("base-1") && names.contains("delta=1"))
  }

  test("two racing compactors: exactly one commits the generation") {
    val dir = tmpDir("race")
    val t = mk(dir)
    t.initBase(rows((1L, -1L, -1L, "base")))
    t.upsert(rows((1L, 1L, 1L, "v1")), 0)
    val gate = new java.util.concurrent.CountDownLatch(2)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = Seq.fill(2)(new Thread(() => {
      gate.countDown(); gate.await()
      try { t.compact(); outcomes.add(true) }
      catch { case _: Exception => outcomes.add(false) }
    }))
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(outcomes.size == 2, s"a compactor thread vanished: $outcomes")
    val wins = outcomes.toArray(Array.empty[java.lang.Boolean]).count(_.booleanValue)
    // the staged-rename arbiter guarantees at least one clean landing
    // and that a loser can never tear the winner's result — the
    // committed generation reads back intact either way
    assert(wins >= 1, s"no compactor won: $outcomes")
    assert(state(t) == Set((1L, 1L, 1L, "v1")))
    assert(new java.io.File(dir, "base-1/_COMMITTED").exists())
  }

  test("diff classifies I/U with post-images, drops losing writes, spans compaction") {
    val t = mk(tmpDir("diff"))
    t.initBase(rows((1L, -1L, -1L, "base1"), (2L, -1L, -1L, "base2")))
    // batch 0: updates key 1, inserts key 3
    assert(t.upsert(rows((1L, 10L, 1L, "d1"), (3L, 5L, 1L, "d3")), 0))
    // batch 1: a LOSING write to key 2 (version below its base row) and
    // a genuine update to key 3
    assert(t.upsert(rows((2L, -5L, -5L, "stale"), (3L, 6L, 1L, "d3b")), 1))
    val d01 = t.diff(-1L, 1L).as[(String, Long, Long, Long, String)].collect().toSet
    assert(d01 == Set(
      ("U", 1L, 10L, 1L, "d1"),   // existed in base, state changed
      ("I", 3L, 6L, 1L, "d3b")))  // absent at from; post-image is latest
    // key 2 was TOUCHED by batch 1 but its write lost the version race —
    // state diff drops it
    assert(!d01.exists(_._2 == 2L))
    // a window touching only the losing write diffs to empty
    assert(t.diff(0L, 1L).count() == 1) // only key 3 changed in (0,1]
    assert(t.diff(0L, 1L).as[(String, Long, Long, Long, String)].head() ==
      (("U", 3L, 6L, 1L, "d3b")))
    // compaction must not change any diff (history is retained)
    t.compact()
    val afterCompact = t.diff(-1L, 1L).as[(String, Long, Long, Long, String)]
      .collect().toSet
    assert(afterCompact == d01)
    // an empty window (no touched deltas) is an empty diff with the op schema
    assert(t.upsert(rows((1L, 20L, 1L, "d1c")), 2))
    val empty = t.diff(5L, 9L)
    assert(empty.columns.head == "op" && empty.count() == 0)
    // vacuum drops pre-compaction history: a from below the watermark
    // must fail loudly, not silently diff against the wrong base
    t.vacuum()
    assertThrows[IllegalArgumentException](t.diff(-1L, 2L).count())
    // but diffs within retained history still work
    assert(t.diff(1L, 2L).as[(String, Long, Long, Long, String)].head() ==
      (("U", 1L, 20L, 1L, "d1c")))
  }

  test("model check: random op sequence always reads as latest-per-key of applied batches") {
    // deterministic PRNG drives a random interleaving of upserts,
    // replays, compactions and vacuums; after every step the table must
    // equal an in-memory model that applies max-version-wins per key.
    // Replays feed CORRUPTED rows on purpose — a table that ever reads
    // them leaked a duplicate commit.
    val rnd = new scala.util.Random(42)
    val t = mk(tmpDir("model"))
    var model = Map.empty[Long, (Long, Long, String)]
    def apply(rows: Seq[(Long, Long, Long, String)]): Unit =
      rows.foreach { case (k, ts, seq, p) =>
        val v = (ts, seq, p)
        model += k -> model.get(k).map(old => if (Ordering[(Long, Long, String)].gt(v, old)) v else old).getOrElse(v)
      }
    val seed = Seq.tabulate(5)(i => (i.toLong, -1L, -1L, s"base$i"))
    t.initBase(rows(seed: _*)); apply(seed)
    var committed = Map.empty[Long, Seq[(Long, Long, Long, String)]]
    var vacuumedUpTo = -1L
    for (batch <- 0L until 12L) {
      val fresh = Seq.fill(1 + rnd.nextInt(4))(
        (rnd.nextInt(8).toLong, batch, rnd.nextInt(3).toLong, s"b$batch-${rnd.nextInt(100)}"))
      assert(t.upsert(rows(fresh: _*), batch)); apply(fresh)
      committed += batch -> fresh
      rnd.nextInt(4) match {
        case 0 =>
          val (id, orig) = committed.toSeq(rnd.nextInt(committed.size))
          if (id > vacuumedUpTo)
            // delta still on disk: a corrupted replay must be REJECTED
            assert(!t.upsert(rows((99L, 999L, 999L, "corrupt")), id))
          else
            // delta GC'd: the at-least-once contract is value-level —
            // replaying the ORIGINAL rows commits but changes nothing
            t.upsert(rows(orig: _*), id)
        case 1 => t.compact()
        case 2 => t.compact(); t.vacuum(); vacuumedUpTo = batch
        case _ =>
      }
      assert(state(t) == model.map { case (k, (ts, seq, p)) => (k, ts, seq, p) }.toSet,
        s"divergence after batch $batch")
    }
  }

  test("streaming foreachBatch upsert equals the batch latest-per-key twin") {
    val dir = tmpDir("stream")
    val events = ParquetSource.normalizeNanoTimestamps(
      spark.read.parquet(s"$sfDir/events.parquet"))
    val rawSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    def shape(df: DataFrame): DataFrame = df.select(
      col("user_id"), col("value"),
      unix_micros(col("ts")).as("ts_us"), col("event_id").as("eid"))
    val t = new KeyedTable(spark, dir, Seq("user_id"), Seq("ts_us", "eid"))
    t.initBase(shape(events).limit(0)) // empty seed: stream-only state
    // bounded replay of the fixture through the real sink path
    val p = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    val d = java.nio.file.Files.createTempDirectory("graft_kt_src")
    java.nio.file.Files.createSymbolicLink(d.resolve(p.getFileName), p.toAbsolutePath)
    val stream = spark.readStream.schema(rawSchema).parquet(d.toString)
    val q = EventsStream.upsertStream(
      shape(ParquetSource.normalizeNanoTimestamps(stream)), t,
      Seq("user_id"), Seq("ts_us", "eid"),
      checkpoint = tmpDir("stream_ckpt"))
    try q.processAllAvailable() finally q.stop()
    val got = t.read()
    val want = shape(events).groupBy("user_id")
      .agg(max(struct(col("ts_us"), col("eid"), col("value"))).as("m"))
      .select(col("user_id"), col("m.value").as("value"),
        col("m.ts_us").as("ts_us"), col("m.eid").as("eid"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    assert(got.count() > 0)
  }

  test("deletes: tombstones win and lose version races, survive compaction, drive diff 'D'") {
    val dir = tmpDir("delete")
    val t = mk(dir)
    t.initBase(rows((1L, 1L, 1L, "a"), (2L, 1L, 1L, "b"), (3L, 1L, 1L, "c")))
    // delete key 1 (version wins), delete key 2 with a LOSING version
    val del = Seq((1L, 5L, 1L), (2L, 0L, 0L)).toDF("k", "v_ts", "v_seq")
    assert(t.delete(del, 0L))
    assert(state(t) == Set((2L, 1L, 1L, "b"), (3L, 1L, 1L, "c")),
      "winning tombstone hides key 1; losing tombstone leaves key 2")
    // diff across the delete batch reports the D with a NULL post-image
    val d = t.diff(-1L, 0L).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(d == Set(("D", 1L)))
    // time travel BEFORE the delete still sees key 1
    assert(t.readAsOf(-1L).filter(col("k") === 1L).count() == 1)
    // compaction RETAINS the tombstone: a straggler upsert with a lower
    // version than the tombstone still loses after the fold
    t.compact()
    assert(state(t) == Set((2L, 1L, 1L, "b"), (3L, 1L, 1L, "c")))
    assert(t.upsert(rows((1L, 3L, 1L, "resurrect?")), 1L))
    assert(state(t) == Set((2L, 1L, 1L, "b"), (3L, 1L, 1L, "c")),
      "a write below the tombstone's version must stay dead")
    // and a write ABOVE the tombstone's version legitimately recreates
    assert(t.upsert(rows((1L, 9L, 1L, "reborn")), 2L))
    assert(state(t) == Set((1L, 9L, 1L, "reborn"),
      (2L, 1L, 1L, "b"), (3L, 1L, 1L, "c")))
    // upsert refuses the reserved column
    assertThrows[IllegalArgumentException] {
      t.upsert(rows((4L, 1L, 1L, "x"))
        .withColumn(graft.streaming.KeyedTable.TombstoneCol, lit(true)), 3L)
    }
  }

  test("schema evolution: a delta's new column reads as NULL for old rows, survives compaction") {
    val dir = tmpDir("evolve")
    val t = mk(dir)
    t.initBase(rows((1L, 1L, 1L, "a"), (2L, 1L, 1L, "b")))
    // the new generation of writers carries an extra column
    val evolved = Seq((2L, 2L, 1L, "b2", "extra2"), (3L, 1L, 1L, "c", "extra3"))
      .toDF("k", "v_ts", "v_seq", "payload", "tag")
    assert(t.upsert(evolved, 0L))
    def snapshot(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "tag").as[(Long, String, Option[String])]
        .collect().toSet
    val want = Set(
      (1L, "a", None),            // pre-evolution row: NULL tag
      (2L, "b2", Some("extra2")), // updated by the evolved delta
      (3L, "c", Some("extra3")))
    assert(snapshot(t.read()) == want)
    // time travel BEFORE the evolution sees the historical schema
    assert(!t.readAsOf(-1L).columns.contains("tag"))
    // compaction folds the union schema into the new base generation
    t.compact()
    assert(snapshot(t.read()) == want)
    // and later plain-schema writers still work against the evolved table
    assert(t.upsert(rows((1L, 2L, 1L, "a2")), 1L))
    assert(snapshot(t.read()) == Set(
      (1L, "a2", None), (2L, "b2", Some("extra2")), (3L, "c", Some("extra3"))))
  }

  test("change feed: batch and streaming reads carry exactly the committed writes, batch-stamped") {
    val dir = tmpDir("cdf")
    val t = mk(dir)
    t.initBase(rows((1L, -1L, -1L, "base")))
    assert(t.upsert(rows((1L, 10L, 1L, "a"), (2L, 5L, 1L, "b")), 0L))
    assert(t.upsert(rows((2L, 6L, 1L, "c")), 1L))
    t.compact() // consumed deltas stay in the feed until vacuum
    assert(t.upsert(rows((3L, 1L, 1L, "d")), 2L))
    def asSet(df: DataFrame) = df
      .select(col("k"), col("v_ts"), col("v_seq"), col("payload"),
        col("batch_id").cast("long"))
      .as[(Long, Long, Long, String, Long)].collect().toSet
    val want = Set(
      (1L, 10L, 1L, "a", 0L), (2L, 5L, 1L, "b", 0L),
      (2L, 6L, 1L, "c", 1L), (3L, 1L, 1L, "d", 2L))
    // batch feed: the writes themselves — base rows never appear
    assert(asSet(t.changes()) == want)
    assert(t.changes().schema("batch_id").dataType ==
      org.apache.spark.sql.types.LongType)
    // streaming twin: identical rows through the file-source stream
    val q = t.changesStream(rows((0L, 0L, 0L, "x")).schema)
      .writeStream.format("memory").queryName("kt_cdf_feed")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(asSet(spark.table("kt_cdf_feed")) == want)
  }

  test("layout-reserved column names are rejected at the write") {
    import spark.implicits._
    val t = mk(tmpDir("reserved"))
    t.initBase(rows((1L, -1L, -1L, "b")))
    // 'delta' would corrupt partition discovery, 'batch_id' the feed
    intercept[IllegalArgumentException] {
      t.upsert(Seq((1L, 1L, 1L, "x", 9L)).toDF("k", "v_ts", "v_seq", "payload", "delta"), 0L)
    }
    intercept[IllegalArgumentException] {
      t.upsert(Seq((1L, 1L, 1L, "x", 9L)).toDF("k", "v_ts", "v_seq", "payload", "batch_id"), 0L)
    }
  }

  test("replication: base + change feed reconstructs the primary exactly, tombstones included") {
    val primary = mk(tmpDir("repl_p"))
    primary.initBase(rows((1L, -1L, -1L, "b1"), (2L, -1L, -1L, "b2")))
    assert(primary.upsert(rows((1L, 10L, 1L, "u1"), (3L, 5L, 1L, "u3")), 0L))
    // a delete batch rides the feed as a tombstoned write
    assert(primary.delete(rows((2L, 20L, 1L, "ignored"))
      .select("k", "v_ts", "v_seq"), 1L))
    assert(primary.upsert(rows((4L, 1L, 1L, "u4")), 2L))
    val replica = mk(tmpDir("repl_r"))
    replica.initBase(primary.readAsOf(-1L))
    val first = replica.applyChanges(primary.changes())
    assert(first.applied == Seq(0L, 1L, 2L) && first.replayed.isEmpty
      && !first.divergent)
    assert(state(replica) == state(primary))
    // deleted key is gone on both sides (the tombstone travelled)
    assert(!state(replica).exists(_._1 == 2L))
    // re-applying the feed is a no-op (replay idempotence inherited),
    // and the result says so — every id a replay, none lost
    val again = replica.applyChanges(primary.changes())
    assert(again.applied.isEmpty && again.replayed == Seq(0L, 1L, 2L)
      && !again.divergent)
    assert(state(replica) == state(primary))
  }

  test("replicationStream: continuous tail tracks the primary; divergence fails the stream loudly") {
    val primary = mk(tmpDir("replst_p"))
    primary.initBase(rows((1L, -1L, -1L, "b1"), (2L, -1L, -1L, "b2")))
    assert(primary.upsert(rows((1L, 10L, 1L, "u1")), 0L))
    assert(primary.delete(rows((2L, 20L, 1L, "x"))
      .select("k", "v_ts", "v_seq"), 1L))
    val replica = mk(tmpDir("replst_r"))
    replica.initBase(primary.readAsOf(-1L))
    val ckpt = tmpDir("replst_ckpt")
    val schema = rows((0L, 0L, 0L, "x")).schema
    val q = replica.replicationStream(primary, schema, ckpt)
    try q.processAllAvailable() finally q.stop()
    assert(state(replica) == state(primary))
    // more primary writes; a RESTARTED tail (same checkpoint) catches up
    assert(primary.upsert(rows((3L, 30L, 1L, "u3")), 2L))
    val q2 = replica.replicationStream(primary, schema, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(state(replica) == state(primary))
    // divergence: fold + vacuum the replica, then a FRESH checkpoint
    // re-reads the full feed — the watermark refuses batches 0-2 with
    // no deltas to witness a replay, and the stream must die loudly
    replica.compact()
    replica.vacuum()
    val q3 = replica.replicationStream(primary, schema, tmpDir("replst_ckpt2"))
    val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable()
      q3.awaitTermination()
    }
    q3.stop()
    assert(boom.getMessage.contains("diverged") ||
      Option(boom.getCause).exists(_.getMessage.contains("diverged")))
    // state untouched by the failed tail
    assert(state(replica) == state(primary))
  }

  test("replication: a watermark-refused batch with no delta on disk is reported, not dropped silently") {
    val primary = mk(tmpDir("replwm_p"))
    primary.initBase(rows((1L, -1L, -1L, "b1")))
    assert(primary.upsert(rows((2L, 10L, 1L, "u2")), 0L))
    assert(primary.upsert(rows((3L, 10L, 1L, "u3")), 5L))
    val replica = mk(tmpDir("replwm_r"))
    replica.initBase(primary.readAsOf(-1L))
    assert(replica.applyChanges(primary.changes()).applied == Seq(0L, 5L))
    // fold + reclaim: batches 0 and 5 now live only in the base, so a
    // re-applied feed slice is refused by the watermark with no delta
    // directory to witness the replay
    replica.compact()
    replica.vacuum()
    val res = replica.applyChanges(primary.changes())
    assert(res.applied.isEmpty && res.replayed.isEmpty)
    assert(res.watermarkSkipped == Seq(0L, 5L) && res.divergent)
    // here the skip IS benign (the base folded both batches) — the
    // point is the tail gets the signal and decides, state intact
    assert(state(replica) == state(primary))
  }
}
