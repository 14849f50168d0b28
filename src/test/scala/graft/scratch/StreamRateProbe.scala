package graft.scratch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch measurement tool (round 11): sustained streaming throughput
  * for the two stateful flagships — st7 (CDC upsert into the
  * rename-committed [[graft.streaming.KeyedTable]]) and st12 (per-day
  * Misra–Gries heavy hitters maintained BY the state store) — driven
  * by the `rate` source at two target rates for a fixed wall window.
  *
  * Reported per (op, rate): total input rows, micro-batches, achieved
  * rows/s over the window, and the op's state size (resolved keyed
  * rows for st7 — keys + retained per-batch deltas until compaction —
  * and the state store's own `numRowsTotal` for st12, which is the
  * WINDOW count, the whole point of sketch-valued state: per-window
  * state is the ≤ budget-entry sketch map, never item cardinality).
  * Results → MEASUREMENTS.md.
  */
object StreamRateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val windowSec = args.headOption.map(_.toInt).getOrElse(30)

    def rate(rps: Int): DataFrame =
      spark.readStream.format("rate")
        .option("rowsPerSecond", rps)
        .option("numPartitions", 8)
        .load()

    def rm(p: String): Unit = {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(del)); f.delete(): Unit
      }
      del(new java.io.File(p))
    }

    // ---- st7: keyed CDC upsert into the rename-committed table ----
    for (rps <- Seq(50000, 400000)) {
      val dir = s"/root/repo/target/probe_kt_$rps"
      val ck = s"$dir-ck"
      rm(dir); rm(ck)
      val kt = new graft.streaming.KeyedTable(spark, dir,
        keyCols = Seq("user_id"), versionCols = Seq("version"))
      import spark.implicits._
      kt.initBase(Seq((-1L, -1L, "seed")).toDF("user_id", "version", "payload"))
      val changes = rate(rps).select(
        pmod(col("value"), lit(100000L)).as("user_id"),
        col("value").as("version"),
        (col("value") % 7).cast("string").as("payload"))
      val q = graft.streaming.EventsStream.upsertStream(
        changes, kt, Seq("user_id"), Seq("version"), ck)
      val t0 = System.nanoTime()
      Thread.sleep(windowSec * 1000L)
      q.stop(); q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val rows = q.recentProgress.map(_.numInputRows).sum
      val batches = q.recentProgress.count(_.numInputRows > 0)
      val stateRows = kt.read().count()
      println(f"[probe] st7_upsert rate=$rps rows=$rows batches=$batches " +
        f"secs=$secs%.1f achieved=${rows / secs}%.0f rows/s state_keys=$stateRows")
      rm(dir); rm(ck)
    }

    // ---- st12: windowed Misra–Gries sketch in the state store ----
    for (rps <- Seq(50000, 400000)) {
      val ck = s"/root/repo/target/probe_mg_$rps-ck"
      rm(ck)
      val events = rate(rps).select(
        col("timestamp").as("ts"),
        (col("value") % 20).cast("string").as("event_type"))
      val q = graft.streaming.EventsStream.windowTopKStream(events, budget = 2)
        .writeStream
        .format("memory")
        .queryName(s"probe_mg_$rps")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .start()
      val t0 = System.nanoTime()
      Thread.sleep(windowSec * 1000L)
      val stateRows = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
        .lastOption.getOrElse(-1L)
      q.stop(); q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val rows = q.recentProgress.map(_.numInputRows).sum
      val batches = q.recentProgress.count(_.numInputRows > 0)
      println(f"[probe] st12_topk rate=$rps rows=$rows batches=$batches " +
        f"secs=$secs%.1f achieved=${rows / secs}%.0f rows/s state_windows=$stateRows")
      rm(ck)
    }
    spark.stop()
  }
}
