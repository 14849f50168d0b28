package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

/** As-of join semantics on constructed cases: latest-at-or-before match,
  * `>=` tie rule, null when nothing precedes, key isolation.
  */
class AsOfJoinSpec extends AnyFunSuite with SparkSuite {
  import java.sql.Timestamp.{valueOf => ts}

  test("picks the latest right row at or before the left time, per key") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), "q1"),
      (1L, ts("2024-01-01 11:00:00"), "q2"),
      (1L, ts("2024-01-01 12:00:00"), "q3"),
      (2L, ts("2024-01-01 11:30:00"), "q4"),
    ).toDF("key", "qts", "quote")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:30:00")), // between q1 and q2 → q1
      (11L, 1L, ts("2024-01-01 11:00:00")), // exactly q2 → q2 (>= rule)
      (12L, 1L, ts("2024-01-01 09:00:00")), // before everything → null
      (13L, 2L, ts("2024-01-01 12:00:00")), // key 2 → q4, not key 1's q3
    ).toDF("trade_id", "key", "tts")
    val out = AsOfJoin.asOf(trades, quotes, "key", "key", "tts", "qts", Seq("quote"))
      .select("trade_id", "quote").as[(Long, Option[String])].collect().toMap
    assert(out(10L).contains("q1"))
    assert(out(11L).contains("q2"))
    assert(out(12L).isEmpty)
    assert(out(13L).contains("q4"))
  }

  test("a matching right row with NULL payload carries the NULL (no fall-through)") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some("q1")),
      (1L, ts("2024-01-01 11:00:00"), None), // newer row, null payload
    ).toDF("key", "qts", "quote")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:30:00")), // only q1 precedes → q1
      (11L, 1L, ts("2024-01-01 11:30:00")), // null-payload row is latest → NULL
    ).toDF("trade_id", "key", "tts")
    val out = AsOfJoin.asOf(trades, quotes, "key", "key", "tts", "qts", Seq("quote"))
      .select("trade_id", "quote").as[(Long, Option[String])].collect().toMap
    assert(out(10L).contains("q1"))
    assert(out(11L).isEmpty,
      "DuckDB/pandas ASOF semantics: the matching row's null payload must be carried")
  }

  test("randomised: matches a per-row scan reference on collision-heavy data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 3) {
      // small key/time domains force heavy collisions (the edge cases)
      val rights = (0 until 80).map { i =>
        (rnd.nextInt(6).toLong, rnd.nextInt(40).toLong, i.toLong)
      }.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique per (key, time)
      val lefts = (0 until 120).map { i =>
        (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(40).toLong)
      }
      val rightDf = rights.toDF("rk", "rt", "payload")
      val leftDf = lefts.toDF("lid", "lk", "lt")
      val got = AsOfJoin.asOf(leftDf, rightDf, "lk", "rk", "lt", "rt", Seq("payload"))
        .select("lid", "payload").as[(Long, Option[Long])].collect().toMap
      val expected = lefts.map { case (lid, lk, lt) =>
        val best = rights.filter(r => r._1 == lk && r._2 <= lt)
          .sortBy(_._2).lastOption.map(_._3)
        lid -> best
      }.toMap
      assert(got == expected, s"round $round diverged from the scan reference")
    }
  }

  test("bucketed (skew-safe) as-of equals the single-window form, incl. null payloads") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // timestamps across several 1-hour buckets; some right payloads null;
    // some buckets contain no right rows (exercises the bucket carry-in)
    val rights = (0 until 60).map { i =>
      val t = ts(f"2024-01-01 ${rnd.nextInt(12)}%02d:${rnd.nextInt(60)}%02d:00")
      (rnd.nextInt(4).toLong, t, if (rnd.nextInt(5) == 0) None else Some(i.toLong))
    }.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val lefts = (0 until 150).map { i =>
      (i.toLong, rnd.nextInt(4).toLong,
        ts(f"2024-01-01 ${rnd.nextInt(12)}%02d:${rnd.nextInt(60)}%02d:30"))
    }
    val rightDf = rights.toDF("rk", "rt", "payload")
    val leftDf = lefts.toDF("lid", "lk", "lt")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "payload").as[(Long, Option[Long])].collect().toMap
    val plain = collect(AsOfJoin.asOf(leftDf, rightDf, "lk", "rk", "lt", "rt", Seq("payload")))
    val bucketed = collect(AsOfJoin.asOfBucketed(
      leftDf, rightDf, "lk", "rk", "lt", "rt", Seq("payload"), bucketSeconds = 3600))
    assert(bucketed == plain, "bucketed as-of diverged from the reference form")
  }

  test("fixture as-of matches a windowed lag reformulation") {
    // prev-order query: for each order, the customer's latest strictly
    // earlier order date's max orderkey — recomputed via lag over the
    // deduplicated (custkey, date) timeline
    import org.apache.spark.sql.expressions.Window
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val viaAsof = GraftQueries.qAsofJoin(spark, sfDir)
    val dates = orders.groupBy("o_custkey", "o_orderdate")
      .agg(max("o_orderkey").as("ref"))
      .withColumn("prev_ref", lag("ref", 1).over(
        Window.partitionBy("o_custkey").orderBy("o_orderdate")))
    val expected = orders.join(dates, Seq("o_custkey", "o_orderdate"))
      .select(col("o_orderkey"), col("prev_ref").as("prev_orderkey"))
    assert(viaAsof.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(viaAsof).count() == 0)
  }

  test("plan shape: one shuffle on the key, window, no join explosion") {
    val plan = GraftQueries.qAsofJoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"))
  }
}
