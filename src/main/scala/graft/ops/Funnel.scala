package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-stage ordered funnel analysis over an event log: for each entity,
  * the earliest strictly-increasing chain of timestamps that walks the
  * stage sequence in order (view → click → purchase, signup → activate →
  * pay, …).
  *
  * Greedy earliest-completion is optimal here: taking the earliest valid
  * event for stage k never prevents completing stage k+1, because any
  * later valid stage-k event only shrinks the window that remains. So
  * one ascending pass over an entity's events computes the whole chain —
  * which is what makes the single-scan plan possible.
  *
  * Scale shape: ONE scan of the event table (the stage filter pushes
  * into the source as an `In`), ONE shuffle (the entity groupBy); the
  * per-entity fold runs over the collected, sorted event array. The
  * per-entity state is bounded by that entity's stage-event count —
  * funnels over web-scale logs hold at most thousands of events per
  * user, orders of magnitude below executor memory. Contrast the naive
  * form (filter + join per stage), which scans the fact table once per
  * stage and shuffles N times.
  */
object Funnel {

  /** One row per entity that has at least one stage-0 event:
    * `(entity, stage_ts)` where `stage_ts(k)` is the timestamp of the
    * earliest stage-k event strictly after `stage_ts(k-1)`; the array
    * stops at the first unreached stage (so `size(stage_ts)` is the
    * number of stages completed).
    */
  def stageTimes(events: DataFrame, entityCol: String, typeCol: String,
                 tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val stageArr = array(stages.map(lit): _*)
    val n = stages.size
    val perEntity = events
      .select(col(entityCol).as("entity"), col(typeCol).as("tp"), col(tsCol).as("ts"))
      .where(col("tp").isin(stages: _*))
      .groupBy("entity")
      // sort_array on array<struct<ts,tp>> orders by ts (then tp): the
      // ascending replay the greedy fold needs
      .agg(sort_array(collect_list(struct(col("ts"), col("tp")))).as("evs"))
    // `slice(ts-array, 1, 0)` = empty array of the ts column's own type —
    // no hardcoded timestamp/long cast to drift out of sync with the data
    val zero = slice(perEntity.col("evs").getField("ts"), 1, 0)
    // single aggregate() whose lambda touches only its own variables (the
    // nested-HOF re-evaluation trap does not apply). The order check must
    // NOT blanket-coalesce nulls to true: a NULL event timestamp can
    // neither anchor a chain nor advance one (NULL > x is NULL → the
    // `when` condition is not satisfied), otherwise one null-ts row would
    // make every later stage unconditionally valid. Stage 0 accepts
    // exactly the non-null-ts events; later stages compare against the
    // last accepted ts, which is non-null by induction.
    val chain = aggregate(col("evs"), zero, (acc, ev) =>
      when(size(acc) < n &&
        ev.getField("tp") === element_at(stageArr, size(acc) + 1) &&
        ((size(acc) === 0 && ev.getField("ts").isNotNull) ||
          ev.getField("ts") > get(acc, size(acc) - 1)),
        concat(acc, array(ev.getField("ts"))))
        .otherwise(acc))
    perEntity.select(col("entity"), chain.as("stage_ts"))
      .where(size(col("stage_ts")) >= 1)
  }

  /** Stage-completion counts: entities reaching stage k (k = 1-based
    * prefix length of the greedy chain), as one row with a count per
    * stage named by the caller.
    */
  def stageCounts(events: DataFrame, entityCol: String, typeCol: String,
                  tsCol: String, stages: Seq[String],
                  names: Seq[String]): DataFrame = {
    require(names.length == stages.length, "one output name per stage")
    val st = stageTimes(events, entityCol, typeCol, tsCol, stages)
    st.agg(
      count(when(size(col("stage_ts")) >= 1, lit(1))).as(names.head),
      names.zipWithIndex.tail.map { case (nm, i) =>
        count(when(size(col("stage_ts")) >= i + 1, lit(1))).as(nm)
      }: _*)
  }

  /** TIME-BOUNDED funnel — stage k must land within `maxGapSec` of a
    * reachable stage-(k−1) completion (click within N days of a view,
    * purchase within N days of THAT click): the form conversion
    * funnels are actually specified in.
    *
    * Greedy earliest-chain is WRONG here (unlike `stageTimes`): taking
    * the earliest click also starts the purchase deadline earliest, so
    * a later click can complete a funnel the greedy chain misses
    * (view@0, click@1, click@5, purchase@9, gap 7 — greedy dies at
    * purchase, the 5→9 chain succeeds). This computes exact EXISTENCE
    * semantics instead: stage-k timestamp `t` is reachable iff some
    * reachable stage-(k−1) time lies in `[t − gap, t)`. One ascending
    * pass suffices because the qualifying test only ever needs the
    * LATEST reachable predecessor strictly below `t` — tracked with
    * two slots per stage (largest + second-largest distinct reachable
    * time) so a predecessor AT `t` never shadows an earlier valid one.
    * Equivalent to the oracle's per-stage `EXISTS` chain by induction
    * on stages.
    *
    * Scale shape: ONE scan (stage filter pushes into the source), ONE
    * entity shuffle, per-entity state = that entity's stage events —
    * the same bounded-per-user contract as `stageTimes`/`sessionize`.
    */
  def windowedStageCounts(events: DataFrame, entityCol: String,
                          typeCol: String, tsCol: String,
                          stages: Seq[String], maxGapSec: Long,
                          names: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(names.length == stages.length, "one output name per stage")
    require(maxGapSec > 0, "maxGapSec must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    val n = stages.length
    val gapUs = maxGapSec * 1000000L
    val per = events
      .select(col(entityCol).cast("long").as("e"), col(typeCol).as("tp"),
        unix_micros(col(tsCol)).as("us"))
      .where(col("tp").isin(stages: _*) &&
        col("us").isNotNull && col("e").isNotNull)
      .as[(Long, String, Long)]
    val reached = per.groupByKey(_._1).mapGroups { (e, it) =>
      val evs = it.toArray.sortBy(t => (t._3, stageIdx(t._2)))
      val NEG = Long.MinValue
      val l1 = Array.fill(n)(NEG)
      val l2 = Array.fill(n)(NEG)
      evs.foreach { case (_, tp, ts) =>
        val k = stageIdx(tp)
        val ok =
          if (k == 0) true
          else {
            // the largest reachable stage-(k-1) time strictly below ts:
            // l1 unless l1 IS ts (same-timestamp event), then l2
            val below = if (l1(k - 1) < ts) l1(k - 1) else l2(k - 1)
            below != NEG && ts - below <= gapUs
          }
        // ascending replay ⇒ ts >= l1(k); record distinct times only
        if (ok && ts > l1(k)) { l2(k) = l1(k); l1(k) = ts }
      }
      var r = 0
      while (r < n && l1(r) != NEG) r += 1
      (e, r)
    }
    reached.toDF("e", "r").filter(col("r") >= 1)
      .agg(
        count(when(col("r") >= 1, lit(1))).as(names.head),
        names.zipWithIndex.tail.map { case (nm, i) =>
          count(when(col("r") >= i + 1, lit(1))).as(nm)
        }: _*)
  }

  /** Cohort retention matrix — the classic user-lifecycle analysis:
    * users cohorted by their first active week, counted in every later
    * week they return. Output `(cohort_week, week_offset, n_users)`;
    * offset 0 is the cohort's own size.
    *
    * Scale shape: active weeks dedupe in one mergeable distinct on
    * (user, week) — per-user state never materialises anywhere; the
    * cohort week is a second mergeable min; the join back is keyed on
    * user (node-scale relation both sides, the distinct already
    * collapsed event volume); the final matrix is a mergeable count
    * whose cardinality is cohorts × offsets, metadata-sized. Both
    * engines align weeks to Monday via `date_trunc`, so the day
    * difference is an exact multiple of 7 and the offset is integer
    * division.
    */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val ev = events
      .select(col(userCol).as("u"), date_trunc("week", col(tsCol)).as("w"))
      .distinct()
    val first = ev.groupBy("u").agg(min("w").as("cohort_week"))
    ev.join(first, "u")
      .groupBy(col("cohort_week"),
        expr("datediff(w, cohort_week) DIV 7").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** COHORT LTV curve — cumulative revenue per signup cohort over
    * weeks since signup, the triangle table every growth team reads
    * (and the honest basis for payback-period decisions): users
    * cohorted by first active week (the `cohortRetention` recipe),
    * revenue in exact cents per (cohort, offset) cell, cumulative via
    * a COHORT-KEYED window whose state is the cohort's own offsets —
    * calendar-bounded, never a partitionless window — and per-user
    * LTV by truncating division.
    *
    * Scale shape: one (user, week, cents) aggregate collapses event
    * volume first; cohort week is a mergeable min; the matrix is
    * cohorts × offsets metadata-sized, so the window and the size
    * join ride on metadata rows.
    */
  def cohortLtv(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts", valueCents: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events
      .select(col(userCol).as("u"), date_trunc("week", col(tsCol)).as("w"),
        valueCents.cast("long").as("cents"))
    val perUserWeek = ev.groupBy("u", "w")
      .agg(sum("cents").as("cents"))
    val first = perUserWeek.groupBy("u").agg(min("w").as("cohort_week"))
    val sized = first.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_users_cohort"))
    val cells = perUserWeek.join(first, "u")
      .groupBy(col("cohort_week"),
        expr("datediff(w, cohort_week) DIV 7").as("week_offset"))
      .agg(sum("cents").as("rev_cents"))
    val wCum = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_rev_cents", sum("rev_cents").over(wCum))
      .join(broadcast(sized), "cohort_week")
      .withColumn("ltv_cents",
        expr("cum_rev_cents DIV n_users_cohort"))
  }

  /** First-order Markov transition matrix over per-entity event
    * sequences: for every ordered adjacent pair of events within an
    * entity, count `from_type → to_type` and report the transition
    * probability in integer micro-units (`n·10⁶ div row_total` — the
    * quantise-once discipline that keeps the result bit-reproducible
    * and SQL-oracle-checkable; float division would hash-drift).
    *
    * Scale shape: ONE shuffle of the event table (the per-entity
    * window), a narrow `lead`, then a mergeable pair-count whose
    * cardinality is |types|² — metadata-sized — and a broadcast join
    * for the per-row totals. The window partitions by entity, so its
    * state is one entity's events: bounded by per-user activity, the
    * same contract `sessionize`/`stageTimes` already rely on — never a
    * partitionless window.
    */
  def transitionMatrix(events: DataFrame, entityCol: String = "user_id",
                       typeCol: String = "event_type",
                       orderCols: Seq[String] = Seq("ts", "event_id")): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol)).orderBy(orderCols.map(col): _*)
    // persisted: the tiny |types|² pair relation feeds BOTH the totals
    // and the output join — without the persist, whether the event
    // window runs once or twice would hang on exchange-reuse firing
    val pairs = OpCaches.persist(events
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n")))
    val totals = pairs.groupBy("from_type").agg(sum("n").as("row_total"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 1000000L) DIV row_total").as("p_micro"))
  }
}
