package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment (A/B) analysis with EXACT significance verdicts.
  *
  * The p-value machinery most stacks reach for (normal CDFs, special
  * functions) is transcendental and therefore not bit-portable across
  * engines. The verdict itself doesn't need it: for a 2×2 contingency
  * table, Pearson's χ² ≥ threshold is a POLYNOMIAL inequality in the
  * four cells —
  *
  *   N·(ad − bc)² ≥ χ²_crit · (a+b)(c+d)(a+c)(b+d)
  *
  * — so with the critical value as an exact rational (3.841 = 3841/1000
  * for α = 0.05, df = 1) the whole test is integer arithmetic,
  * evaluated in DECIMAL(38,0) so no realistic cohort size can
  * overflow. Deterministic variant assignment comes from the portable
  * md5 bucket, the same coin every sampling op uses.
  *
  * Scale shape: two mergeable distinct-user aggregates (cohort and
  * converters), one broadcast-sized 2-row join, a single verdict row.
  * The event relation shuffles once per distinct.
  */
object Experiment {

  /** χ²₀.₉₅,₁ × 1000 — the exact rational threshold the verdict uses. */
  val ChiSqCritX1000: Long = 3841L

  /** 2×2 conversion test: users split into variants by the md5 bucket
    * of `userCol` mod 2; a user converts when they have ≥ 1
    * `convertType` event. Output is ONE row: per-variant cohort and
    * converter counts, per-mille conversion rates, and the exact
    * significance verdict at α = 0.05.
    */
  def abChisq(events: DataFrame, userCol: String = "user_id",
              typeCol: String = "event_type",
              convertType: String = "purchase"): DataFrame = {
    val users = events.select(col(userCol).as("u")).distinct()
      .withColumn("variant", Sampling.bucket(col("u"), 2))
    val converted = events.filter(col(typeCol) === convertType)
      .select(col(userCol).as("u")).distinct()
      .withColumn("conv", lit(1L))
    val cells = users.join(converted, Seq("u"), "left")
      .groupBy("variant")
      .agg(count(lit(1)).as("n"), sum(coalesce(col("conv"), lit(0L))).as("k"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    cells.agg(
        sum(when(col("variant") === 0, col("n")).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 0, col("k")).otherwise(0L)).as("conv_a"),
        sum(when(col("variant") === 1, col("n")).otherwise(0L)).as("n_b"),
        sum(when(col("variant") === 1, col("k")).otherwise(0L)).as("conv_b"))
      // empty-cohort guard: a degenerate md5 coin (tiny or skewed
      // cohorts) must report a NULL rate, not divide by zero — the
      // same degenerate-table posture as the rhs > 0 verdict guard
      .withColumn("rate_a_pm",
        expr("CASE WHEN n_a > 0 THEN (conv_a * 1000) DIV n_a END"))
      .withColumn("rate_b_pm",
        expr("CASE WHEN n_b > 0 THEN (conv_b * 1000) DIV n_b END"))
      .withColumn("significant", {
        val a = col("conv_a"); val b = col("n_a") - col("conv_a")
        val c = col("conv_b"); val d = col("n_b") - col("conv_b")
        val n = col("n_a") + col("n_b")
        val diff = dec(a) * dec(d) - dec(b) * dec(c)
        val lhs = lit(1000L).cast("decimal(38,0)") * dec(n) * diff * diff
        val rhs = lit(ChiSqCritX1000).cast("decimal(38,0)") *
          dec(a + b) * dec(c + d) * dec(a + c) * dec(b + d)
        // rhs = 0 means a degenerate table (an empty margin — everyone
        // or no one converted, or a variant is empty): χ² is 0/0 there
        // and the honest verdict is NOT significant
        rhs > 0 && lhs >= rhs
      })
  }

  /** (1.358)² × 10⁶ — the squared α = 0.05 two-sample KS coefficient
    * as an exact rational, so the verdict needs no square root.
    */
  val KsCritSqX1e6: Long = 1844164L

  /** Two-sample Kolmogorov–Smirnov test, EXACT: the statistic is the
    * max ECDF gap, which only changes at pooled distinct values, so
    * `D·n_a·n_b = max_v |F_a(v)·n_b − F_b(v)·n_a|` is an integer —
    * emitted as the rational `ks_num / ks_den`. The verdict squares
    * the decision inequality `D > c·√((n_a+n_b)/(n_a·n_b))` into
    * `10⁶·K² > c²·10⁶·(n_a+n_b)·n_a·n_b`, evaluated in DECIMAL(38,0)
    * — no float, no √, bit-portable. Cumulative counts ride the
    * range-partitioned prefix sum over the DISTINCT-value relation
    * (two passes over a value-domain-sized table, never a
    * partitionless window over the data).
    */
  def ksTest(df: DataFrame, valueCol: Column,
             inA: Column, inB: Column): DataFrame = {
    val per = OpCaches.persist(
      df.filter(inA || inB)
        .select(valueCol.as("v"),
          when(inA, 1L).otherwise(0L).as("a"),
          when(inB, 1L).otherwise(0L).as("b"))
        .groupBy("v")
        .agg(sum("a").as("na_v"), sum("b").as("nb_v")))
    val fa = Sampling.runningTotal(per, Seq(col("v")), "na_v")
      .withColumnRenamed("running_total", "fa")
    val fab = Sampling.runningTotal(fa, Seq(col("v")), "nb_v")
      .withColumnRenamed("running_total", "fb")
    val tot = broadcast(per.agg(sum("na_v").as("n_a"), sum("nb_v").as("n_b")))
    def dec(c: Column) = c.cast("decimal(38,0)")
    // the K = D·n_a·n_b statistic and the n_a·n_b denominator are
    // products of two cohort counts: in LongType they silently wrap
    // once n_a·n_b exceeds 2⁶³ (~3×10⁹ rows per arm), so every product
    // is formed in DECIMAL(38,0) and only the OUTPUT columns cast back
    // to BIGINT (NULL — loud, never wrong — beyond ~9×10¹⁸)
    fab.crossJoin(tot)
      .agg(max(abs(dec(col("fa")) * dec(col("n_b")) -
          dec(col("fb")) * dec(col("n_a")))).as("ks_num_d"),
        max("n_a").as("n_a"), max("n_b").as("n_b"))
      .withColumn("ks_den_d", dec(col("n_a")) * dec(col("n_b")))
      .withColumn("reject_05", {
        val k = col("ks_num_d")
        lit(1000000L).cast("decimal(38,0)") * k * k >
          lit(KsCritSqX1e6).cast("decimal(38,0)") *
            dec(col("n_a") + col("n_b")) * col("ks_den_d") &&
          col("ks_den_d") > 0
      })
      .select(col("n_a"), col("n_b"),
        col("ks_num_d").cast("long").as("ks_num"),
        col("ks_den_d").cast("long").as("ks_den"),
        col("reject_05"))
  }

  /** Spearman rank correlation, EXACT through ties: doubled midranks
    * `2r_v = 2F_v − c_v + 1` from the distinct-value prefix sum (the
    * q_auc recipe applied to both variables), then Pearson on the
    * doubled ranks — every sum an integer. Because doubled midranks
    * always total exactly `n(n+1)`, the common factor n cancels out
    * of the correlation and the emitted rational is the REDUCED form
    *
    *   ρ = A / √(Bx·By),  A = Σrxry − n(n+1)²,  B• = Σr•² − n(n+1)²
    *
    * with A ≲ n³/3 — so A² ≈ n⁶/9 and the naive `A²·10⁶ DIV (Bx·By)`
    * would leave DECIMAL(38,0) once n ≳ 3×10⁵. ρ²·10⁶ therefore uses
    * the STAGED division `A² DIV ((Bx·By) DIV 10⁶)` (pre-dividing the
    * denominator keeps every intermediate ≤ n⁶/9), which holds exact
    * integer semantics to n ≈ 3×10⁶ pairs; when Bx·By < 10⁶ (tiny
    * inputs, where the staged divisor would truncate to 0) it falls
    * back to the direct form, which is overflow-safe exactly there.
    * The |ρ| > 0.2 verdict `25·A² > Bx·By` fits un-staged to the same
    * n ≈ 3×10⁶. Beyond that (the 100 TB path) the identical machinery
    * runs on per-mille-quantised ranks — the statistic of the
    * quantised ranks is still engine-exact; only the quantisation is
    * a (deterministic, documented) approximation. Zero-variance
    * margins yield NULL ρ and an honest non-verdict, the q_ab_chisq
    * degenerate-table posture.
    *
    * Scale shape: two value-domain aggregates + prefix sums, two
    * equi-joins of the pair relation against value-domain rank
    * tables, one final mergeable moment aggregate.
    */
  def spearman(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val pairs = OpCaches.persist(df.select(xCol.as("x"), yCol.as("y")))
    def doubledRanks(c: String) = {
      val per = pairs.groupBy(col(c)).agg(count(lit(1)).as("__c"))
      Sampling.runningTotal(per, Seq(col(c)), "__c")
        .select(col(c),
          (col("running_total") * 2 - col("__c") + 1).as(s"r$c"))
    }
    def dec(c: Column) = c.cast("decimal(38,0)")
    val moments = pairs
      .join(doubledRanks("x"), "x").join(doubledRanks("y"), "y")
      .agg(count(lit(1)).as("n"), sum(col("rx") * col("ry")).as("sxy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"))
    val nn1sq = dec(col("n")) * dec(col("n") + 1) * dec(col("n") + 1)
    moments
      .select(col("n").as("n_pairs"),
        (dec(col("sxy")) - nn1sq).cast("long").as("rho_num"),
        (dec(col("sxx")) - nn1sq).cast("long").as("rho_den_x"),
        (dec(col("syy")) - nn1sq).cast("long").as("rho_den_y"))
      .withColumn("rho2_ppm",
        expr("""CASE WHEN rho_den_x > 0 AND rho_den_y > 0 THEN
               |  CASE WHEN (CAST(rho_den_x AS DECIMAL(38,0)) * rho_den_y)
               |            DIV 1000000 > 0 THEN
               |    CAST((CAST(rho_num AS DECIMAL(38,0)) * rho_num)
               |         DIV ((CAST(rho_den_x AS DECIMAL(38,0)) * rho_den_y)
               |              DIV 1000000)
               |      AS BIGINT)
               |  ELSE
               |    CAST((CAST(rho_num AS DECIMAL(38,0)) * rho_num * 1000000)
               |         DIV (CAST(rho_den_x AS DECIMAL(38,0)) * rho_den_y)
               |      AS BIGINT) END END""".stripMargin))
      .withColumn("positive", col("rho_num") > 0)
      .withColumn("strong_02",
        col("rho_den_x") > 0 && col("rho_den_y") > 0 &&
          lit(25L).cast("decimal(38,0)") * dec(col("rho_num")) *
            dec(col("rho_num")) >
            dec(col("rho_den_x")) * dec(col("rho_den_y")))
  }
}
