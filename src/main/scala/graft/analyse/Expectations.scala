package graft.analyse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deequ-style data-quality expectations — the contract checks a
  * pipeline runs before trusting a new batch: completeness, uniqueness,
  * domain membership, row-level invariants, referential integrity.
  * (The reference has no analogue; this is the [EXT] validation layer
  * over the same fixture tables the catalog already reads.)
  *
  * Plan shape: every single-table rule is a violation-COUNT aggregate,
  * so an arbitrary rule set evaluates in ONE scan of the table (one
  * `agg`, map-side partial, the Profiler trick) and the result is rows
  * of `(rule, col_name, n_violations, pass)` — bounded by the rule
  * count, never the data. Referential integrity is the one rule that
  * genuinely needs a second relation: a left-anti join counted, with
  * the parent side distinct-projected first so the join carries keys,
  * not rows.
  *
  * Exactness: violation counts are integers; `pass` is a plain
  * comparison — bit-stable across engines, so the whole report is
  * DuckDB-oracle-checkable.
  */
object Expectations {

  /** One rule: a named violation-count aggregate over a single table.
    * `violations` must be an aggregate Column counting offending rows.
    */
  final case class Check(rule: String, colName: String, violations: Column)

  def notNull(c: String): Check =
    Check("not_null", c, sum(when(col(c).isNull, 1L).otherwise(0L)))

  /** Duplicate occurrences beyond the first, over non-null values. */
  def unique(c: String): Check =
    Check("unique", c, count(col(c)) - countDistinct(col(c)))

  /** Null or outside the allowed set. */
  def inSet(c: String, values: Seq[String]): Check =
    Check("in_set", c,
      sum(when(col(c).isin(values.map(lit): _*), 0L).otherwise(1L)))

  /** Row-level invariant: a NULL predicate counts as a violation (an
    * unknown is not a pass), so `pred` need not be null-safe.
    */
  def satisfies(rule: String, c: String, pred: Column): Check =
    Check(rule, c, sum(when(pred, 0L).otherwise(1L)))

  /** Evaluate all checks in ONE aggregate over one scan. */
  def evaluate(df: DataFrame, table: String, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "expectations: no checks given")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      coalesce(c.violations, lit(0L)).cast("long").as(s"__v_$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks.zipWithIndex
      .map { case (c, i) => s"'${c.rule}', '${c.colName}', `__v_$i`" }
      .mkString(", ")
    row.selectExpr(
        s"stack(${checks.size}, $stackArgs) AS (rule, col_name, n_violations)")
      .select(lit(table).as("tbl"), col("rule"), col("col_name"),
        col("n_violations"), (col("n_violations") === 0L).as("pass"))
  }

  /** Referential integrity: child keys with no parent. The parent side
    * projects to distinct keys before the anti join, so at 100 TB the
    * join's build side is key-sized; non-null orphans only (a null FK
    * is `notNull`'s business, not RI's).
    */
  def refIntegrity(child: DataFrame, childCol: String,
                   parent: DataFrame, parentCol: String,
                   table: String): DataFrame = {
    val orphans = child.select(col(childCol)).filter(col(childCol).isNotNull)
      .join(parent.select(col(parentCol).as(childCol)).distinct(),
        Seq(childCol), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    orphans.select(lit(table).as("tbl"), lit("ref_integrity").as("rule"),
      lit(childCol).as("col_name"), col("n_violations").cast("long").as("n_violations"),
      (col("n_violations") === 0L).as("pass"))
  }
}
