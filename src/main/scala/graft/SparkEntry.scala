package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2
  * (parity O1-O22 where observable, plus the [EXT] LLM-pipeline ops);
  * `oracleSql` holds the DuckDB-equivalent SQL for every entry — the
  * approximate ops emit deterministic verdict rows (e.g. `s2_knn_lsh`'s
  * per-query recall floor) so even they are oracle-checked; recall on
  * high-cosine workloads is additionally asserted in the test suite.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    GraftQueries.q5LocalSupplier(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = GraftQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.all
}
