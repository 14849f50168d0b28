package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** p2_pipeline stage attribution at sf0.1: cumulative noop timing of
  * each composition prefix, plus the final action's Catalyst phase
  * summary (parsing/analysis/optimization/planning) to split driver
  * plan work from execution.
  */
object P2Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{Dedup, OpCaches, Sampling, TextAnalysis}
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[p2] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def tbl(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    tbl("documents").count()

    for (pass <- 1 to 4) {
      val docs = tbl("documents")
      val gated = OpCaches.persist(
        TextAnalysis.gopherQualityFilter(docs).filter(col("keep"))
          .select(docs.columns.toIndexedSeq.map(col): _*))
      t(s"p$pass 1 gated-materialize")(gated.count(): Unit)
      val scores = TextAnalysis.classifierScore(gated)
      t(s"p$pass 2 classifier")(noop(scores))
      val filtered = gated.join(
        scores.filter(col("pass")).select("doc_id", "n_tok", "logit_micro"), "doc_id")
      val slim = filtered.select(
        col("doc_id"), col("source"), col("n_tok"), col("logit_micro"),
        TextAnalysis.fingerprint(col("text")).as("__fp"))
      val canon = Dedup.exactCanonicalRows(slim, "doc_id", col("__fp")).drop("__fp")
      t(s"p$pass 3 +dedup")(noop(canon))
      val capped = OpCaches.persist(Sampling.domainCap(canon, "doc_id", "source", k = 40))
      t(s"p$pass 4 capped-materialize")(capped.count(): Unit)
      val chosen = Sampling.tokenBudgetPrefix(
        capped.select(col("doc_id"), col("logit_micro"), col("n_tok")),
        "doc_id", "logit_micro", "n_tok", budget = 20000L)
      t(s"p$pass 5 +budget-prefix")(noop(chosen))
      val fin = capped.join(chosen.select(col("id").as("doc_id")), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          sum(col("logit_micro")).as("sum_logit_micro"))
      t(s"p$pass 6 final") {
        noop(fin)
        val phases = fin.queryExecution.tracker.phases
        val ph = phases.map { case (k, v) => s"$k=${v.endTimeMs - v.startTimeMs}ms" }.mkString(" ")
        println(s"[p2] p$pass phases: $ph")
      }
      t(s"p$pass FULL fresh")(noop(graft.GraftQueries.all("p2_pipeline")(spark, dir)))
      OpCaches.releaseAll()
    }
    spark.stop()
  }
}
