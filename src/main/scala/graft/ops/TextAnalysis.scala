package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines over the `documents`
  * table: tokenisation, quality scoring, language-ID, fingerprinting.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs in the hot path) so the whole stage stays inside
  * WholeStageCodegen and scales linearly — at 100 TB these are pure
  * narrow map transforms: no shuffle at all.
  */
object TextAnalysis {

  /** Whitespace tokens (empty text → empty array, not [""]). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-shaped token count: runs of letters, runs of digits,
    * or single non-alphanumeric marks — the classic pre-tokenisation
    * regex shape used by BPE vocabularies.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))

  def digitCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[0-9]"), lit(0)))

  /** Language stopword regexes — tiny per-language function-word sets;
    * the classic n-gram/function-word heuristic. \b works identically in
    * Java regex and RE2, which keeps the op oracle-checkable in SQL.
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|and|to|in|is|that|it|for)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|zu|den|von)\\b",
    "fr" -> "\\b(le|la|les|et|est|une|dans|que|pour|pas)\\b",
    "es" -> "\\b(el|los|las|y|es|una|en|que|por|con)\\b",
    "zh" -> "[\\u4e00-\\u9fff]",
  )

  def langScore(text: Column, lang: String): Column = {
    val pattern = langMarkers.toMap.apply(lang)
    regexp_count(text, lit(pattern))
  }

  /** Predicted language: argmax of marker hits, ties broken by the fixed
    * order en > de > fr > es > zh, all-zero → "und" (undetermined).
    *
    * Shape matters: each `regexp_count` appears exactly once, inside an
    * array-of-structs literal, and the argmax runs as a 5-element
    * `aggregate` over that array. The naive greatest+chained-when form
    * re-expands the shared `greatest(...)` subtree into every branch
    * (~40 regex scans/row once the expression is too big for codegen
    * CSE) — measured 40× slower on the documents fixture.
    */
  def langId(text: Column): Column = {
    val scored = array(langMarkers.map { case (l, p) =>
      struct(regexp_count(text, lit(p)).as("score"), lit(l).as("lang"))
    }: _*)
    aggregate(
      scored,
      struct(lit(0).as("score"), lit("und").as("lang")),
      (acc, x) => when(x("score") > acc("score"), x).otherwise(acc)
    ).getField("lang")
  }

  /** Quality features + a composite score in [0,1]: length band, mean
    * token length band, stopword presence, punctuation/digit moderation.
    * All ratios are single `a/b` double divisions so the oracle SQL
    * reproduces them bit-exactly.
    */
  def withQualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t).cast("long"))
      .withColumn("n_chars_m", length(t).cast("long"))
      .withColumn("punct_ratio", punctCount(t).cast("double") / greatest(length(t), lit(1)))
      .withColumn("digit_ratio", digitCount(t).cast("double") / greatest(length(t), lit(1)))
      .withColumn("stopword_ratio",
        langScore(t, "en").cast("double") / greatest(tokenCount(t), lit(1)))
      .withColumn("mean_token_len",
        (length(t) - tokenCount(t) + lit(1)).cast("double") / greatest(tokenCount(t), lit(1)))
      .withColumn("quality_score",
        (when(col("n_tokens").between(5, 1000), lit(0.25)).otherwise(lit(0.0))
          + when(col("mean_token_len").between(2.0, 12.0), lit(0.25)).otherwise(lit(0.0))
          + when(col("stopword_ratio") > 0.01, lit(0.25)).otherwise(lit(0.0))
          + when(col("punct_ratio") < 0.2 && col("digit_ratio") < 0.3, lit(0.25))
            .otherwise(lit(0.0))))
  }

  /** Whole-document fingerprint: md5 of whitespace-normalised lowercase
    * text — the exact-dup key (portable across engines).
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Winnowing-style rolling fingerprint (Schleimer, Wilkerson, Aiken,
    * SIGMOD 2003): hash each k-token shingle, keep the minimum hash per
    * sliding window — a compact signature robust to local edits. Pure
    * native expressions: shingle → xxhash64 → windowed min → distinct.
    */
  def winnowingSignature(text: Column, k: Int = 5, window: Int = 4): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val shingleHashes = transform(
      sequence(lit(0), greatest(n - k, lit(0))),
      i => xxhash64(concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
    val mins = transform(
      sequence(lit(0), greatest(size(shingleHashes) - window, lit(0))),
      i => array_min(slice(shingleHashes, i + lit(1), lit(window))))
    when(n >= k, array_sort(array_distinct(mins))).otherwise(array().cast("array<bigint>"))
  }
}
