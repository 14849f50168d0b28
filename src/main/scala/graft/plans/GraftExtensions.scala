package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import graft.functions.CosineSimilarity

/** Session extensions registering the engine's native functions for SQL
  * use. Attach with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`; DataFrame users
  * can instead call `graft.ops.Similarity.cosine` directly.
  *
  * Registered functions:
  *  - `cosine_similarity(array<float>, array<float>)` — native codegen
  *    expression (`functions.CosineSimilarity`);
  *  - `graft_bucket(id, modulus)` — THE portable md5 bucket
  *    (`ops.Sampling.bucket`) as a SQL function, so SQL-frontend users
  *    get the identical deterministic split/sample assignments as the
  *    DataFrame API (and as the DuckDB oracle twin);
  *  - `jaccard(array, array)` — exact set Jaccard
  *    (`ops.Dedup.jaccard`), composed from native set expressions;
  *  - `graft_fingerprint(text)` — the dedup content identity;
  *  - `graft_pseudonym(key, salt)` — the join-preserving consistent
  *    pseudonym (`anonymise.Anonymiser.pseudonym`);
  *  - `graft_clean_text(text)` — the t21 corpus cleaning chain
  *    (`ops.TextAnalysis.cleanedText`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Catalyst tree of `Sampling.bucket`: pmod(conv(substr(md5(cast(id
    * as string)), 1, 15), 16, 10)::long, modulus::long). Composed from
    * built-in expressions — fully codegen'd, no UDF.
    */
  private[graft] def bucketExpr(id: Expression, modulus: Expression): Expression =
    Pmod(
      Cast(
        Conv(
          Substring(Md5(Cast(id, StringType)), Literal(1, IntegerType),
            Literal(15, IntegerType)),
          Literal(16, IntegerType), Literal(10, IntegerType)),
        LongType),
      Cast(modulus, LongType))

  private[graft] def jaccardExpr(a: Expression, b: Expression): Expression =
    Divide(
      Cast(Size(ArrayIntersect(a, b)), org.apache.spark.sql.types.DoubleType),
      Cast(Size(ArrayUnion(a, b)), org.apache.spark.sql.types.DoubleType))

  /** Catalyst tree of `TextAnalysis.fingerprint`: md5(lower(trimmed,
    * whitespace-collapsed text)) — the content identity every dedup
    * screen keys on, exposed so SQL-frontend users produce the SAME
    * fingerprints as the DataFrame pipeline (and the DuckDB twin).
    * Composed from built-ins — fully codegen'd.
    */
  private[graft] def fingerprintExpr(text: Expression): Expression =
    Md5(Cast(Lower(RegExpReplace(StringTrim(text), Literal("\\s+"), Literal(" "))),
      org.apache.spark.sql.types.BinaryType))

  /** Catalyst tree of `Anonymiser.pseudonym`: substr(md5(concat(salt,
    * cast(key as string))), 1, 16) — SQL users mint the SAME
    * join-preserving pseudonyms as the DataFrame anonymiser (and the
    * DuckDB twin). Composed from built-ins — fully codegen'd.
    */
  private[graft] def pseudonymExpr(key: Expression, salt: Expression): Expression =
    Substring(
      Md5(Cast(Concat(Seq(Cast(salt, StringType), Cast(key, StringType))),
        org.apache.spark.sql.types.BinaryType)),
      Literal(1, IntegerType), Literal(16, IntegerType))

  /** Catalyst tree of `TextAnalysis.cleanedText`: the three-stage
    * cleaning chain (tag strip, control-char squash, space collapse,
    * trim) with the same explicit-ASCII-range classes.
    */
  private[graft] def cleanTextExpr(text: Expression): Expression =
    StringTrim(
      RegExpReplace(
        RegExpReplace(
          RegExpReplace(text, Literal("<[^>]*>"), Literal(" ")),
          Literal("[\\x00-\\x1f\\x7f]"), Literal(" ")),
        Literal(" +"), Literal(" ")))

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      CosineSimilarity.info,
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_bucket"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_bucket"),
      exprs => bucketExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("jaccard"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "jaccard"),
      exprs => jaccardExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_fingerprint"),
      exprs => fingerprintExpr(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("graft_pseudonym"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_pseudonym"),
      exprs => pseudonymExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_clean_text"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_clean_text"),
      exprs => cleanTextExpr(exprs(0))))
  }
}
