package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import graft.functions.CosineSimilarity

/** Session extensions registering the engine's native functions for SQL
  * use. Attach with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`; DataFrame users
  * can instead call `graft.ops.Similarity.cosine` directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      CosineSimilarity.info,
      exprs => CosineSimilarity(exprs(0), exprs(1))))
  }
}
