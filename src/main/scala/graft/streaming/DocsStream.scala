package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Streaming ingest screen over the documents table — the stream-STATIC
  * join pattern (st2 covers stream-stream; st1/st3-5 cover stateful
  * aggregation/dedup/SCD2). Newly arriving documents anti-join a static
  * history fingerprint set, so only genuinely new content flows
  * downstream — the streaming twin of `Dedup.bloomScreenNew`'s exact
  * route (reference scope: the reference engine is batch-only; this is
  * an [EXT] op).
  *
  * Scale shape: a stream-static `left_anti` is STATELESS — each
  * micro-batch probes the static side and nothing accumulates in the
  * state store, so there is no watermark to tune and no state to
  * expire. The static side should be the pre-built fingerprint table
  * (one `fp` column, not raw text): at 100 TB of history that table is
  * the thing you maintain incrementally (append on every accepted
  * ingest), and Spark broadcast-joins it when small or shuffles only
  * the micro-batch when not.
  */
object DocsStream {

  /** Fingerprints of the historical corpus: the single-column static
    * side of the screen (build once, maintain incrementally).
    */
  def historyFingerprints(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(TextAnalysis.fingerprint(col(textCol)).as("fp")).distinct()

  /** Streaming form: emit every arriving doc whose normalized-text
    * fingerprint has no historical match. No within-stream dedup here —
    * first-arrival semantics across micro-batches would make the
    * emitted set depend on arrival order; compose with
    * `dropDuplicatesWithinWatermark` when the source carries event
    * time and that trade is wanted.
    */
  def screenNewStream(stream: DataFrame, historyFps: DataFrame,
                      textCol: String = "text"): DataFrame =
    stream.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .join(historyFps, Seq("fp"), "left_anti")
      .drop("fp")

  /** Batch form (asserted equal to the streaming form in
    * `StreamingSpec`): the same anti join run over the bounded batch.
    */
  def screenNewBatch(docs: DataFrame, historyFps: DataFrame,
                     textCol: String = "text"): DataFrame =
    screenNewStream(docs, historyFps, textCol)
}
