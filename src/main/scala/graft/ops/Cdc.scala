package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application — the maintenance operation of an
  * incrementally updated corpus/snapshot: apply a changelog of
  * inserts/updates/deletes to a snapshot, latest change per key wins.
  *
  * Scale shape: the changelog (daily increment — small next to the
  * snapshot) is reduced to one winning row per key with a window on the
  * key, then the snapshot is filtered with a LEFT ANTI join against the
  * changed-key set and unioned with the surviving upserts. The anti
  * join's build side is just the changed KEYS, so Catalyst broadcasts
  * it when the increment is broadcast-sized and the 100 TB snapshot
  * never shuffles; with a bucketed snapshot (see `sources.Bucketing`)
  * even the fallback shuffle hits only the key column.
  */
object Cdc {

  /** Apply `changes` to `snapshot`. `changes` carries the snapshot's
    * columns plus `seqCol` (monotone change sequence) and `opCol`
    * ('I' | 'U' | 'D'). Per key, the highest (seq, op) row wins — the
    * op tiebreak makes equal-seq input deterministic, with 'U' > 'I' >
    * 'D' ordered lexically ('U' sorts highest). Output schema equals
    * the snapshot's.
    */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
                     keyCol: String, seqCol: String = "seq",
                     opCol: String = "op"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, col(opCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val untouched = snapshot.join(latest.select(col(keyCol)), Seq(keyCol), "left_anti")
    val upserts = latest.filter(col(opCol) =!= "D").drop(seqCol, opCol)
    untouched.unionByName(upserts.select(snapshot.columns.map(col).toSeq: _*))
  }
}
